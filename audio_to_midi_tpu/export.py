"""Model export: StableHLO (always available) -> CoreML / TFLite (gated).

Reference export.py: jax.export of ``model.predict`` on a (2, 80000) example
-> StableHLO MLIR -> stablehlo_coreml -> coremltools, with the
``add_fp16_cast`` and ``const_elimination`` passes removed (precision and
run-failure workarounds, export.py:41-43), inputs renamed ``samples`` and
outputs ``logits``/``probs``.

In this build coremltools/stablehlo_coreml are optional: StableHLO export
always works via jax.export (and is what the iOS build consumes upstream);
the CoreML/TFLite conversions run when their deps are installed.
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

from .config import Config, DEFAULT_CONFIG
from .models import model as model_lib

log = logging.getLogger(__name__)


def export_stablehlo(
    params,
    cfg: Config = DEFAULT_CONFIG,
    example_dtype=jnp.float16,
    output_file: str | Path | None = None,
) -> str:
    """Serialize model.predict as StableHLO MLIR text."""
    rope = model_lib.make_rope(cfg.model)
    n = cfg.data.samples_per_window
    example = jnp.zeros((2, n), dtype=example_dtype)

    @jax.jit
    def infer_fn(samples):
        return model_lib.predict(params, cfg.model, samples, rope)

    exported = jax.export.export(infer_fn)(example)
    mlir = exported.mlir_module()
    if output_file is not None:
        Path(output_file).write_text(mlir)
        log.info("Wrote StableHLO module to %s", output_file)
    return mlir


def export_model_to_coreml(
    params, cfg: Config = DEFAULT_CONFIG, output_file: str | Path = "Audio2Midi.mlpackage"
):
    """CoreML export — requires coremltools + stablehlo_coreml."""
    try:
        import coremltools as ct
        from stablehlo_coreml import DEFAULT_HLO_PIPELINE
        from stablehlo_coreml.converter import convert
    except ImportError as e:
        raise ImportError(
            "CoreML export requires coremltools and stablehlo-coreml "
            f"(missing: {e.name}); use export_stablehlo for the raw module"
        ) from e
    from jax._src.interpreters import mlir as jax_mlir
    from jax._src.lib.mlir import ir

    mlir_text = export_stablehlo(params, cfg)
    context = jax_mlir.make_ir_context()
    hlo_module = ir.Module.parse(mlir_text, context=context)

    pass_pipeline = DEFAULT_HLO_PIPELINE
    # Reference export.py:41-43: fp16 casts lose precision; const_elimination
    # breaks the converted model.
    pass_pipeline.remove_passes(["common::add_fp16_cast"])
    pass_pipeline.remove_passes(["common::const_elimination"])

    mil_program = convert(hlo_module, minimum_deployment_target=ct.target.iOS18)
    coreml_model = ct.convert(
        mil_program,
        source="milinternal",
        minimum_deployment_target=ct.target.iOS18,
        pass_pipeline=pass_pipeline,
    )

    spec = coreml_model.get_spec()
    for input_description, new_name in zip(coreml_model.input_description, ["samples"]):
        ct.utils.rename_feature(spec, input_description, new_name)
    for output_description, new_name in zip(
        coreml_model.output_description, ["logits", "probs"]
    ):
        ct.utils.rename_feature(spec, output_description, new_name)
    coreml_model = ct.models.model.MLModel(spec, weights_dir=coreml_model.weights_dir)
    coreml_model.save(str(output_file))
    return coreml_model


def export_tflite(params, cfg: Config = DEFAULT_CONFIG, output_file: str | Path = "audio2midi.tflite"):
    """JAX -> TF -> TFLite (the reference README's legacy path) — requires TF."""
    try:
        import tensorflow as tf
    except ImportError as e:
        raise ImportError("TFLite export requires tensorflow") from e
    from jax.experimental import jax2tf

    rope = model_lib.make_rope(cfg.model)
    n = cfg.data.samples_per_window

    def infer_fn(samples):
        return model_lib.predict(params, cfg.model, samples, rope)

    tf_fn = tf.function(
        jax2tf.convert(infer_fn, enable_xla=False),
        input_signature=[tf.TensorSpec((2, n), tf.float32)],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    tflite_model = converter.convert()
    Path(output_file).write_bytes(tflite_model)
    return output_file


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(description="Export the model.")
    parser.add_argument("--checkpoint", default="audio_to_midi_checkpoints")
    parser.add_argument(
        "--format", choices=["stablehlo", "coreml", "tflite"], default="stablehlo"
    )
    parser.add_argument("--output", default=None)
    parser.add_argument("--config", default=None, help="Config JSON file")
    args = parser.parse_args(argv)

    from .config import load_config
    from .infer import load_newest_checkpoint

    cfg = load_config(args.config)
    params, _state = load_newest_checkpoint(
        args.checkpoint, cfg, model_replication=False
    )
    if args.format == "stablehlo":
        out = args.output or "audio2midi.stablehlo.mlir"
        export_stablehlo(params, cfg, output_file=out)
    elif args.format == "coreml":
        export_model_to_coreml(params, cfg, args.output or "Audio2Midi.mlpackage")
    else:
        export_tflite(params, cfg, args.output or "audio2midi.tflite")
    print("Export complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
