"""Convert a reference (Equinox/orbax) checkpoint into this framework's
parameter layout.

The reference stores ``eqx.filter(model, eqx.is_inexact_array)`` of its
``OutputSequenceGenerator`` (train.py:384-394), every leaf carrying a leading
ensemble axis (train.py:788-795).  This tool restores that checkpoint raw,
walks it with the module/field names of reference model.py, and emits our
pytree with the layout conversions:

  * eqx Linear weight (out, in)        -> ours (in, out)         [transpose]
  * eqx Conv1d weight (out, in/g, k)   -> ours (k, in/g, out)    [transpose]
  * eqx Conv1d bias (out, 1)           -> ours (out,)            [squeeze]
  * eqx LayerNorm weight/bias          -> ours scale/bias
  * per-stage block lists              -> stacked (depth, ...) leaves
  * transformer stacked layers (8,...) -> kept stacked (same scan layout)

Usage:
  python tools/convert_reference_checkpoint.py SRC_CKPT_DIR DST_CKPT_DIR
      [--ensemble-select 0]

The mapping core (`convert_reference_tree`) is unit-tested against a
synthetic reference-shaped tree in tests/test_convert_reference.py.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_to_midi_tpu.config import Config, ModelConfig  # noqa: E402


def _get(tree, *path):
    """Tolerant nested access: dicts with str keys or int-like keys, lists."""
    node = tree
    for p in path:
        if isinstance(node, (list, tuple)):
            node = node[int(p)]
        elif isinstance(node, dict):
            if p in node:
                node = node[p]
            elif str(p) in node:
                node = node[str(p)]
            else:
                raise KeyError(f"missing {p!r} in {list(node.keys())[:10]}")
        else:
            raise KeyError(f"cannot descend into {type(node)} with {p!r}")
    return node


def _linear_w(x):
    return np.asarray(x).T  # (out, in) -> (in, out)


def _conv_w(x):
    return np.transpose(np.asarray(x), (2, 1, 0))  # (O, I/g, K) -> (K, I/g, O)


def _conv_b(x):
    return np.asarray(x).reshape(-1)  # (O, 1) -> (O,)


def _ln(node):
    return {
        "scale": np.asarray(_get(node, "weight")),
        "bias": np.asarray(_get(node, "bias")),
    }


def _conv(node):
    return {"w": _conv_w(_get(node, "weight")), "b": _conv_b(_get(node, "bias"))}


def _linear(node, bias: bool = True):
    out = {"w": _linear_w(_get(node, "weight"))}
    if bias:
        out["b"] = np.asarray(_get(node, "bias")).reshape(-1)
    return out


def _linear_from_conv1x1(node):
    """Reference pointwise convs (k=1) map to our Linear params."""
    w = np.asarray(_get(node, "weight"))  # (O, I, 1)
    return {
        "w": w[:, :, 0].T,  # -> (I, O)
        "b": _conv_b(_get(node, "bias")),
    }


def _linear_w_stacked(x):
    # Transformer leaves carry a leading (num_layers,) stack axis
    # (reference model.py:647 filter_vmap): transpose only (out, in).
    return np.swapaxes(np.asarray(x), -1, -2)


def _linear_stacked(node, bias: bool = True):
    out = {"w": _linear_w_stacked(_get(node, "weight"))}
    if bias:
        out["b"] = np.asarray(_get(node, "bias"))
    return out


def _rope_halves_permute(w, num_heads: int):
    """Interleaved RoPE channel layout -> our halves layout (rope.py:
    permute_qk_weight_for_rope).  w: (..., in, H*hd)."""
    from audio_to_midi_tpu.models.rope import rope_permutation

    hd = w.shape[-1] // num_heads
    perm = rope_permutation(hd)
    shaped = w.reshape(*w.shape[:-1], num_heads, hd)
    return shaped[..., perm].reshape(w.shape)


def _attention(node, num_heads: int):
    return {
        "q_up": {
            "w": _rope_halves_permute(
                _linear_w_stacked(_get(node, "query_up_proj", "weight")), num_heads
            )
        },
        "kv_down": {"w": _linear_w_stacked(_get(node, "kv_down_proj", "weight"))},
        "k_up": {
            "w": _rope_halves_permute(
                _linear_w_stacked(_get(node, "key_up_proj", "weight")), num_heads
            )
        },
        "v_up": {"w": _linear_w_stacked(_get(node, "value_up_proj", "weight"))},
        "out": {"w": _linear_w_stacked(_get(node, "output_proj", "weight"))},
    }


def _transformer_layer(node, local: bool, num_heads: int):
    attn = _get(node, "attention_block")
    if local:
        attn = _get(attn, "self_attention")
    return {
        "attention_norm": _ln(_get(node, "attention_norm")),
        "attention": _attention(attn, num_heads),
        "ff_norm": _ln(_get(node, "feed_forward_norm")),
        "ff": {
            "in_proj": _linear_stacked(_get(node, "feed_forward_block", "attention_to_intermediate_proj")),
            "out_proj": _linear_stacked(_get(node, "feed_forward_block", "intermediate_to_attention_proj")),
        },
    }


def convert_reference_tree(ref, model_cfg: ModelConfig):
    """Reference filtered-model pytree (field-name nested) -> our params."""
    stages = []
    for i in range(len(model_cfg.dims)):
        seq = _get(ref, "layers", i, "layers")  # eqx Sequential wraps .layers
        down_node = _get(seq, 0)
        down = {"conv": _conv(_get(down_node, "conv")), "norm": _ln(_get(down_node, "norm"))}
        blocks = []
        for j in range(model_cfg.depths[i]):
            b = _get(seq, j + 1)
            blocks.append(
                {
                    "depth_conv": _conv(_get(b, "depth_conv")),
                    "norm": _ln(_get(b, "norm")),
                    "pw1": _linear_from_conv1x1(_get(b, "point_conv_1")),
                    "pw2": _linear_from_conv1x1(_get(b, "point_conv_2")),
                    "gamma": np.asarray(_get(b, "gamma")),
                }
            )
        stacked = {}
        import jax

        stacked = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
        stages.append({"down": down, "blocks": stacked})

    transformer_layers = _get(ref, "transformer", "layers")
    nh = model_cfg.num_transformer_heads
    transformer = {
        "local": _transformer_layer(
            _get(transformer_layers, "local_attention"), local=True, num_heads=nh
        ),
        "global": _transformer_layer(
            _get(transformer_layers, "global_attention"), local=False, num_heads=nh
        ),
    }

    decoder = {
        "norm": _ln(_get(ref, "decoder", "norm")),
        "out": _linear(_get(ref, "decoder", "decoder_pooling")),
    }

    return {
        "cnn": {"stages": stages, "final_norm": _ln(_get(ref, "norm"))},
        "transformer": transformer,
        "decoder": decoder,
    }


def strip_nones_and_select(tree, ensemble_select):
    """Drop filtered-None leaves; slice the leading ensemble axis."""
    if isinstance(tree, dict):
        return {
            k: strip_nones_and_select(v, ensemble_select)
            for k, v in tree.items()
            if v is not None
        }
    if isinstance(tree, (list, tuple)):
        return [strip_nones_and_select(v, ensemble_select) for v in tree]
    arr = np.asarray(tree)
    if ensemble_select is not None:
        arr = arr[ensemble_select]
    return arr


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("source", help="Reference checkpoint directory")
    parser.add_argument("dest", help="Output checkpoint directory (ours)")
    parser.add_argument("--ensemble-select", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    from audio_to_midi_tpu.train import checkpoint as ckpt

    cfg = Config()
    ref_params, step = ckpt.restore_raw(args.source)
    ref_params = strip_nones_and_select(ref_params, args.ensemble_select)
    params = convert_reference_tree(ref_params, cfg.model)
    params = jax.tree.map(lambda x: np.asarray(x)[None], params)  # E=1 axis

    manager = ckpt.create_checkpoint_manager(Path(args.dest), cfg, save_interval_steps=1)
    manager.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            state=ocp.args.StandardSave({"_empty": 0}),
        ),
    )
    manager.wait_until_finished()
    print(f"Converted reference checkpoint (step {step}) -> {args.dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
