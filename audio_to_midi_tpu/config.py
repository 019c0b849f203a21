"""Typed configuration for the whole framework.

The reference scatters constants across files (model.py:20-34,
audio_to_midi_dataset.py:26-46, train.py:743-772).  Here everything lives in
one typed module consumed by every entry point, and the checkpoint metadata
round-trips the same dict shape as the reference's ``get_model_metadata``
(model.py:36-41) so metadata-drift warnings keep working.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Data constants (reference: audio_to_midi_dataset.py:26-46)
# ---------------------------------------------------------------------------

MIDI_EVENT_VOCAB_SIZE = 90          # piano keys 88 + 2 (A0..C8 biased by -21)
MODEL_AUDIO_LENGTH = 5.0            # seconds per model window
NUM_VELOCITY_CATEGORIES = 10
FREQUENCY_CUTOFF = 8_000
SAMPLE_RATE = 2 * FREQUENCY_CUTOFF  # 16 kHz


@dataclass(frozen=True)
class DataConfig:
    midi_vocab_size: int = MIDI_EVENT_VOCAB_SIZE
    model_audio_length: float = MODEL_AUDIO_LENGTH
    num_velocity_categories: int = NUM_VELOCITY_CATEGORIES
    frequency_cutoff: int = FREQUENCY_CUTOFF

    @property
    def sample_rate(self) -> int:
        return 2 * self.frequency_cutoff

    @property
    def samples_per_window(self) -> int:
        return int(self.sample_rate * self.model_audio_length)

    def metadata(self) -> dict[str, Any]:
        # Key names follow reference audio_to_midi_dataset.py:41-46.
        return {
            "midi_voccab_size": self.midi_vocab_size,
            "max_event_timestamp": self.model_audio_length,
            "num_velocity_categories": self.num_velocity_categories,
        }


# ---------------------------------------------------------------------------
# Model config (reference: model.py:20-34)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    dims: tuple[int, ...] = tuple(4 * (2 ** i) for i in range(7))
    depths: tuple[int, ...] = (3, 3, 3, 3, 3, 21, 3)
    cnn_hidden_expansion: float = 2.0

    num_transformer_layers: int = 8      # alternating (local, global) pairs
    num_transformer_heads: int = 4
    attention_size: int = 64             # per-head dim
    compressed_attention_q_size: int = 64
    compressed_attention_kv_size: int = 64
    transformer_dropout_rate: float = 0.1
    transformer_hidden_expansion: float = 2.0
    local_context_window: int = 16       # reference model.py:635
    sdd_rate: float = 0.1

    # The reference never threads ``enable_dropout`` into the CNN blocks
    # (model.py:757 passes only ``key=``), so stochastic depth is configured
    # but inert there.  We keep that behaviour by default and expose a switch.
    enable_cnn_stochastic_depth: bool = False

    rope_max_positions: int = 300        # reference train.py:786
    rope_theta: float = 10_000.0

    # "pallas": the fused natural-layout VMEM attention kernel
    # (ops/pallas_attention.py) — consumes q/k/v exactly as the projections
    # produce them, eliminating the relayout copies XLA otherwise inserts
    # around the windowed einsums (+15% end-to-end on v5e).
    # "pallas_block": whole-attention-block megakernel (projections + RoPE +
    # windowing + attention + overlap-average + out-proj in one kernel).
    # "pallas_pair": transformer-PAIR megakernel (ops/pallas_pair.py) — a full
    # alternating local+global pair (4 sublayers incl. FFNs and residuals) per
    # kernel, several samples per grid cell, everything VMEM-resident.
    # "pallas_rw": like "pallas" but the local windows run the reduced-width
    # kernel — per-window (16, 16) logits tiles + (P, 16) softmax instead of
    # one masked (P, P) matmul (ops/pallas_attention.fused_local_two_phase_rw).
    # "xla": einsum formulation.  All are differentiable; attention-weight
    # dropout rides into the kernels as precomputed uint8 bits
    # (rate quantized to 1/256), so the reference-parity training config
    # keeps the fast kernels; unsupported geometries fall back automatically.
    attention_impl: str = "pallas"

    # Rematerialization of the scanned block bodies (CNN stages /
    # transformer layers).  The reference always remats
    # (jax.checkpoint(policy=dots_with_no_batch_dims_saveable) on both scan
    # bodies, model.py:656-668) — the right call for its GPU memory budget.
    # On TPU the per-block activations are tiny (minibatch 8: ~1 MB per
    # ConvNeXt block) and remat re-spends ~1x the forward FLOPs in the
    # backward, so it is a measured knob: the train-step accounting
    # (tools/train_accounting.py, PERF.md round 4) decides the default.
    # CNN block remat stays ON: saving the scanned stages' activations means
    # XLA stacks them with dynamic-update-slice per iteration — measured
    # +20 ms/step at batch 64 vs recomputing them (STEPTIME round 4).
    cnn_remat: bool = True
    # Transformer remat OFF by default: the 16 sublayers' activations are
    # tiny (250 x 256) and the remat recompute + checkpoint bookkeeping
    # measured ~6 ms/step of the 69.2 ms round-3 train step (STEPTIME r4).
    # Grad-exactness vs remat-on is tested (tests/test_train.py).
    transformer_remat: bool = False
    # lax.scan unroll factor for the transformer layer stack (1 = the
    # reference's one-compiled-layer scan, model.py:656-668).  At seq 250
    # the per-layer kernels are small and unrolling widens XLA's fusion
    # scope across sublayers (measured ~-1 ms/step; free at compile time
    # for 8 layers).
    transformer_scan_unroll: int = 8
    # Same for the CNN stage block scans (stage 5 runs 21 blocks; unroll is
    # clamped to each stage's depth, so 21 = fully unrolled everywhere).
    # Measured -3.4 ms/step at batch 64 (53.6 -> 50.2, STEPTIME4/5 round 4):
    # the unrolled bodies let XLA fuse across block boundaries and drop the
    # scan's carry round-trips.  Costs compile time only.
    cnn_scan_unroll: int = 21
    # Dropout masks from the hardware-backed RBG bit generator instead of
    # threefry (models/nn.dropout).  Distribution-identical, different
    # stream; no parity contract binds the exact masks.  Measured
    # -4.4 ms/step at the production dropout config (STEPTIME round 4).
    fast_dropout_rng: bool = True

    # "pallas": small-C early stages (C < 64) run in the packed
    # space-to-depth formulation (models/convnext_packed.py) where every op
    # is a full-lane matmul — measured 3.2x faster for stage 1 on v5e;
    # large-C stages use the scanned XLA path (near its MFU ceiling).
    # "pallas_stage": additionally run C >= 64 stages as whole-stage Pallas
    # kernels (ops/pallas_convnext.py) — measured SLOWER on v5e defaults,
    # kept for other geometries.  "xla": always the scanned path.
    cnn_impl: str = "pallas"
    # Fused Pallas BACKWARD for the lane-aligned large-C CNN stages
    # (ops/pallas_convnext_bwd.py): forward stays on XLA (it wins there),
    # but under autodiff the stage's backward runs as one kernel — the 21
    # blocks of stage 5 reversed in VMEM with activations recomputed from
    # the saved scan carries and weight grads accumulated across the
    # sequential grid.  Grads agree with the XLA backward to bf16 rounding
    # (tests/test_pallas_convnext_bwd.py); serving is unaffected (the
    # primal path never materializes carries).  Measured A/B: PERF.md r5.
    cnn_bwd_kernel: bool = True

    output_vocab: int = MIDI_EVENT_VOCAB_SIZE

    def for_serving(self) -> "ModelConfig":
        """Serving-tuned scheduling knobs (weights-compatible: unroll/remat
        knobs change the XLA schedule, never the math).

        The round-4 unroll defaults were chosen by A/B on the TRAINING step;
        at the serving-optimal batch (128) they are a measured ~2.7% LOSS on
        the forward program: tools/infer_unroll_ab.py at batch 128 measures
        unroll-1 at 356.2 ms/20-batch program (35,932 audio-s/s device) vs
        366.0 ms (34,973) for the train-tuned unrolls — and unroll-1
        cold-compiles in ~12 s instead of ~180 s.  (At batch 256 the train
        knobs were ~1.3% ahead — INFER_AB.json — but 256 is not the serving
        peak.)  Serving entry points pin these knobs via this method."""
        import dataclasses

        return dataclasses.replace(
            self, cnn_scan_unroll=1, transformer_scan_unroll=1
        )

    @property
    def transformer_hidden_dim(self) -> int:
        return self.dims[-1]

    @property
    def transformer_intermediate_size(self) -> int:
        return int(self.transformer_hidden_dim * self.transformer_hidden_expansion)

    @property
    def cnn_hidden_dims(self) -> tuple[int, ...]:
        return tuple(int(d * self.cnn_hidden_expansion) for d in self.dims)

    @property
    def total_downsample(self) -> int:
        # stem /5, then /2 per later stage
        factor = 5
        for _ in self.dims[1:]:
            factor *= 2
        return factor

    def output_frames(self, num_samples: int) -> int:
        return num_samples // self.total_downsample

    def metadata(self) -> dict[str, Any]:
        # Mirrors the reference's ``model_config`` dict keys (model.py:20-34).
        return {
            "dims": list(self.dims),
            "depths": list(self.depths),
            "cnn_hidden_expansion": self.cnn_hidden_expansion,
            "num_transformer_layers": self.num_transformer_layers,
            "num_transformer_heads": self.num_transformer_heads,
            "attention_size": self.attention_size,
            "compressed_attention_q_size": self.compressed_attention_q_size,
            "compressed_attention_kv_size": self.compressed_attention_kv_size,
            "transformer_dropout_rate": self.transformer_dropout_rate,
            "transformer_hidden_expansion": self.transformer_hidden_expansion,
            "sdd_rate": self.sdd_rate,
        }


# ---------------------------------------------------------------------------
# Precision policy (reference train.py:35-37; TPU-native default is bf16)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PrecisionConfig:
    """Params live in ``param_dtype``; the forward/backward pass is run in
    ``compute_dtype``; losses/grad accumulation in f32.

    The reference trains f16 with dynamic loss scaling (train.py:35-37,
    334-382); on TPU the native fast dtype is bfloat16, which does not need
    loss scaling — but the scaling/rollback machinery is still wired so the
    f16 policy is available for parity.
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16

    @property
    def needs_loss_scaling(self) -> bool:
        return self.compute_dtype == jnp.float16


# ---------------------------------------------------------------------------
# Augmentation settings (reference python.rs:838-920, train.py:758-768)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TransformSettings:
    pan_probability: float = 0.8
    channel_switch_probability: float = 0.5
    cut_probability: float = 0.4
    rotate_probability: float = 0.9
    random_erasing_probability: float = 0.3
    mixup_probability: float = 0.6
    gain_probability: float = 0.8
    noise_probability: float = 0.8
    label_smoothing_alpha: float = 0.005

    # The reference passes channel_switch_probability to the pan transform
    # (python.rs:923) — almost certainly a bug.  ``True`` reproduces it;
    # ``False`` uses pan_probability as intended.
    parity_pan_uses_channel_switch_probability: bool = False

    # --- Timbre-perturbing extensions (beyond the reference's 9; all OFF
    # by default for parity).  The reference transforms never change timbre,
    # and the r04 cross-family generalization experiment showed the model
    # overfitting the training timbre family (GENBENCH_r04); these attack
    # that directly (device path only, data/augment_device.py):
    #   * random EQ: smooth random log-magnitude filter (random-cepstrum FIR)
    #     reshapes the harmonic rolloff;
    #   * dynamics warp: local-RMS envelope raised to a random power —
    #     softens/sharpens attacks (percussive <-> slow-attack bridge);
    #   * AM jitter: random slow amplitude modulation (tremolo bridge).
    eq_probability: float = 0.0
    eq_strength: float = 0.4              # sigma of the random cepstral coefs
    dynamics_warp_probability: float = 0.0
    am_jitter_probability: float = 0.0

    def as_tuple(self) -> tuple:
        return (
            self.pan_probability,
            self.channel_switch_probability,
            self.cut_probability,
            self.rotate_probability,
            self.random_erasing_probability,
            self.mixup_probability,
            self.gain_probability,
            self.noise_probability,
            self.label_smoothing_alpha,
        )


# ---------------------------------------------------------------------------
# Training config (reference: train.py:743-772)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64
    # Gradient-accumulation minibatch per device.  The reference uses
    # 8 * n_devices (train.py:744, a GPU memory choice); on v5e 32 fits
    # easily and measured best (mb8 50.2+... -> mb16 50.2 -> mb32 48.9 ->
    # mb64 49.8 ms/step at batch 64, STEPTIME5/6 round 4): fewer
    # accumulation-scan iterations and better MXU occupancy.  The
    # accumulated gradient is the same sum either way, and the loop clamps
    # minibatch*data_devices to batch_size.
    minibatch_size_per_device: int = 32
    num_steps: int = 200_000
    warmup_steps: int = 1000
    base_learning_rate: float = 1e-4
    layer_lr_decay: float = 0.7            # CNN layer-wise LR decay
    weight_decay: float = 0.005
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-3                 # reference train.py:692 — intentional
    global_norm_clip: float = 1.0
    ensemble_size: int = 1
    # Tensor (model) parallel degree: >1 adds a "model" mesh axis and places
    # Megatron TP shardings on the transformer projections (parallel/tp.py).
    # Must divide the device count (and num_transformer_heads for the head
    # projections to shard).  TP runs the attention einsum formulation
    # (attention_impl="xla") so GSPMD can partition it; the Pallas kernels
    # are single-chip programs.  The reference has no TP at all (SURVEY §2.6).
    model_parallel_size: int = 1
    checkpoint_every: int = 20
    checkpoints_to_keep: int = 3
    testset_loss_every: int = 20
    print_every: int = 10
    dataset_num_workers: int = 3
    recovery_snapshot_every: int = 100     # NaN-rollback snapshot (train.py:350)
    loss_scale_increase_threshold: float = 10_000.0  # train.py:379
    seed: int = 1234
    # Run the AdamW chain over ONE raveled parameter vector instead of ~150
    # per-leaf kernels (train/optim.py _fused_flat) — identical math
    # (optax's own ops, element-for-element).  Isolated microbench: 5.8 ms
    # vs 9.1 per-leaf; IN the real train step it measured ~3 ms SLOWER
    # (73.9 vs ~70.8 ms/step, TRAINACCT round 4): the ravel/unravel
    # concatenate+slice barrier serializes where per-leaf updates overlap
    # the scan epilogue and alias donated buffers.  Kept as a measured
    # option; default off.
    fused_flat_optimizer: bool = False
    # Custom init surgery (reference train.py:573-644 `init_model`): N(0,0.2)
    # attention projections & conv weights, N(0,0.01) conv biases.  The
    # reference keeps the call commented out (train.py:792) — off by default.
    use_custom_init: bool = False
    # Run the nine train-time transforms on device (data/augment_device.py)
    # instead of in the host loader — pair with a loader created WITHOUT
    # transform_settings.  Same distributions as the host/Rust path, different
    # RNG streams (JAX threefry).  Default ON: it is strictly faster (the
    # single-core host augment capped training at 0.65 steps/s vs 10.2
    # device-resident, TRAINBENCH round 2) and distribution-equivalent.
    augment_on_device: bool = True
    # Device-resident input ring (data/device_ring.py): the window pool lives
    # in HBM as f16 and per-step batches are sampled + augmented on device;
    # the host refreshes slots asynchronously.  Capacity in windows (rounded
    # up to a multiple of batch_size); 0 disables the ring (per-step host
    # batches, the reference's feed shape).  Only used when augmentation runs
    # on device (or is disabled) — a host-augmented window must not be reused.
    input_ring_capacity: int = 1024
    # Refresh at most one feed chunk every N steps (after the initial fill).
    # 1 = refresh as fast as the loader produces (right for real hosts with
    # GB/s DMA).  On bandwidth-starved links (tunneled chips at ~45 MB/s) the
    # refresh competes with step dispatch for the wire — raise N to trade
    # sample freshness (epoch-style reuse) for steps/s (TRAINBENCH r03:
    # full-rate refresh 4.5 steps/s vs 9.4 with refresh off; device step 10.5).
    input_ring_refresh_period: int = 1
    # Warn (never fail) when the ring's reuse factor — windows sampled per
    # window refreshed over a print_every interval — exceeds this: the feed
    # is starved and training re-sees resident windows epoch-style.  The
    # factor is also a train/ring_reuse_factor tensorboard scalar.
    input_ring_reuse_warn_factor: float = 64.0


@dataclass(frozen=True)
class InferConfig:
    window_overlap: float = 0.5   # seconds of overlap between 5 s windows
    checkpoint_dir: str = "audio_to_midi_checkpoints"


# ---------------------------------------------------------------------------
# Top-level config + metadata round-trip
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    precision: PrecisionConfig = field(default_factory=PrecisionConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)
    transforms: TransformSettings = field(default_factory=TransformSettings)

    def metadata(self) -> dict[str, Any]:
        """Checkpoint metadata, same shape as reference model.py:36-41."""
        return {"model": self.model.metadata(), "data_prep": self.data.metadata()}


DEFAULT_CONFIG = Config()


def _dataclass_to_dict(obj):
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _dataclass_to_dict(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, (list, tuple)):
        return list(obj)
    if obj in (jnp.float32, jnp.bfloat16, jnp.float16):
        return {jnp.float32: "f32", jnp.bfloat16: "bf16", jnp.float16: "f16"}[obj]
    return obj


_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}


def config_to_json(cfg: Config) -> str:
    import json

    return json.dumps(_dataclass_to_dict(cfg), indent=2)


def config_from_json(text: str) -> Config:
    """Inverse of config_to_json; missing fields keep their defaults."""
    import json

    raw = json.loads(text)

    def build(cls, data):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in data:
                continue
            v = data[f.name]
            if dataclasses.is_dataclass(f.type) or f.name in (
                "model", "data", "precision", "train", "infer", "transforms",
            ):
                sub_cls = {
                    "model": ModelConfig, "data": DataConfig,
                    "precision": PrecisionConfig, "train": TrainConfig,
                    "infer": InferConfig, "transforms": TransformSettings,
                }.get(f.name)
                kwargs[f.name] = build(sub_cls, v)
            elif f.name in ("param_dtype", "compute_dtype"):
                kwargs[f.name] = _DTYPES[v]
            elif isinstance(v, list):
                kwargs[f.name] = tuple(v)
            else:
                kwargs[f.name] = v
        return cls(**kwargs)

    return build(Config, raw)


def load_config(path: str | None) -> Config:
    """Config for an entry point: ``path`` (JSON) or the defaults."""
    if path is None:
        return DEFAULT_CONFIG
    from pathlib import Path

    return config_from_json(Path(path).read_text())


def config_from_metadata(meta: dict[str, Any]) -> Config:
    """Rebuild a Config from checkpoint metadata (inverse of .metadata())."""
    m = meta.get("model", {})
    d = meta.get("data_prep", {})
    model = ModelConfig(
        dims=tuple(m.get("dims", ModelConfig.dims)),
        depths=tuple(m.get("depths", ModelConfig.depths)),
        cnn_hidden_expansion=m.get("cnn_hidden_expansion", 2.0),
        num_transformer_layers=m.get("num_transformer_layers", 8),
        num_transformer_heads=m.get("num_transformer_heads", 4),
        attention_size=m.get("attention_size", 64),
        compressed_attention_q_size=m.get("compressed_attention_q_size", 64),
        compressed_attention_kv_size=m.get("compressed_attention_kv_size", 64),
        transformer_dropout_rate=m.get("transformer_dropout_rate", 0.1),
        transformer_hidden_expansion=m.get("transformer_hidden_expansion", 2.0),
        sdd_rate=m.get("sdd_rate", 0.1),
    )
    data = DataConfig(
        midi_vocab_size=d.get("midi_voccab_size", MIDI_EVENT_VOCAB_SIZE),
        model_audio_length=d.get("max_event_timestamp", MODEL_AUDIO_LENGTH),
        num_velocity_categories=d.get("num_velocity_categories", NUM_VELOCITY_CATEGORIES),
    )
    return Config(model=model, data=data)
