"""ConvNeXt-stage megakernel: ALL blocks of a CNN stage run in one Pallas
kernel with the stage's stacked weights VMEM-resident.

Reference semantics per block (model.py:120-167): depthwise conv k=7 SAME ->
LayerNorm(fp32) -> 1x1 conv to hidden -> GELU -> 1x1 conv back -> layer-scale
gamma -> (+ residual); stochastic depth is inert in the reference CNN path
(model.py:757 never threads enable_dropout), so the kernel covers the
always-used no-SDD form and the SDD-enabled path falls back to XLA.

Why a kernel: stage 6 (C=128, L=500, 21 blocks) writes every intermediate to
HBM on the XLA path; here a cell of samples stays resident across the whole
stage, so HBM traffic is x-in + x-out + ~2.8 MB of stage weights.  The
depthwise k=7 conv is 7 sublane-shifted multiply-adds on the (L, C) tile —
pure VPU work with no im2col.

Backward delegates to the XLA stage formulation via ``jax.custom_vjp``
(rematerializing), so training through this kernel is exact w.r.t. the same
math."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_attention import _interpret, _round_up


def _stage_kernel(
    x_ref, dw_ref, dwb_ref, ln_ref, pw1_ref, pw1b_ref, pw2_ref, pw2b_ref,
    gamma_ref, o_ref, *, depth: int, kernel_size: int, valid_len: int,
):
    """x_ref/o_ref: (n, L_pad, C).  Stacked weight refs lead with (depth,).

    dw: (depth, kernel_size, C); ln: (depth, 2, C); pw1: (depth, C, H);
    pw1b: (depth, 1, H); pw2: (depth, H, C); pw2b/gamma: (depth, 1, C).
    Rows >= valid_len are zero padding; the depthwise conv's SAME padding
    sees zeros there exactly as XLA's does, and padding rows are re-zeroed
    before every residual add so they never leak into real rows."""
    n, l_pad, c = x_ref.shape
    half_k = kernel_size // 2
    x = x_ref[...].reshape(n * l_pad, c)
    rows = n * l_pad

    r_in = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % l_pad
    row_valid = r_in < valid_len

    def masked(t):
        return jnp.where(row_valid, t, jnp.zeros_like(t))

    x = masked(x)

    for d in range(depth):
        # Depthwise k-tap conv, SAME: shifted adds over the (n, L, C) view.
        # Shifting the flattened rows would bleed between samples, so pad
        # per-sample via the 3-D view (sublane shifts, no lane movement).
        xs = x.reshape(n, l_pad, c)
        acc = None
        for j in range(kernel_size):
            off = j - half_k
            w_j = dw_ref[d, j, :].astype(jnp.float32)  # (C,)
            if off < 0:
                shifted = jnp.pad(xs[:, : l_pad + off, :], ((0, 0), (-off, 0), (0, 0)))
            elif off > 0:
                shifted = jnp.pad(xs[:, off:, :], ((0, 0), (0, off), (0, 0)))
            else:
                shifted = xs
            term = shifted.reshape(rows, c).astype(jnp.float32) * w_j
            acc = term if acc is None else acc + term
        h = acc + dwb_ref[d, 0, :].astype(jnp.float32)  # fp32 rows

        # LayerNorm in fp32 (reference model.py:162).
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * ln_ref[d, 0, :] + ln_ref[d, 1, :]
        h = h.astype(x.dtype)

        # GLU-free MLP: 1x1 -> GELU -> 1x1, then layer scale + residual.
        h1 = jax.lax.dot_general(
            h, pw1_ref[d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + pw1b_ref[d, 0, :].astype(jnp.float32)
        h1 = jax.nn.gelu(h1).astype(x.dtype)
        h2 = jax.lax.dot_general(
            h1, pw2_ref[d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + pw2b_ref[d, 0, :].astype(jnp.float32)
        out = h2 * gamma_ref[d, 0, :].astype(jnp.float32)
        x = x + masked(out.astype(x.dtype))

    o_ref[...] = x.reshape(n, l_pad, c)


def _stage_cell(batch: int, l_pad: int, c: int, hidden: int) -> int:
    """Samples per grid cell bounded by the fp32 row temporaries.

    Measured on v5e: a (4, 1000, 64) cell of the C=64/H=128 stage allocates
    ~16.1 MB scoped VMEM (the 7 shifted depthwise taps and the fp32 LN/MLP
    rows dominate) — ~4 MB per sample; budget half the 16 MB limit to leave
    room for the pipeline's double buffers."""
    per_sample = l_pad * (c * 40 + hidden * 8)
    for n in (16, 8, 4, 2, 1):
        if batch % n:
            continue
        if n * per_sample <= 8 * 1024 * 1024:
            return n
    return 1


def stage_weights(blocks: dict, dtype) -> list[jax.Array]:
    """Stacked block params (models/convnext.init_cnn layout) -> kernel refs."""
    dw = blocks["depth_conv"]["w"]  # (depth, K, 1, C) conv WIO, groups=C
    depth, k, _, c = dw.shape
    return [
        dw.reshape(depth, k, c).astype(dtype),
        blocks["depth_conv"]["b"].reshape(depth, 1, c).astype(dtype),
        jnp.stack(
            [blocks["norm"]["scale"], blocks["norm"]["bias"]], axis=1
        ).astype(jnp.float32),  # (depth, 2, C)
        blocks["pw1"]["w"].astype(dtype),
        blocks["pw1"]["b"][:, None, :].astype(dtype),
        blocks["pw2"]["w"].astype(dtype),
        blocks["pw2"]["b"][:, None, :].astype(dtype),
        blocks["gamma"][:, None, :].astype(dtype),
    ]


def fused_convnext_stage(x: jax.Array, weights: list[jax.Array]) -> jax.Array:
    """x: (B, L, C) -> (B, L, C): every block of the stage, one kernel."""
    b, l, c = x.shape
    depth, kernel_size, _ = weights[0].shape
    hidden = weights[3].shape[-1]
    l_pad = _round_up(l, 8)
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
    n = _stage_cell(b, l_pad, c, hidden)
    xspec = pl.BlockSpec((n, l_pad, c), lambda i: (i, 0, 0))
    wspecs = [pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim) for w in weights]
    out = pl.pallas_call(
        functools.partial(
            _stage_kernel, depth=depth, kernel_size=kernel_size, valid_len=l
        ),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, c), x.dtype),
        grid=(b // n,),
        in_specs=[xspec] + wspecs,
        out_specs=xspec,
        interpret=_interpret(),
    )(x, *weights)
    return out[:, :l, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_convnext_stage_diff(x, blocks):
    return fused_convnext_stage(x, stage_weights(blocks, x.dtype))


def _xla_stage(x, blocks):
    """jnp mirror (backward + golden tests): scan over the stacked blocks,
    identical math to models/convnext.block with SDD disabled."""
    from ..models.convnext import block as convnext_block

    def body(carry, bp):
        return (
            convnext_block(carry, bp, sdd_rate=0.0, enable_sdd=False, key=None),
            None,
        )

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def _stage_fwd(x, blocks):
    return fused_convnext_stage_diff(x, blocks), (x, blocks)


def _stage_bwd(residuals, g):
    x, blocks = residuals
    _, vjp = jax.vjp(_xla_stage, x, blocks)
    return vjp(g)


fused_convnext_stage_diff.defvjp(_stage_fwd, _stage_bwd)


def stage_supported(l: int, c: int, depth: int) -> bool:
    """The kernel wants a lane-aligned channel dim and enough rows to be
    worth a kernel launch; small-C early stages fall back to XLA."""
    return c >= 64 and c % 64 == 0 and depth >= 1 and l >= 8
