"""Fused backward kernel for a ConvNeXt stage (VERDICT r04 #4).

Attribution (CNNSTAGE.json): stage 5 (C=128, H=256, L=500, 21 blocks) is
5.0 ms of the 10.6 ms CNN grad at mb=32 — 0.238 ms per block against a
~0.07 ms fused-VMEM floor — because the XLA backward round-trips every
intermediate (the 4x-expanded MLP rows included) through HBM, block by
block.  This module keeps the whole backward of a stage in one Pallas
kernel: per grid cell (one sample), the 21 blocks run in reverse with all
activations recomputed in VMEM from the saved per-block inputs, and the
weight grads accumulate in VMEM across the sequential TPU grid.

Forward stays on XLA (the existing scan formulation beats the fused forward
kernel on v5e, ops/pallas_convnext.py docstring): under autodiff the
``jax.custom_vjp`` fwd runs the same scan but collects each block's input
(the scan carry) as residuals, so the backward needs no rematerialization
at all.  Outside autodiff the primal path is the plain scan — serving
never materializes the carries.

Reference semantics per block (model.py:120-167): depthwise conv k=7 SAME
-> LayerNorm(fp32, eps 1e-5) -> 1x1 to hidden -> GELU(tanh) -> 1x1 back ->
layer-scale gamma -> + residual.  The kernel mirrors the XLA dtype flow
(bf16 storage, fp32 LayerNorm, fp32 matmul accumulation) so grads agree
with the XLA backward to bf16 rounding; exactness is not bitwise
(tests/test_pallas_convnext_bwd.py pins the tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_attention import _interpret, mosaic_dtype_ok

_GELU_C0 = 0.7978845608028654  # sqrt(2/pi)
_GELU_C1 = 0.044715


def _shift(xs: jax.Array, off: int) -> jax.Array:
    """Per-sample view (n, L, C): rows t -> x[:, t + off], zero-filled (SAME
    padding); samples never bleed into each other."""
    l = xs.shape[1]
    if off > 0:
        return jnp.pad(xs[:, off:, :], ((0, 0), (0, off), (0, 0)))
    if off < 0:
        return jnp.pad(xs[:, : l + off, :], ((0, 0), (-off, 0), (0, 0)))
    return xs


def _stage_bwd_kernel(
    carr_ref, dy_ref,
    dw_ref, dwb_ref, ln_ref, pw1_ref, pw1b_ref, pw2_ref, pw2b_ref, gamma_ref,
    dx_ref, ddw_ref, ddwb_ref, dln_ref, dpw1_ref, dpw1b_ref, dpw2_ref,
    dpw2b_ref, dgamma_ref,
    *, depth: int, kernel_size: int,
):
    """One cell of n samples per grid step; blocks unrolled in reverse
    inside the cell (n chosen by a VMEM budget in `_stage_bwd_pallas`).

    carr_ref: (depth, n, L, C) bf16 — block d's INPUT (the fwd scan carry).
    dy_ref/dx_ref: (1, L, C).  Weight refs as ops/pallas_convnext.py
    (dw (depth,K,C), ln (depth,2,C) f32, pw1 (depth,C,H), pw2 (depth,H,C),
    biases (depth,1,·), gamma (depth,1,C)).  d*_ref: fp32 accumulators with
    the same leading (depth,) — every grid cell maps to the SAME output
    block, so they stay VMEM-resident and accumulate across the sequential
    grid; cell 0 zero-initializes them.
    """
    i = pl.program_id(0)
    n, l, c = dy_ref.shape
    rows = n * l
    half_k = kernel_size // 2

    @pl.when(i == 0)
    def _init():
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        ddwb_ref[...] = jnp.zeros_like(ddwb_ref)
        dln_ref[...] = jnp.zeros_like(dln_ref)
        dpw1_ref[...] = jnp.zeros_like(dpw1_ref)
        dpw1b_ref[...] = jnp.zeros_like(dpw1b_ref)
        dpw2_ref[...] = jnp.zeros_like(dpw2_ref)
        dpw2b_ref[...] = jnp.zeros_like(dpw2b_ref)
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)

    dtype = dy_ref.dtype
    dx = dy_ref[...].reshape(rows, c)  # cotangent of block output, bf16

    for d in reversed(range(depth)):
        x3 = carr_ref[d]  # (n, l, c)
        x = x3.reshape(rows, c)

        # ---- recompute forward (bf16 storage, f32 where XLA is f32) ----
        u32 = jnp.zeros((rows, c), jnp.float32)
        for j in range(kernel_size):
            u32 += _shift(x3, j - half_k).reshape(rows, c).astype(
                jnp.float32
            ) * dw_ref[d, j, :].astype(jnp.float32)
        u32 += dwb_ref[d, 0, :].astype(jnp.float32)
        uf = u32.astype(dtype).astype(jnp.float32)  # conv out bf16, LN reads f32
        mean = jnp.mean(uf, axis=-1, keepdims=True)
        cent = uf - mean
        var = jnp.mean(cent * cent, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + 1e-5)
        th = cent * rstd  # t-hat, f32
        g32 = ln_ref[d, 0, :]
        t = (th * g32 + ln_ref[d, 1, :]).astype(dtype)
        a = (
            jax.lax.dot_general(
                t, pw1_ref[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            + pw1b_ref[d, 0, :]
        )
        af = a.astype(jnp.float32)
        inner = _GELU_C0 * (af + _GELU_C1 * af * af * af)
        tanh_u = jnp.tanh(inner)
        z = (0.5 * af * (1.0 + tanh_u)).astype(dtype)
        s = (
            jax.lax.dot_general(
                z, pw2_ref[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            + pw2b_ref[d, 0, :]
        )

        # ---- backward ----
        do = dx  # cotangent of the branch output (and of x via residual)
        do32 = do.astype(jnp.float32)
        dgamma_ref[d] += jnp.sum(do32 * s.astype(jnp.float32), axis=0)[None, :]
        ds = do * gamma_ref[d, 0, :]
        ds32 = ds.astype(jnp.float32)
        dpw2b_ref[d] += jnp.sum(ds32, axis=0)[None, :]
        dpw2_ref[d] += jax.lax.dot_general(
            z, ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz = jax.lax.dot_general(
            ds, pw2_ref[d], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        # GELU(tanh) derivative, f32
        sech2 = 1.0 - tanh_u * tanh_u
        gp = 0.5 * (1.0 + tanh_u) + 0.5 * af * sech2 * _GELU_C0 * (
            1.0 + 3.0 * _GELU_C1 * af * af
        )
        da = (dz.astype(jnp.float32) * gp).astype(dtype)
        dpw1b_ref[d] += jnp.sum(da.astype(jnp.float32), axis=0)[None, :]
        dpw1_ref[d] += jax.lax.dot_general(
            t, da, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dt = jax.lax.dot_general(
            da, pw1_ref[d], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # f32, cotangent of t (LN output)
        dln_ref[d] += jnp.stack(
            [jnp.sum(dt * th, axis=0), jnp.sum(dt, axis=0)]
        )
        dth = dt * g32
        m1 = jnp.mean(dth, axis=-1, keepdims=True)
        m2 = jnp.mean(dth * th, axis=-1, keepdims=True)
        du32 = rstd * (dth - m1 - th * m2)
        du = du32.astype(dtype)  # cotangent of the bf16 conv output
        ddwb_ref[d] += jnp.sum(du32, axis=0)[None, :]
        dus = du.astype(jnp.float32)
        du3 = du.reshape(n, l, c)
        dxc = jnp.zeros((rows, c), jnp.float32)
        for j in range(kernel_size):
            off = j - half_k
            # y[t] += w[j] * x[t+off]  =>  dw[j] = sum_t du[t]*x[t+off];
            #                              dx[t+off] += w[j]*du[t]  i.e.
            #                              dx[t] += w[j]*du[t-off]
            ddw_ref[d, j, :] += jnp.sum(
                dus * _shift(x3, off).reshape(rows, c).astype(jnp.float32),
                axis=0,
            )
            dxc += _shift(du3, -off).reshape(rows, c).astype(
                jnp.float32
            ) * dw_ref[d, j, :].astype(jnp.float32)
        dx = do + dxc.astype(dtype)

    dx_ref[...] = dx.reshape(n, l, c)


def _xla_scan(x: jax.Array, blocks) -> jax.Array:
    from ..models.convnext import block as convnext_block

    def body(carry, bp):
        return (
            convnext_block(carry, bp, sdd_rate=0.0, enable_sdd=False, key=None),
            None,
        )

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def _kernel_weights(blocks, dtype):
    """Stacked block params -> kernel weight operands (fwd-kernel layout)."""
    dw = blocks["depth_conv"]["w"]  # (depth, K, 1, C)
    depth, k, _, c = dw.shape
    return [
        dw.reshape(depth, k, c).astype(dtype),
        blocks["depth_conv"]["b"][:, None, :].astype(dtype),
        jnp.stack(
            [blocks["norm"]["scale"], blocks["norm"]["bias"]], axis=1
        ).astype(jnp.float32),
        blocks["pw1"]["w"].astype(dtype),
        blocks["pw1"]["b"][:, None, :].astype(dtype),
        blocks["pw2"]["w"].astype(dtype),
        blocks["pw2"]["b"][:, None, :].astype(dtype),
        blocks["gamma"][:, None, :].astype(dtype),
    ]


def _stage_bwd_pallas(carries, blocks, dy):
    """carries: (depth, B, L, C) bf16 block inputs; dy: (B, L, C).
    Returns (dx, dblocks) with dblocks matching the stacked-params pytree."""
    depth, b, l, c = carries.shape
    k = blocks["depth_conv"]["w"].shape[1]
    h = blocks["pw1"]["w"].shape[-1]
    dtype = dy.dtype
    weights = _kernel_weights(blocks, dtype)

    # Samples per grid cell: larger cells mean taller MXU matmuls and fewer
    # accumulator passes, bounded by VMEM (~16 MB/core): double-buffered
    # carries + resident weights/accumulators + fp32 row temporaries.
    # Measured on v5e: the production stage-6 geometry (d3, L250, C256,
    # H512) at n=2 allocates 17.2 MB scoped VMEM against the 16 MB limit —
    # the estimate below undercounts Mosaic's double buffers and fp32
    # temporaries by ~6 MB, so the threshold is set where the measured
    # allocations fit (production stages run n=1; small test geometries
    # still exercise the n>1 path).
    fixed = depth * 2 * c * (k + 3 + h) * 4 + depth * 2 * c * (k + 2 + h)
    n = 1
    for cand in (8, 4, 2):
        per_cell = depth * cand * l * c * 2 * 2 + cand * l * (c * 24 + h * 12)
        if b % cand == 0 and fixed + per_cell <= 6 * 1024 * 1024:
            n = cand
            break

    cell = pl.BlockSpec((n, l, c), lambda i: (i, 0, 0))
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out_shapes = [
        jax.ShapeDtypeStruct((b, l, c), dtype),        # dx
        jax.ShapeDtypeStruct((depth, k, c), jnp.float32),
        jax.ShapeDtypeStruct((depth, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((depth, 2, c), jnp.float32),
        jax.ShapeDtypeStruct((depth, c, h), jnp.float32),
        jax.ShapeDtypeStruct((depth, 1, h), jnp.float32),
        jax.ShapeDtypeStruct((depth, h, c), jnp.float32),
        jax.ShapeDtypeStruct((depth, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((depth, 1, c), jnp.float32),
    ]
    out_specs = [cell] + [acc(s.shape) for s in out_shapes[1:]]
    carr_spec = pl.BlockSpec((depth, n, l, c), lambda i: (0, i, 0, 0))
    wspecs = [acc(w.shape) for w in weights]

    outs = pl.pallas_call(
        functools.partial(_stage_bwd_kernel, depth=depth, kernel_size=k),
        out_shape=out_shapes,
        grid=(b // n,),
        in_specs=[carr_spec, cell] + wspecs,
        out_specs=out_specs,
        interpret=_interpret(),
    )(carries, dy, *weights)
    dx, ddw, ddwb, dln, dpw1, dpw1b, dpw2, dpw2b, dgamma = outs
    pdtype = jax.tree.leaves(blocks)[0].dtype
    dblocks = {
        "depth_conv": {
            "w": ddw.reshape(depth, k, 1, c).astype(pdtype),
            "b": ddwb.reshape(depth, c).astype(pdtype),
        },
        "norm": {
            "scale": dln[:, 0, :].astype(pdtype),
            "bias": dln[:, 1, :].astype(pdtype),
        },
        "pw1": {"w": dpw1.astype(pdtype), "b": dpw1b.reshape(depth, h).astype(pdtype)},
        "pw2": {"w": dpw2.astype(pdtype), "b": dpw2b.reshape(depth, c).astype(pdtype)},
        "gamma": dgamma.reshape(depth, c).astype(pdtype),
    }
    return dx, dblocks


@jax.custom_vjp
def stage_blocks_fused_bwd(x, blocks):
    """All blocks of a stage; XLA scan forward, fused Pallas backward."""
    return _xla_scan(x, blocks)


def _fused_fwd(x, blocks):
    from ..models.convnext import block as convnext_block

    def body(carry, bp):
        out = convnext_block(carry, bp, sdd_rate=0.0, enable_sdd=False, key=None)
        return out, carry  # stack each block's INPUT as the residual

    out, carries = jax.lax.scan(body, x, blocks)
    # carries: (depth, B, L, C) == what the Pallas backward recomputes from
    return out, (carries, blocks)


def _fused_bwd(residuals, dy):
    carries, blocks = residuals
    return _stage_bwd_pallas(carries, blocks, dy)


stage_blocks_fused_bwd.defvjp(_fused_fwd, _fused_bwd)


def bwd_stage_supported(l: int, c: int, hidden: int, dtype) -> bool:
    """Lane-aligned channel/hidden dims and a dtype Mosaic accepts.  The
    kernel keeps all (depth,) weight-grad accumulators VMEM-resident, so
    very wide stages fall back to XLA."""
    return (
        c % 128 == 0
        and hidden % 128 == 0
        and c * hidden <= 128 * 1024
        and mosaic_dtype_ok(dtype)
    )
