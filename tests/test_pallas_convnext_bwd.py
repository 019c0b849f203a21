"""Fused ConvNeXt stage BACKWARD kernel vs the XLA scan backward.

The kernel (ops/pallas_convnext_bwd.py) recomputes each block's forward in
VMEM from the saved scan carries and mirrors the XLA dtype flow (bf16
storage, fp32 LayerNorm/accumulation), so gradients agree to bf16 rounding
— these tests pin that tolerance, the routing in cnn_forward, and vmap
(ensemble) behavior.  Interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.config import Config
from audio_to_midi_tpu.models import convnext, model as model_lib
from audio_to_midi_tpu.ops.pallas_convnext_bwd import (
    _xla_scan,
    bwd_stage_supported,
    stage_blocks_fused_bwd,
)

DEPTH, L, C, H = 3, 40, 128, 256


def _stage(key, depth=DEPTH, c=C, h=H):
    blocks = [
        convnext.init_block(k, c, h) for k in jax.random.split(key, depth)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), stacked)


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    denom = np.maximum(np.abs(b).max(), 1e-3)
    return np.abs(a - b).max() / denom


class TestFusedStageBwd:
    def test_forward_unchanged(self):
        blocks = _stage(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, L, C), jnp.bfloat16)
        out = stage_blocks_fused_bwd(x, blocks)
        ref = _xla_scan(x, blocks)
        assert out.dtype == ref.dtype
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32)
        )

    def test_grads_match_xla(self):
        blocks = _stage(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, L, C), jnp.bfloat16)
        cot = jax.random.normal(jax.random.PRNGKey(2), (2, L, C), jnp.bfloat16)

        def loss(fn, x, b):
            return jnp.sum(fn(x, b).astype(jnp.float32) * cot.astype(jnp.float32))

        gx_k, gb_k = jax.grad(lambda x, b: loss(stage_blocks_fused_bwd, x, b),
                              argnums=(0, 1))(x, blocks)
        gx_r, gb_r = jax.grad(lambda x, b: loss(_xla_scan, x, b),
                              argnums=(0, 1))(x, blocks)

        assert _rel_err(gx_k, gx_r) < 0.03, _rel_err(gx_k, gx_r)
        flat_k = jax.tree_util.tree_flatten_with_path(gb_k)[0]
        flat_r = jax.tree.leaves(gb_r)
        for (path, leaf_k), leaf_r in zip(flat_k, flat_r):
            err = _rel_err(leaf_k, leaf_r)
            assert err < 0.03, (jax.tree_util.keystr(path), err)

    def test_grad_dtypes_match_params(self):
        blocks = _stage(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, L, C), jnp.bfloat16)
        gx, gb = jax.grad(
            lambda x, b: jnp.sum(
                stage_blocks_fused_bwd(x, b).astype(jnp.float32)
            ),
            argnums=(0, 1),
        )(x, blocks)
        assert gx.dtype == x.dtype
        for leaf_p, leaf_g in zip(jax.tree.leaves(blocks), jax.tree.leaves(gb)):
            assert leaf_g.dtype == leaf_p.dtype
            assert leaf_g.shape == leaf_p.shape

    def test_vmap_ensemble(self):
        """The train step vmaps members over stacked params."""
        e = 2
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_stage(jax.random.PRNGKey(i)) for i in range(e)],
        )
        x = jax.random.normal(jax.random.PRNGKey(9), (e, 2, L, C), jnp.bfloat16)

        def member_loss(b, x):
            return jnp.sum(stage_blocks_fused_bwd(x, b).astype(jnp.float32))

        gk = jax.vmap(jax.grad(member_loss))(stacked, x)
        gr = jax.vmap(
            jax.grad(lambda b, x: jnp.sum(_xla_scan(x, b).astype(jnp.float32)))
        )(stacked, x)
        for leaf_k, leaf_r in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
            assert _rel_err(leaf_k, leaf_r) < 0.03

    def test_supported_predicate(self):
        assert bwd_stage_supported(500, 128, 256, jnp.bfloat16)
        assert bwd_stage_supported(250, 256, 512, jnp.bfloat16)
        assert not bwd_stage_supported(1000, 64, 128, jnp.bfloat16)  # lanes
        assert not bwd_stage_supported(500, 128, 256, jnp.float16)  # mosaic
        assert not bwd_stage_supported(100, 512, 1024, jnp.bfloat16)  # VMEM


class TestCnnForwardRouting:
    def _small_cfg(self, **kw):
        cfg = Config().model
        return dataclasses.replace(
            cfg,
            dims=(4, 128),
            depths=(1, 2),
            cnn_scan_unroll=1,
            **kw,
        )

    def test_grads_close_and_forward_identical_vs_flag_off(self):
        cfg_on = self._small_cfg(cnn_bwd_kernel=True)
        cfg_off = self._small_cfg(cnn_bwd_kernel=False)
        key = jax.random.PRNGKey(0)
        params = convnext.init_cnn(key, cfg_on)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        # length: stem /5 then /2; make packed-row math integral
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 320, 2), jnp.bfloat16)

        def loss(cfg):
            def f(p, x):
                return jnp.sum(
                    convnext.cnn_forward(x, p, cfg).astype(jnp.float32)
                )

            return jax.value_and_grad(f)(params, x)

        on_v, on_g = loss(cfg_on)
        off_v, off_g = loss(cfg_off)
        assert float(on_v) == pytest.approx(float(off_v), rel=1e-6)
        for leaf_k, leaf_r in zip(jax.tree.leaves(on_g), jax.tree.leaves(off_g)):
            assert _rel_err(leaf_k, leaf_r) < 0.03

    def test_full_model_grad_path_runs(self):
        """The production model (stage 5/6 eligible) differentiates through
        the kernel path without error at tiny batch."""
        cfg = Config()
        params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
        params = model_lib.cast_params(params, jnp.bfloat16)
        x = jax.random.normal(
            jax.random.PRNGKey(1), (1, cfg.data.samples_per_window, 2),
            jnp.bfloat16,
        )

        def f(p, x):
            return jnp.sum(
                convnext.cnn_forward(x, p["cnn"], cfg.model).astype(jnp.float32)
            )

        val, grads = jax.value_and_grad(f)(params, x)
        assert np.isfinite(float(val))
        assert all(
            bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
            for g in jax.tree.leaves(grads["cnn"])
        )
