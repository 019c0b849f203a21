"""Sharding / multi-device tests on the virtual 8-CPU mesh: mesh shapes,
batch sharding, DP gradient consistency vs single device, the multi-host
array-assembly helper, and the graft dryrun path."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from audio_to_midi_tpu.parallel import (
    batch_spec,
    ensemble_spec,
    make_mesh,
    replicated,
    shard_params,
)
from audio_to_midi_tpu.parallel.mesh import host_local_batch_to_global


def test_mesh_shapes():
    mesh = make_mesh(1)
    assert dict(mesh.shape) == {"ensemble": 1, "data": 8}
    mesh2 = make_mesh(2)
    assert dict(mesh2.shape) == {"ensemble": 2, "data": 4}
    mesh3 = make_mesh(3)  # does not divide 8 -> falls back to pure DP
    assert dict(mesh3.shape) == {"ensemble": 1, "data": 8}


def test_batch_sharded_over_devices():
    mesh = make_mesh(1)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    sharded = jax.device_put(x, batch_spec(mesh))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))


def test_replicated_params():
    mesh = make_mesh(1)
    params = {"w": jnp.ones((4, 4))}
    placed = shard_params(params, mesh)
    shards = placed["w"].addressable_shards
    assert len(shards) == 8
    for s in shards:
        assert s.data.shape == (4, 4)  # full copy per device


def test_dp_grad_matches_single_device():
    """The GSPMD all-reduce must produce the same grads as one device."""
    mesh = make_mesh(1)

    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    w = jnp.eye(4) * 0.7
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))

    g_single = jax.grad(loss)(w, x)

    w_r = jax.device_put(w, replicated(mesh))
    x_s = jax.device_put(x, batch_spec(mesh))
    g_sharded = jax.jit(jax.grad(loss))(w_r, x_s)
    # all-reduce changes the f32 summation order
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5, atol=1e-6
    )


def test_host_local_batch_to_global():
    mesh = make_mesh(1)
    batch = {"a": np.arange(8 * 2, dtype=np.float32).reshape(8, 2)}
    out = host_local_batch_to_global(batch, mesh)
    assert out["a"].shape == (8, 2)  # single-process: local == global
    np.testing.assert_array_equal(np.asarray(out["a"]), batch["a"])


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
