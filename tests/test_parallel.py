"""Mesh/sharding layer tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from audio2photoreal_tpu.parallel import (
    MeshSpec,
    batch_sharding,
    create_mesh,
    shard_batch,
)
from audio2photoreal_tpu.parallel.collectives import all_gather, pmean, psum


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_spec_resolve():
    assert MeshSpec((-1,)).resolve(8) == (8,)
    assert MeshSpec((2, -1), ("data", "model")).resolve(8) == (2, 4)
    with pytest.raises(ValueError):
        MeshSpec((3,)).resolve(8)


def test_shard_batch_places_on_mesh():
    mesh = create_mesh(MeshSpec((-1,), ("data",)))
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = shard_batch(mesh, {"x": x})["x"]
    assert xs.sharding == batch_sharding(mesh, 2)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_data_parallel_grad_psum_semantics():
    """Sharded-batch loss grad == full-batch grad (XLA inserts the reduction)."""
    mesh = create_mesh(MeshSpec((-1,), ("data",)))
    w = jnp.ones((4, 4))
    x = np.random.RandomState(0).randn(16, 4).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, jnp.asarray(x))
    xs = shard_batch(mesh, x)
    g_sharded = jax.jit(jax.grad(loss))(w, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-5)


def test_collectives_inside_shard_map():
    from jax.experimental.shard_map import shard_map

    mesh = create_mesh(MeshSpec((-1,), ("data",)))
    x = jnp.arange(8.0)

    def f(x):
        return psum(x, "data"), pmean(x, "data"), all_gather(x, "data")

    out = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=(P(), P(), P("data")))(x)
    assert float(out[0][0]) == pytest.approx(28.0)
    assert float(out[1][0]) == pytest.approx(3.5)


def test_collectives_noop_without_mesh():
    x = jnp.arange(4.0)
    assert jnp.allclose(pmean(x, "data"), x)
    assert jnp.allclose(psum(x, "data"), x)
    assert all_gather(x, "data").shape == (1, 4)
