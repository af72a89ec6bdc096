"""Multi-host bootstrap helpers (parallel/distributed.py).

The reference scaffolds torch multi-process training but never initializes it
(utils/misc.py:29-48); here the per-process slicing math and the global-batch
assembly are real and unit-testable without multiple hosts: process_count/
process_index are parameters, and on one process shard_batch_global must be
exactly shard_batch.
"""

import jax
import numpy as np
import pytest

from audio2photoreal_tpu.parallel import distributed as dist
from audio2photoreal_tpu.parallel.mesh import data_mesh, local_mesh
from audio2photoreal_tpu.parallel.sharding import shard_batch


def test_local_batch_size_divides():
    assert dist.local_batch_size(64, process_count=4) == 16
    assert dist.local_batch_size(64, process_count=1) == 64
    with pytest.raises(ValueError):
        dist.local_batch_size(64, process_count=3)


def test_slice_for_process_partitions_exactly():
    # every item covered exactly once, for even and ragged n
    for n in (16, 17, 3, 1):
        for pc in (1, 2, 4, 8):
            got = []
            for pi in range(pc):
                s = dist.slice_for_process(n, process_index=pi, process_count=pc)
                got.extend(range(n)[s])
            assert got == list(range(n)), (n, pc, got)


def test_slice_for_process_balanced():
    # ragged splits differ by at most one item
    sizes = [
        len(range(17)[dist.slice_for_process(17, pi, 5)]) for pi in range(5)
    ]
    assert max(sizes) - min(sizes) <= 1 and sum(sizes) == 17


def test_per_process_seed_distinct():
    seeds = {dist.per_process_seed(10, pi) for pi in range(64)}
    assert len(seeds) == 64
    # nearby base seeds don't collide across processes
    assert dist.per_process_seed(11, 0) not in {
        dist.per_process_seed(10, pi) for pi in range(64)
    }


def test_shard_batch_global_matches_shard_batch_single_process():
    mesh = local_mesh()
    batch = {
        "motion": np.random.RandomState(0).randn(8, 6, 4).astype(np.float32),
        "mask": np.ones((8, 6), np.float32),
    }
    a = dist.shard_batch_global(mesh, batch)
    b = shard_batch(mesh, batch)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # the sharded array is usable inside jit with a psum-style reduction
    out = jax.jit(lambda x: x.sum())(a["motion"])
    np.testing.assert_allclose(float(out), batch["motion"].sum(), rtol=1e-5)


def test_data_mesh_subsets_when_batch_small():
    # 8 virtual devices, batch 6 -> gcd 2 devices (single-process fallback)
    mesh = data_mesh(6)
    assert mesh.devices.size == 2
    assert data_mesh(8).devices.size == 8


def test_initialize_noop_without_launcher_env(monkeypatch):
    # bare single-host run: auto-detect finds no cluster and stays a no-op
    for var in ("COORDINATOR_ADDRESS", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(var, raising=False)
    assert dist.initialize() is False
    assert jax.process_count() == 1
    assert dist.is_coordinator()
