"""Pallas rasterizer vs the XLA reference implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.ops.pallas_raster import rasterize_pallas
from audio2photoreal_tpu.render.rasterizer import rasterize


def _random_mesh(n_faces=40, n_verts=30, H=64, W=64, seed=0):
    rng = np.random.RandomState(seed)
    pix = rng.rand(1, n_verts, 2).astype(np.float32) * [W, H]
    depth = (rng.rand(1, n_verts).astype(np.float32) * 4 + 0.5)
    faces = rng.randint(0, n_verts, (n_faces, 3)).astype(np.int32)
    return jnp.asarray(pix), jnp.asarray(depth), jnp.asarray(faces)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_rasterizer(seed):
    H = W = 64
    pix, depth, faces = _random_mesh(seed=seed, H=H, W=W)
    ref = rasterize(pix, depth, faces, H, W)
    rng = np.random.RandomState(seed + 7)
    face_uv = jnp.asarray(rng.rand(faces.shape[0], 3, 2).astype(np.float32))
    face, bary, dep, uv = rasterize_pallas(
        pix, depth, faces, H, W, tile=(32, 32), chunk=8, interpret=True,
        face_uv=face_uv, emit_barys=True,
    )
    ref_cov = np.asarray(ref.face_index[0] >= 0)
    pal_cov = np.asarray(face[0] >= 0)
    np.testing.assert_array_equal(pal_cov, ref_cov)
    # depths agree everywhere covered (face ids may differ on exact-tie edges)
    covered = ref_cov
    np.testing.assert_allclose(
        np.asarray(dep[0])[covered], np.asarray(ref.depth[0])[covered], atol=1e-4
    )
    same_face = np.asarray(face[0]) == np.asarray(ref.face_index[0])
    assert same_face[covered].mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(bary[0])[covered & same_face],
        np.asarray(ref.barys[0])[covered & same_face],
        atol=1e-4,
    )
    # in-kernel UV interpolation == bary-weighted corner UVs
    sel = covered & same_face
    fidx = np.asarray(face[0])[sel]
    b = np.asarray(bary[0])[sel]
    fuv = np.asarray(face_uv)[fidx]  # [N, 3, 2]
    ref_uv = (fuv * b[..., None]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(uv[0])[sel], ref_uv, atol=1e-4)


def test_pallas_single_triangle():
    pix = jnp.array([[[2.0, 2.0], [40.0, 2.0], [2.0, 40.0]]])
    depth = jnp.array([[1.0, 2.0, 3.0]])
    faces = jnp.array([[0, 1, 2]])
    face, bary, dep, _ = rasterize_pallas(
        pix, depth, faces, 48, 48, tile=(16, 16), chunk=8, interpret=True
    )
    assert int(face[0, 3, 3]) == 0
    assert int(face[0, 47, 47]) == -1
    s = float(bary[0, 3, 3].sum())
    assert s == pytest.approx(1.0, abs=1e-5)


def test_binned_matches_dense_sweep():
    """Per-tile worklist loop (tile_chunk_lists) == dense chunk sweep."""
    H = W = 64
    pix, depth, faces = _random_mesh(n_faces=64, seed=3, H=H, W=W)
    outs = {}
    for binned in (True, False):
        face, bary, dep, _ = rasterize_pallas(
            pix, depth, faces, H, W, tile=(32, 32), chunk=8, interpret=True,
            emit_barys=True, binned=binned,
        )
        outs[binned] = (np.asarray(face), np.asarray(bary), np.asarray(dep))
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=1e-6)
    np.testing.assert_allclose(outs[True][2], outs[False][2], atol=1e-6)
