"""UV-map precompute parity vs the reference geom.py (pytorch3d replaced by
a faithful CPU stand-in, tests/_p3d_stub.py).

Pins the map ORIENTATION: the reference's make_uv_face_index pre-flips both
axes (geom.py:54) and pytorch3d's NDC convention (+X left, +Y up) flips them
back, so reference maps are row ∝ v / col ∝ u — rasterize_uv_maps' default.
A v-flip here would silently mirror every converted real checkpoint's UV
masks, untied conv biases, and seam tables (caught in round 3)."""

import sys

import numpy as np
import pytest
import torch

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from tests import _p3d_stub

_p3d_stub.install()


@pytest.fixture()
def cpu_cuda(monkeypatch):
    """make_uv_face_index hardcodes cuda (geom.py:50-58) — redirect to cpu."""
    orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple(
            "cpu"
            if (isinstance(a, (str, torch.device)) and str(a).startswith("cuda"))
            else a
            for a in args
        )
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", _to)


def _tiny_atlas():
    vt = np.array([[0.1, 0.2], [0.9, 0.25], [0.15, 0.85], [0.8, 0.9]], np.float32)
    vti = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    return vt, vti


def test_face_index_and_barys_match_reference(cpu_cuda):
    from visualize.ca_body.utils import geom as ref_geom

    from audio2photoreal_tpu.render.geometry import rasterize_uv_maps

    vt, vti = _tiny_atlas()
    S = 64
    fi_ref, bary_ref = ref_geom.make_uv_barys(
        torch.as_tensor(vt), torch.as_tensor(vti), S, flip_uv=False
    )
    fi_ref = fi_ref.cpu().numpy()
    bary_ref = bary_ref.cpu().numpy()

    fi, bary = rasterize_uv_maps(vt, vti, S)  # default orientation
    agree = (fi == fi_ref).mean()
    assert agree > 0.995, f"face-index agreement {agree}"
    both = (fi == fi_ref) & (fi >= 0)
    np.testing.assert_allclose(bary[both], bary_ref[both], atol=1e-4)


def test_vert_index_matches_reference(cpu_cuda):
    from visualize.ca_body.utils import geom as ref_geom

    from audio2photoreal_tpu.render.geometry import (
        rasterize_uv_maps,
        uv_vert_index_from_face_index,
    )

    vt, vti = _tiny_atlas()
    vi = np.array([[5, 6, 7], [6, 8, 7]], np.int64)  # geometry ids ≠ uv ids
    S = 32
    vidx_ref = ref_geom.make_uv_vert_index(
        torch.as_tensor(vt), torch.as_tensor(vi), torch.as_tensor(vti), S, flip_uv=False
    ).cpu().numpy()

    fi, _ = rasterize_uv_maps(vt, vti, S)
    vidx = uv_vert_index_from_face_index(fi, vi)
    covered = vidx_ref[..., 0] >= 0
    same_face = fi == np.where(covered, fi, -1)  # only compare agreeing texels
    m = covered & (fi >= 0)
    np.testing.assert_array_equal(vidx[m], vidx_ref[m])


def test_from_uv_matches_reference_sample_uv(cpu_cuda):
    """from_uv == reference sample_uv (align_corners=True grid_sample at the
    UV verts + v2uv duplicate mean, geom.py:274-302)."""
    import jax.numpy as jnp

    from visualize.ca_body.utils import geom as ref_geom

    from audio2photoreal_tpu.render.geometry import GeometryModule

    vt, vti = _tiny_atlas()
    vi = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    # v2uv with a duplicated UV vert for geometry vertex 1 (seam-style)
    vt = np.concatenate([vt, [[0.88, 0.3]]], 0).astype(np.float32)
    v2uv = np.array([[0, 0], [1, 4], [2, 2], [3, 3]], np.int64)
    S = 16

    rng = np.random.RandomState(0)
    img = rng.randn(2, S, S, 3).astype(np.float32)

    out_ref = ref_geom.sample_uv(
        torch.as_tensor(img.transpose(0, 3, 1, 2)),
        torch.as_tensor(vt),
        torch.as_tensor(v2uv),
    ).numpy()

    geo = GeometryModule.create(vi, vt, vti, S, impaint=False, v2uv=v2uv)
    out = np.asarray(geo.from_uv(jnp.asarray(img)))
    np.testing.assert_allclose(out, out_ref, atol=1e-5, rtol=1e-5)
