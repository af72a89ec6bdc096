"""UV-space geometry machinery.

Re-design of visualize/ca_body/utils/geom.py:
- UV index/bary maps (``make_uv_vert_index``/``make_uv_barys``, geom.py:32-144):
  the reference rasterizes UV triangles with pytorch3d's CUDA kernel; here the
  maps are precomputed ONCE per topology host-side with a numpy bbox
  rasterizer (they are static assets, not runtime work),
- ``values_to_uv`` (geom.py:304-322) — vertex values → UV image via
  bary-weighted gather,
- ``sample_uv`` (geom.py:274-302) — UV image → per-vertex values via bilinear
  grid-sample + mean over duplicated UV verts,
- impainting of texels outside the chart (``index_image_impaint``,
  geom.py:146-196) via nearest-valid-texel lookup (KDTree at asset build),
- normals (geom.py:323-346) and ``compute_view_cos`` (geom.py:347-357).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear


# --------------------------------------------------------------------- #
# host-side precompute (asset build time)
# --------------------------------------------------------------------- #


def rasterize_uv_maps(
    uv_coords: np.ndarray,  # [Vt, 2] in [0, 1]
    uv_faces: np.ndarray,  # [F, 3] indices into uv_coords
    uv_size: int,
    flip_v: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (face_index [H, W] int32, −1 = empty; barys [H, W, 3] float32).

    Numpy bbox rasterizer over texel centers — equivalent of the pytorch3d
    ``rasterize_meshes`` call in geom.py:32-67 but host-side and offline.

    Orientation: the DEFAULT (flip_v=False) reproduces the reference maps
    exactly — row ∝ v, col ∝ u.  The reference's ``make_uv_face_index``
    pre-flips both axes (``vt = 1 - vt``, geom.py:54) and pytorch3d's NDC
    convention (+X left, +Y up, row 0 at +Y) flips them back, so the double
    flip cancels (verified texel-exact vs a faithful rasterize_meshes stand-in
    in tests/test_uvmap_reference_parity.py)."""
    H = W = uv_size
    face_index = np.full((H, W), -1, np.int32)
    barys = np.zeros((H, W, 3), np.float32)
    uv = uv_coords.astype(np.float64).copy()
    if flip_v:
        uv[:, 1] = 1.0 - uv[:, 1]
    # texel-center grid coordinates
    px = uv[:, 0] * W - 0.5
    py = uv[:, 1] * H - 0.5
    best_cover = np.zeros((H, W), np.float64)  # resolve overlaps deterministically

    for f, (a, b, c) in enumerate(uv_faces):
        xa, ya = px[a], py[a]
        xb, yb = px[b], py[b]
        xc, yc = px[c], py[c]
        x0 = max(int(np.floor(min(xa, xb, xc))), 0)
        x1 = min(int(np.ceil(max(xa, xb, xc))) + 1, W)
        y0 = max(int(np.floor(min(ya, yb, yc))), 0)
        y1 = min(int(np.ceil(max(ya, yb, yc))) + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        det = (yb - yc) * (xa - xc) + (xc - xb) * (ya - yc)
        if abs(det) < 1e-12:
            continue
        w0 = ((yb - yc) * (xs - xc) + (xc - xb) * (ys - yc)) / det
        w1 = ((yc - ya) * (xs - xc) + (xa - xc) * (ys - yc)) / det
        w2 = 1.0 - w0 - w1
        eps = -1e-7
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
        if not inside.any():
            continue
        sub_cover = np.where(inside, 1.0, 0.0)
        cur = best_cover[y0:y1, x0:x1]
        take = inside & (sub_cover >= cur)
        yy, xx = np.where(take)
        face_index[y0 + yy, x0 + xx] = f
        barys[y0 + yy, x0 + xx, 0] = w0[take]
        barys[y0 + yy, x0 + xx, 1] = w1[take]
        barys[y0 + yy, x0 + xx, 2] = w2[take]
        best_cover[y0 + yy, x0 + xx] = 1.0
    return face_index, barys


def impaint_index_maps(
    face_index: np.ndarray, barys: np.ndarray, distance_threshold: Optional[float] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Fill empty texels from the nearest valid texel (geom.py:146-196)."""
    H, W = face_index.shape
    valid = face_index >= 0
    if valid.all() or not valid.any():
        return face_index, barys
    try:
        from scipy.spatial import cKDTree

        vy, vx = np.where(valid)
        tree = cKDTree(np.stack([vy, vx], 1))
        ey, ex = np.where(~valid)
        dist, nearest = tree.query(np.stack([ey, ex], 1))
        src_y, src_x = vy[nearest], vx[nearest]
        if distance_threshold is not None:
            keep = dist < distance_threshold  # strict, as geom.py:176
            ey, ex, src_y, src_x = ey[keep], ex[keep], src_y[keep], src_x[keep]
    except ImportError:  # brute-force fallback for small maps
        vy, vx = np.where(valid)
        ey, ex = np.where(~valid)
        d2 = (ey[:, None] - vy[None]) ** 2 + (ex[:, None] - vx[None]) ** 2
        nearest = d2.argmin(1)
        src_y, src_x = vy[nearest], vx[nearest]
    fi = face_index.copy()
    ba = barys.copy()
    fi[ey, ex] = face_index[src_y, src_x]
    ba[ey, ex] = barys[src_y, src_x]
    return fi, ba


def uv_vert_index_from_face_index(
    face_index: np.ndarray, uv_faces_geom: np.ndarray
) -> np.ndarray:
    """[H, W] face ids → [H, W, 3] GEOMETRY vertex ids (geom.py:70-108)."""
    safe = np.maximum(face_index, 0)
    vert_index = uv_faces_geom[safe]
    vert_index[face_index < 0] = 0
    return vert_index.astype(np.int32)


# --------------------------------------------------------------------- #
# runtime module
# --------------------------------------------------------------------- #


@dataclass
class GeometryModule:
    """Static per-topology maps + runtime to_uv/from_uv (geom.py:198-322)."""

    faces: jnp.ndarray  # [F, 3] geometry faces
    uv_coords: jnp.ndarray  # [Vt, 2]
    uv_faces: jnp.ndarray  # [F, 3] texture faces
    vert_index_img: jnp.ndarray  # [H, W, 3] geometry vert ids per texel
    bary_img: jnp.ndarray  # [H, W, 3]
    valid_mask: jnp.ndarray  # [H, W] 1 where a chart covers the texel
    v2uv: jnp.ndarray  # [V, K] UV-vertex ids per GEOMETRY vertex (dups on seams)

    @property
    def vert_uv(self) -> jnp.ndarray:
        """[V, 2] representative UV per geometry vertex (first duplicate)."""
        return self.uv_coords[self.v2uv[:, 0]]

    @classmethod
    def create(
        cls,
        verts_faces: np.ndarray,
        uv_coords: np.ndarray,
        uv_faces: np.ndarray,
        uv_size: int,
        impaint: bool = True,
        flip_uv: bool = False,
        v2uv: Optional[np.ndarray] = None,
        impaint_threshold: float = 100.0,
    ) -> "GeometryModule":
        """``v2uv`` [V, K]: per-geometry-vertex UV-vertex duplicates (the
        reference topology asset, mesh_vae_drivable.py:96); from_uv averages
        samples over all K (geom.py:299-300).  If absent, a [V, 1] table is
        derived from the first uv-face occurrence (exact when the atlas has
        no seam-duplicated vertices, as in the synthetic fixtures)."""
        face_index, barys = rasterize_uv_maps(uv_coords, uv_faces, uv_size, flip_v=flip_uv)
        valid = (face_index >= 0).astype(np.float32)
        if impaint:
            # texels farther than the threshold stay empty (zero barys), like
            # the reference's index_image_impaint(distance_threshold=100)
            face_index, barys = impaint_index_maps(face_index, barys, impaint_threshold)
        vert_index = uv_vert_index_from_face_index(face_index, np.asarray(verts_faces))
        if v2uv is None:
            V = int(np.asarray(verts_faces).max()) + 1
            v2uv_np = np.zeros((V, 1), np.int64)
            seen = np.zeros(V, bool)
            vf = np.asarray(verts_faces).reshape(-1)
            uf = np.asarray(uv_faces).reshape(-1)
            for gi, ti in zip(vf, uf):
                if not seen[gi]:
                    v2uv_np[gi, 0] = ti
                    seen[gi] = True
        else:
            v2uv_np = np.asarray(v2uv, np.int64)
        return cls(
            faces=jnp.asarray(verts_faces, jnp.int32),
            uv_coords=jnp.asarray(uv_coords, jnp.float32),
            uv_faces=jnp.asarray(uv_faces, jnp.int32),
            vert_index_img=jnp.asarray(vert_index),
            bary_img=jnp.asarray(barys),
            valid_mask=jnp.asarray(valid),
            v2uv=jnp.asarray(v2uv_np, jnp.int32),
        )

    def to_uv(self, values: jnp.ndarray) -> jnp.ndarray:
        """[B, V, C] → [B, H, W, C] (values_to_uv, geom.py:304-322)."""
        idx = self.vert_index_img  # [H, W, 3]
        gathered = values[:, idx]  # [B, H, W, 3, C]
        return (gathered * self.bary_img[None, ..., None]).sum(axis=-2)

    def from_uv(self, uv_img: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, C] → [B, V, C] (sample_uv, geom.py:274-302): bilinear
        sample at every UV vertex (align_corners=True, zeros padding — the
        reference's F.grid_sample defaults), then mean over each geometry
        vertex's seam duplicates via v2uv (geom.py:298-300)."""
        uv = self.uv_coords  # [Vt, 2], row ∝ v / col ∝ u — same frame as maps
        grid = uv * 2.0 - 1.0
        grid = jnp.broadcast_to(grid[None, :, None, :], (uv_img.shape[0], uv.shape[0], 1, 2))
        out = grid_sample_bilinear(uv_img, grid, align_corners=True, padding_zero=True)
        out = out[:, :, 0, :]  # [B, Vt, C]
        return out[:, self.v2uv].mean(axis=2)  # [B, V, C]


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """[B, V, 3] × [F, 3] → [B, F, 3] (geom.py:323-333)."""
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n


def vert_normals(verts: jnp.ndarray, faces: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Vertex normals via scatter-add of NORMALIZED face normals
    (geom.py:334-346 — not area-weighted: each face contributes its unit
    normal once per corner)."""
    fn = face_normals(verts, faces, normalize=False)
    norm = jnp.linalg.norm(fn, axis=-1, keepdims=True)
    fn = fn / jnp.where(norm < eps, 1.0, norm)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[:, faces[:, k]].add(fn)
    norm = jnp.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / jnp.where(norm < eps, 1.0, norm)


def compute_view_cos(verts: jnp.ndarray, faces: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex cos(angle between normal and the CAMERA→VERTEX direction)
    (geom.py:347-351 — the reference dots against ``verts - camera_pos``, so
    surfaces facing the camera get NEGATIVE view-cos; sign matters, the view
    UNet was trained on it)."""
    vn = vert_normals(verts, faces)
    view = verts - campos[:, None, :]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("bvd,bvd->bv", vn, view)


def project_points(
    verts: jnp.ndarray,  # [B, V, 3] world
    K: jnp.ndarray,  # [B, 3, 3]
    Rt: jnp.ndarray,  # [B, 3, 4] world→cam (OpenCV convention)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (pixel coords [B, V, 2], cam-space depth [B, V])
    (geom.py:525-557 project_points_multi, single camera)."""
    cam = jnp.einsum("bij,bvj->bvi", Rt[..., :3], verts) + Rt[..., 3][:, None]
    z = cam[..., 2]
    xy = cam[..., :2] / jnp.maximum(z[..., None], 1e-8)
    pix = jnp.einsum("bij,bvj->bvi", K[:, :2, :2], xy) + K[:, :2, 2][:, None]
    return pix, z


def project_points_multi(
    p: jnp.ndarray,  # [B, N, 3] world points
    Rt: jnp.ndarray,  # [B, NC, 3, 4]
    K: jnp.ndarray,  # [B, NC, 3, 3]
    normalize: bool = False,
    size=None,
):
    """Pinhole projection into MULTIPLE cameras (ca_body/utils/geom.py:525-557)
    → (pix [B, NC, N, 2], depth [B, NC, N])."""
    cam = jnp.einsum("bcij,bnj->bcni", Rt[..., :3], p) + Rt[..., 3][:, :, None]
    pix3 = jnp.einsum("bcij,bcnj->bcni", K, cam)
    depth = pix3[..., 2]
    pix = pix3[..., :2] / jnp.maximum(depth[..., None], 1e-8)
    if normalize:
        assert size is not None
        h, w = size
        pix = 2.0 * pix / jnp.asarray([w, h], jnp.float32) - 1.0
    return pix, depth


def depth2xyz(depth: jnp.ndarray, focal: jnp.ndarray, princpt: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] depth + [B, 2, 2] focal + [B, 2] principal point → [B, H, W, 3]
    camera-space XYZ (geom.py:584-612, NHWC)."""
    B, H, W = depth.shape
    ix = (jnp.arange(W, dtype=jnp.float32)[None, None] - princpt[:, None, None, 0]) / focal[
        :, None, None, 0, 0
    ]
    iy = (jnp.arange(H, dtype=jnp.float32)[None, :, None] - princpt[:, None, None, 1]) / focal[
        :, None, None, 1, 1
    ]
    return jnp.stack([depth * ix, depth * iy, depth], axis=-1)


def xyz2normals(xyz: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[B, H, W, 3] XYZ image → unit normals via central differences
    (geom.py:559-580, NHWC)."""
    z = jnp.zeros_like(xyz[:, :1])
    xp = jnp.concatenate([z, xyz, z], axis=1)
    z2 = jnp.zeros_like(xp[:, :, :1])
    xp = jnp.concatenate([z2, xp, z2], axis=2)
    U = (xp[:, 2:, 1:-1] - xp[:, :-2, 1:-1]) / -2
    V = (xp[:, 1:-1, 2:] - xp[:, 1:-1, :-2]) / -2
    n = jnp.cross(U, V)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)


def depth2normals(depth: jnp.ndarray, focal: jnp.ndarray, princpt: jnp.ndarray) -> jnp.ndarray:
    """Depth image → normal image (geom.py:616-633)."""
    return xyz2normals(depth2xyz(depth, focal, princpt))
