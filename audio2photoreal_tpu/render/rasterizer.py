"""Screen-space triangle rasterization, XLA-native.

Replaces pytorch3d's CUDA ``MeshRasterizer`` + ``TexturesUV`` sampling
(reference: visualize/ca_body/utils/render.py:28-63) with a z-buffered
rasterizer built from XLA ops: faces are processed in fixed-size chunks under
``lax.scan`` with per-pixel argmin-depth reduction — static shapes, no
scatter conflicts, fully fusable.  A Pallas tile-binning kernel is the
planned fast path (SURVEY §7 hard-part #1); this implementation defines the
semantics and serves as its reference.

Conventions follow the reference: OpenCV camera (x right, y down, z forward),
pixel centers at integer coordinates, faces back-face-culled OFF (the
reference rasterizes two-sided), nearest-depth wins.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear


class RasterOut(NamedTuple):
    face_index: jnp.ndarray  # [B, H, W] int32, -1 = background
    barys: jnp.ndarray  # [B, H, W, 3]
    depth: jnp.ndarray  # [B, H, W] (+inf at background)
    uv: Optional[jnp.ndarray] = None  # [B, H, W, 2] per-pixel UV (Pallas path)


def rasterize(
    pix_verts: jnp.ndarray,  # [B, V, 2] pixel coords
    depth: jnp.ndarray,  # [B, V] camera-space z
    faces: jnp.ndarray,  # [F, 3]
    height: int,
    width: int,
    chunk: int = 256,
    use_pallas: Optional[bool] = None,
    face_uv: Optional[jnp.ndarray] = None,  # [F, 3, 2] → in-kernel UV interp
    exact_face_ids: bool = True,
) -> RasterOut:
    """Dispatch: the Pallas tile kernel on TPU (10× this XLA path at
    1024×704/7k faces), the XLA chunked scan elsewhere.

    ``face_uv`` (per-corner UVs, v already flipped) makes the TPU kernel emit
    per-pixel UV directly, skipping the interpolate_uv gather.
    ``exact_face_ids=False`` skips the Morton-order→caller face-id remap
    gather (~8 ms/frame at the production point) — face_index then still
    masks coverage (>= 0 ⇔ covered) but ids index the kernel's sorted
    order."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        from audio2photoreal_tpu.ops.pallas_raster import rasterize_pallas

        face, bary, dep, uv = rasterize_pallas(
            pix_verts, depth, faces, height, width, face_uv=face_uv,
            remap_ids=exact_face_ids,
        )
        return RasterOut(face_index=face, barys=bary, depth=dep, uv=uv)
    return _rasterize_xla(pix_verts, depth, faces, height, width, chunk)


def _rasterize_xla(
    pix_verts: jnp.ndarray,
    depth: jnp.ndarray,
    faces: jnp.ndarray,
    height: int,
    width: int,
    chunk: int = 256,
) -> RasterOut:
    B, V, _ = pix_verts.shape
    F = faces.shape[0]
    pad = (-F) % chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))
    valid_face = jnp.pad(jnp.ones((F,), bool), (0, pad))
    n_chunks = faces_p.shape[0] // chunk
    faces_c = faces_p.reshape(n_chunks, chunk, 3)
    valid_c = valid_face.reshape(n_chunks, chunk)

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]

    def chunk_body(carry, inputs):
        best_z, best_face, best_bary = carry
        fchunk, vmask, base = inputs
        # gather triangle vertices: [B, C, 3(vert), 2]
        tri = pix_verts[:, fchunk]  # [B, C, 3, 2]
        tz = depth[:, fchunk]  # [B, C, 3]
        xa, ya = tri[..., 0, 0], tri[..., 0, 1]
        xb, yb = tri[..., 1, 0], tri[..., 1, 1]
        xc, yc = tri[..., 2, 0], tri[..., 2, 1]
        det = (yb - yc) * (xa - xc) + (xc - xb) * (ya - yc)  # [B, C]
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

        # barycentrics for every pixel vs every face in the chunk:
        # w0 = ((yb−yc)(x−xc) + (xc−xb)(y−yc)) / det
        dx = gx[None, None] - xc[..., None, None]  # [B, C, H, W]
        dy = gy[None, None] - yc[..., None, None]
        w0 = ((yb - yc)[..., None, None] * dx + (xc - xb)[..., None, None] * dy) * inv_det[..., None, None]
        w1 = ((yc - ya)[..., None, None] * dx + (xa - xc)[..., None, None] * dy) * inv_det[..., None, None]
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(det) > 1e-12)[..., None, None]
        # perspective-ignored bary depth interpolation (matches pytorch3d's
        # default perspective_correct=False in the reference's RenderLayer)
        z = (
            w0 * tz[..., 0, None, None]
            + w1 * tz[..., 1, None, None]
            + w2 * tz[..., 2, None, None]
        )
        front = inside & (z > 1e-6) & vmask[None, :, None, None]
        z = jnp.where(front, z, jnp.inf)
        # nearest face within the chunk
        zmin = z.min(axis=1)  # [B, H, W]
        amin = z.argmin(axis=1)  # [B, H, W]
        bary = jnp.stack([w0, w1, w2], axis=-1)  # [B, C, H, W, 3]
        bsel = jnp.take_along_axis(bary, amin[:, None, ..., None], axis=1)[:, 0]
        take = zmin < best_z
        best_face = jnp.where(take, base + amin.astype(jnp.int32), best_face)
        best_bary = jnp.where(take[..., None], bsel, best_bary)
        best_z = jnp.minimum(best_z, zmin)
        return (best_z, best_face, best_bary), None

    init = (
        jnp.full((B, height, width), jnp.inf),
        jnp.full((B, height, width), -1, jnp.int32),
        jnp.zeros((B, height, width, 3)),
    )
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_z, best_face, best_bary), _ = jax.lax.scan(
        chunk_body, init, (faces_c, valid_c, bases)
    )
    return RasterOut(face_index=best_face, barys=best_bary, depth=best_z)


def interpolate_uv(
    raster: RasterOut,
    uv_coords: jnp.ndarray,  # [Vt, 2]
    uv_faces: jnp.ndarray,  # [F, 3]
    flip_uv: bool = False,
) -> jnp.ndarray:
    """Per-pixel UV coordinates from the rasterization (TexturesUV sampling
    prep, render.py:50-57).  Default samples texture row ∝ v: the UV-space
    images decoded by the avatar are row ∝ v (reference map orientation —
    see rasterize_uv_maps), and the reference reconciles pytorch3d's
    bottom-left TexturesUV origin by flipping the texture (render.py:52-53),
    which nets out to the same row ∝ v lookup.

    The per-face UV triplet table [F, 3, 2] is assembled once (dense, F
    faces) so the per-pixel step is ONE gather with a contiguous 24-byte
    slice instead of chained index→uv gathers — TPU gathers are
    per-index-op bound."""
    safe_face = jnp.maximum(raster.face_index, 0)
    face_uv = uv_coords[uv_faces]  # [F, 3, 2] — static per mesh
    tuv = jnp.take(face_uv, safe_face, axis=0)  # [B, H, W, 3, 2]
    uv = (tuv * raster.barys[..., None]).sum(axis=-2)
    if flip_uv:
        uv = jnp.stack([uv[..., 0], 1.0 - uv[..., 1]], axis=-1)
    return uv


def render_texture(
    raster: RasterOut,
    uv_pix: jnp.ndarray,  # [B, H, W, 2] uv in [0, 1], v already flipped
    texture: jnp.ndarray,  # [B, Ht, Wt, C]
) -> jnp.ndarray:
    """Bilinear texture lookup masked by coverage → [B, H, W, C]."""
    grid = uv_pix * 2.0 - 1.0
    img = grid_sample_bilinear(texture, grid, align_corners=False)
    mask = (raster.face_index >= 0)[..., None]
    return jnp.where(mask, img, 0.0)


def render_texture_packed(
    raster: RasterOut,
    uv_pix: jnp.ndarray,  # [B, H, W, 2] uv in [0, 1], v already flipped
    texture_display: jnp.ndarray,  # [B, Ht, Wt, 3] DISPLAY-space float 0..255
    texture_packed: jnp.ndarray = None,  # [B, Ht, Wt] int32 — already packed
) -> jnp.ndarray:
    """Fast product path: pack the display-space texture to RGB8 int32, then
    pre-assemble each texel's 2×2 bilinear neighborhood (both dense
    vectorized passes over the UV map) so sampling is ONE contiguous-slice
    gather per pixel — 12× fewer gather ops than the f32 path.  Output is
    display-space [0, 255] float, uint8-ready.  Quantization to 8 bits
    happens in DISPLAY space, where 1/255 steps are perceptually uniform —
    the video encoder quantizes identically."""
    from audio2photoreal_tpu.ops.gridsample import (
        grid_sample_bilinear_quad,
        make_quad_texture,
        pack_rgb8,
    )

    if texture_packed is None:
        texture_packed = pack_rgb8(texture_display)
    quad = make_quad_texture(texture_packed)
    grid = uv_pix * 2.0 - 1.0
    img = grid_sample_bilinear_quad(quad, grid, align_corners=False)
    mask = (raster.face_index >= 0)[..., None]
    return jnp.where(mask, img, 0.0)


def render_mesh(
    pix_verts: jnp.ndarray,
    depth: jnp.ndarray,
    faces: jnp.ndarray,
    uv_coords: jnp.ndarray,
    uv_faces: jnp.ndarray,
    texture: jnp.ndarray,
    height: int,
    width: int,
    packed_display: bool = False,
    texture_packed: jnp.ndarray = None,  # [B, Ht, Wt] int32 pre-packed RGB8
) -> Tuple[jnp.ndarray, RasterOut]:
    """Full RenderLayer equivalent (render.py:28-63): returns the RGB render
    masked by pix-to-face and the raw rasterization.

    ``packed_display=True`` treats ``texture`` as display-space [0, 255] and
    uses the packed-RGB8 sampler (see render_texture_packed); that product
    path consumes face_index only as a coverage mask, so the raster skips
    the exact face-id remap."""
    # per-corner UVs baked into the kernel — on TPU it interpolates UV
    # in-VMEM (no per-pixel gather); row ∝ v matches the reference UV-map
    # orientation (see interpolate_uv)
    fuv = uv_coords[uv_faces]  # [F, 3, 2]
    raster = rasterize(
        pix_verts, depth, faces, height, width, face_uv=fuv,
        exact_face_ids=not packed_display,
    )
    if raster.uv is not None:
        uv_pix = raster.uv
    else:
        uv_pix = interpolate_uv(raster, uv_coords, uv_faces)
    if packed_display:
        img = render_texture_packed(raster, uv_pix, texture, texture_packed=texture_packed)
    else:
        img = render_texture(raster, uv_pix, texture)
    return img, raster
