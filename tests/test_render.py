"""Renderer math tests: quaternions, LBS FK, UV geometry, rasterizer, color."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.render import quaternion as quat
from audio2photoreal_tpu.render.color import linear2display_batch, linear2srgb
from audio2photoreal_tpu.render.geometry import (
    GeometryModule,
    compute_view_cos,
    face_normals,
    project_points,
    rasterize_uv_maps,
    vert_normals,
)
from audio2photoreal_tpu.render.lbs import (
    LBSModule,
    Skeleton,
    skinning,
    solve_skeleton_state,
    states_to_matrix,
    unskinning,
)
from audio2photoreal_tpu.render.rasterizer import rasterize, render_mesh
from audio2photoreal_tpu.render.seams import SeamSampler


# ---------------- quaternion ----------------


def test_quat_mul_identity_and_inverse():
    rng = np.random.RandomState(0)
    q = quat.normalize(jnp.asarray(rng.randn(5, 4), jnp.float32))
    ident = jnp.array([0.0, 0, 0, 1.0])
    np.testing.assert_allclose(np.asarray(quat.mul(q, jnp.broadcast_to(ident, q.shape))), np.asarray(q), atol=1e-6)
    qq = quat.mul(q, quat.invert(q))
    np.testing.assert_allclose(np.asarray(qq[..., 3]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qq[..., :3]), 0.0, atol=1e-5)


def test_quat_rotate_matches_matrix():
    rng = np.random.RandomState(1)
    q = quat.normalize(jnp.asarray(rng.randn(4, 4), jnp.float32))
    v = jnp.asarray(rng.randn(4, 3), jnp.float32)
    r1 = quat.rotate(q, v)
    m = quat.to_matrix(q)
    r2 = jnp.einsum("bij,bj->bi", m, v)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_quat_from_xyz_single_axis():
    # 90° about z: x-axis → y-axis
    e = jnp.array([[0.0, 0.0, np.pi / 2]])
    q = quat.from_xyz(e)
    v = jnp.array([[1.0, 0.0, 0.0]])
    r = quat.rotate(q, v)
    np.testing.assert_allclose(np.asarray(r), [[0.0, 1.0, 0.0]], atol=1e-6)


# ---------------- LBS ----------------


def _toy_skeleton():
    # 3-joint chain along x
    parents = [-1, 0, 1]
    offsets = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32)
    rots = np.tile(np.array([0, 0, 0, 1], np.float32), (3, 1))
    return Skeleton.create(parents, offsets, rots)


def test_fk_zero_pose_chain_positions():
    skel = _toy_skeleton()
    params = jnp.zeros((1, 21))
    state = solve_skeleton_state(skel, params)
    # joints at x = 0, 1, 2
    np.testing.assert_allclose(np.asarray(state[0, :, 0]), [0, 1, 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(state[0, :, 7]), 1.0, atol=1e-6)


def test_fk_rotation_propagates():
    skel = _toy_skeleton()
    params = np.zeros((1, 21), np.float32)
    params[0, 5] = np.pi / 2  # root rz: chain rotates into +y
    state = solve_skeleton_state(skel, jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(state[0, 1, 0:3]), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(state[0, 2, 0:3]), [0, 2, 0], atol=1e-5)


def test_fk_matches_sequential_reference():
    """Level-parallel FK == naive per-joint recursion on a random tree."""
    rng = np.random.RandomState(2)
    J = 7
    parents = [-1, 0, 0, 1, 2, 3, 3]
    offsets = rng.randn(J, 3).astype(np.float32)
    pre = quat.normalize(jnp.asarray(rng.randn(J, 4), jnp.float32))
    skel = Skeleton.create(parents, offsets, np.asarray(pre))
    params = jnp.asarray(rng.randn(2, 7 * J).astype(np.float32) * 0.3)
    state = solve_skeleton_state(skel, params)

    # naive reference
    jp = np.asarray(params).reshape(2, J, 7)
    lt = jp[:, :, 0:3] + offsets[None]
    lr = np.asarray(quat.mul(jnp.asarray(pre)[None], quat.from_xyz(jnp.asarray(jp[:, :, 3:6]))))
    ls = 2.0 ** jp[:, :, 6:7]
    gt = np.zeros((2, J, 3))
    gr = np.zeros((2, J, 4))
    gs = np.zeros((2, J, 1))
    for j in range(J):
        p = parents[j]
        if p < 0:
            gt[:, j], gr[:, j], gs[:, j] = lt[:, j], lr[:, j], ls[:, j]
        else:
            gr[:, j] = np.asarray(quat.mul(jnp.asarray(gr[:, p]), jnp.asarray(lr[:, j])))
            gt[:, j] = np.asarray(
                quat.rotate(jnp.asarray(gr[:, p]), jnp.asarray(lt[:, j] * gs[:, p]))
            ) + gt[:, p]
            gs[:, j] = gs[:, p] * ls[:, j]
    np.testing.assert_allclose(np.asarray(state[..., 0:3]), gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state[..., 3:7]), gr, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state[..., 7:8]), gs, atol=1e-4)


def _toy_lbs():
    skel = _toy_skeleton()
    transform = np.zeros((21, 6), np.float32)
    # map 6 pose params onto root translation + joint-1 rz
    transform[0, 0] = 1.0  # root tx
    transform[1, 1] = 1.0
    transform[2, 2] = 1.0
    transform[12, 3] = 1.0  # joint1 rz
    offsets = np.zeros(21, np.float32)
    V = 4
    verts = np.array([[0.5, 0, 0], [1.5, 0, 0], [2.0, 0.5, 0], [0.0, -0.5, 0]], np.float32)
    skin_idx = np.array([[0, 0], [1, 0], [2, 1], [0, 0]], np.int64)
    skin_w = np.array([[1.0, 0], [1.0, 0], [0.7, 0.3], [1.0, 0]], np.float32)
    return LBSModule.create(skel, transform, offsets, skin_idx, skin_w, verts)


def test_lbs_pose_unpose_roundtrip():
    """pose/unpose speak DELTAS from the template (reference lbs.py:809-821):
    unpose(pose(delta)) == delta, and the posed template unposes to 0."""
    lbs = _toy_lbs()
    pose = jnp.asarray(np.random.RandomState(3).randn(2, 6).astype(np.float32) * 0.3)
    posed = lbs.template_pose(pose)
    delta0 = lbs.unpose(posed, pose)
    np.testing.assert_allclose(np.asarray(delta0), np.zeros_like(delta0), atol=1e-4)
    delta = jnp.asarray(np.random.RandomState(4).randn(*posed.shape).astype(np.float32) * 0.1)
    roundtrip = lbs.unpose(lbs.pose(delta, pose), pose)
    np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(delta), atol=1e-4)


def test_lbs_translation_moves_rigid_verts():
    lbs = _toy_lbs()
    pose = jnp.zeros((1, 6)).at[0, 0].set(2.0)  # root tx += 2
    posed = lbs.template_pose(pose)
    np.testing.assert_allclose(
        np.asarray(posed[0, 0]), np.asarray(lbs.template_verts[0, 0]) + np.array([2, 0, 0]), atol=1e-5
    )


# ---------------- UV geometry ----------------


def _quad_geometry(uv_size=16):
    # two triangles covering the unit UV square
    verts_faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    uv_coords = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    uv_faces = verts_faces.copy()
    return GeometryModule.create(verts_faces, uv_coords, uv_faces, uv_size, impaint=True)


def test_uv_rasterization_covers_square():
    fi, ba = rasterize_uv_maps(
        np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        np.array([[0, 1, 2], [0, 2, 3]]),
        8,
    )
    assert (fi >= 0).mean() > 0.9  # near-full coverage
    s = ba.sum(-1)
    np.testing.assert_allclose(s[fi >= 0], 1.0, atol=1e-5)


def test_to_uv_interpolates_linearly():
    geom = _quad_geometry()
    # vertex values = their uv x coordinate → UV image should be a ramp
    vals = jnp.array([[[0.0], [1.0], [1.0], [0.0]]])
    img = geom.to_uv(vals)  # [1, H, W, 1]
    W = img.shape[2]
    xs = (np.arange(W) + 0.5) / W
    row = np.asarray(img[0, W // 2, :, 0])
    np.testing.assert_allclose(row, xs, atol=0.1)


def test_from_uv_inverts_to_uv_for_smooth_fields():
    geom = _quad_geometry(uv_size=32)
    vals = jnp.asarray(np.random.RandomState(4).rand(1, 4, 2), jnp.float32)
    img = geom.to_uv(vals)
    back = geom.from_uv(img)
    np.testing.assert_allclose(np.asarray(back), np.asarray(vals), atol=0.15)


def test_normals_flat_quad():
    verts = jnp.array([[[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]])
    faces = jnp.array([[0, 1, 2], [0, 2, 3]])
    fn = face_normals(verts, faces)
    np.testing.assert_allclose(np.asarray(fn[0, :, 2]), 1.0, atol=1e-6)
    vn = vert_normals(verts, faces)
    np.testing.assert_allclose(np.asarray(vn[0, :, 2]), 1.0, atol=1e-6)
    campos = jnp.array([[0.5, 0.5, 5.0]])
    cos = compute_view_cos(verts, faces, campos)
    # reference semantics (geom.py:347-351): dot(normal, verts - campos) —
    # a camera FACING the surface sees NEGATIVE view-cos
    assert np.all(np.asarray(cos) < -0.9)


# ---------------- rasterizer ----------------


def test_project_points_pinhole():
    verts = jnp.array([[[0.0, 0.0, 2.0]]])
    K = jnp.array([[[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]])
    Rt = jnp.concatenate([jnp.eye(3)[None], jnp.zeros((1, 3, 1))], axis=-1)
    pix, z = project_points(verts, K, Rt)
    np.testing.assert_allclose(np.asarray(pix[0, 0]), [32, 32], atol=1e-5)
    assert float(z[0, 0]) == pytest.approx(2.0)


def test_rasterize_single_triangle_coverage_and_depth():
    pix = jnp.array([[[2.0, 2.0], [20.0, 2.0], [2.0, 20.0]]])
    depth = jnp.array([[1.0, 1.0, 1.0]])
    faces = jnp.array([[0, 1, 2]])
    out = rasterize(pix, depth, faces, 24, 24)
    assert int(out.face_index[0, 3, 3]) == 0  # inside
    assert int(out.face_index[0, 23, 23]) == -1  # outside
    assert float(out.depth[0, 3, 3]) == pytest.approx(1.0, abs=1e-5)


def test_rasterize_zbuffer_nearest_wins():
    # two stacked triangles, the second closer
    pix = jnp.array(
        [[[0.0, 0.0], [30.0, 0.0], [0.0, 30.0], [0.0, 0.0], [30.0, 0.0], [0.0, 30.0]]]
    )
    depth = jnp.array([[5.0, 5.0, 5.0, 2.0, 2.0, 2.0]])
    faces = jnp.array([[0, 1, 2], [3, 4, 5]])
    out = rasterize(pix, depth, faces, 16, 16)
    assert int(out.face_index[0, 2, 2]) == 1
    assert float(out.depth[0, 2, 2]) == pytest.approx(2.0, abs=1e-4)


def test_render_mesh_textures_inside_only():
    pix = jnp.array([[[0.0, 0.0], [15.0, 0.0], [0.0, 15.0]]])
    depth = jnp.array([[1.0, 1.0, 1.0]])
    faces = jnp.array([[0, 1, 2]])
    uv_coords = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    tex = jnp.ones((1, 8, 8, 3)) * 0.5
    img, raster = render_mesh(pix, depth, faces, uv_coords, faces, tex, 16, 16)
    assert float(img[0, 1, 1, 0]) == pytest.approx(0.5, abs=1e-5)
    assert float(img[0, 15, 15, 0]) == 0.0


def test_packed_rgb8_grid_sample_matches_f32():
    """The packed-RGB8 sampler (single-channel int32 gathers) must equal the
    f32 bilinear path on an already-quantized texture."""
    from audio2photoreal_tpu.ops.gridsample import (
        grid_sample_bilinear,
        grid_sample_bilinear_packed,
        pack_rgb8,
        unpack_rgb8,
    )

    rng = np.random.RandomState(0)
    tex = np.round(rng.rand(1, 16, 16, 3) * 255).astype(np.float32)
    grid = jnp.asarray(rng.rand(1, 9, 7, 2).astype(np.float32) * 1.8 - 0.9)
    ref = grid_sample_bilinear(jnp.asarray(tex), grid, align_corners=False,
                               padding_zero=False)
    packed = pack_rgb8(jnp.asarray(tex))
    np.testing.assert_array_equal(np.asarray(unpack_rgb8(packed)), tex)
    out = grid_sample_bilinear_packed(packed, grid, align_corners=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)

    # quad variant (one gather per pixel) must agree too, incl. the borders
    from audio2photoreal_tpu.ops.gridsample import (
        grid_sample_bilinear_quad,
        make_quad_texture,
    )

    quad = make_quad_texture(packed)
    out_q = grid_sample_bilinear_quad(quad, grid, align_corners=False)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref), atol=1e-3)
    edge_grid = jnp.asarray(
        np.array([[[[-1.2, -1.2]], [[1.2, 1.2]], [[-1.2, 0.9]], [[0.99, -0.99]]]],
                 np.float32)
    )
    ref_e = grid_sample_bilinear(jnp.asarray(tex), edge_grid, align_corners=False,
                                 padding_zero=False)
    out_e = grid_sample_bilinear_quad(quad, edge_grid, align_corners=False)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(ref_e), atol=1e-3)


def test_render_mesh_packed_display_close_to_linear_path():
    """Display-packed rendering == display(linear rendering) up to the 8-bit
    texture quantization (≤1 display-space step plus bilinear mixing)."""
    from audio2photoreal_tpu.render.color import linear2display_batch
    from audio2photoreal_tpu.render.rasterizer import render_mesh

    rng = np.random.RandomState(1)
    pix = jnp.asarray(np.array([[[2.0, 2.0], [13.0, 2.0], [2.0, 13.0]]], np.float32))
    depth = jnp.ones((1, 3))
    faces = jnp.asarray(np.array([[0, 1, 2]]))
    uvc = jnp.asarray(np.array([[0.1, 0.1], [0.9, 0.1], [0.1, 0.9]], np.float32))
    tex_lin = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 200)
    img_lin, _ = render_mesh(pix, depth, faces, uvc, faces, tex_lin, 16, 16)
    ref = np.asarray(linear2display_batch(img_lin))
    tex_disp = linear2display_batch(tex_lin)
    img_packed, raster = render_mesh(
        pix, depth, faces, uvc, faces, tex_disp, 16, 16, packed_display=True
    )
    covered = np.asarray(raster.face_index) >= 0
    diff = np.abs(np.asarray(img_packed) - ref)[covered]
    # display(lerp(linear)) vs lerp(display(quantized)) differ by gamma
    # curvature over the lerp; texels here are random so allow a loose bound
    # while requiring most pixels close
    assert np.median(diff) < 8.0, float(np.median(diff))


# ---------------- seams / color ----------------


def test_seam_sampler_impaint_copies():
    H = 4
    tex = jnp.arange(H * H, dtype=jnp.float32).reshape(1, H, H, 1)
    s = SeamSampler(
        impaint_dst=jnp.array([0], jnp.int32),
        impaint_src=jnp.array([5], jnp.int32),
        resample_uvs=jnp.zeros((0, 2)),
        resample_dst=jnp.zeros((0,), jnp.int32),
        resample_weights=jnp.zeros((0,)),
        uv_size=H,
    )
    out = s.impaint(tex)
    assert float(out[0, 0, 0, 0]) == 5.0


def test_seam_fused_matches_sequential():
    """fused_apply (one composed gather/scatter) must equal the reference's
    sequential impaint → resample^n pipeline (seams.py:16-52)."""
    rng = np.random.RandomState(7)
    W = 32
    HW = W * W
    n = 40
    imp = rng.choice(HW, size=2 * n, replace=False)
    s = SeamSampler(
        impaint_dst=jnp.asarray(imp[:n], jnp.int32),
        impaint_src=jnp.asarray(imp[n:], jnp.int32),
        resample_uvs=jnp.asarray(rng.rand(n, 2) * 2.0 - 1.0, jnp.float32),
        resample_dst=jnp.asarray(rng.choice(HW, size=n, replace=False), jnp.int32),
        resample_weights=jnp.asarray(rng.rand(n).astype(np.float32)),
        uv_size=W,
    )
    # B·C=6 exercises the texel-grouped (g>1) path; B·C=128 the g=1 path
    for B, C in ((2, 3), (4, 32)):
        tex = jnp.asarray(rng.randn(B, W, W, C).astype(np.float32))
        for n_res in (1, 2):
            seq = tex
            seq = s.impaint(seq)
            for _ in range(n_res):
                seq = s.resample(seq)
            fused = s.fused_apply(tex, n_resample=n_res)
            np.testing.assert_allclose(
                np.asarray(fused), np.asarray(seq), rtol=1e-5, atol=1e-5
            )


def test_seam_fused_packed_close_to_exact():
    """Display-packed seam (product path) must match the exact float
    pipeline to within a couple of 8-bit steps (blend runs after the
    packing quantisation, so ±rounding per tap)."""
    from audio2photoreal_tpu.ops.gridsample import pack_rgb8, unpack_rgb8

    rng = np.random.RandomState(3)
    W = 32
    HW = W * W
    n = 40
    imp = rng.choice(HW, size=2 * n, replace=False)
    s = SeamSampler(
        impaint_dst=jnp.asarray(imp[:n], jnp.int32),
        impaint_src=jnp.asarray(imp[n:], jnp.int32),
        resample_uvs=jnp.asarray(rng.rand(n, 2) * 2.0 - 1.0, jnp.float32),
        resample_dst=jnp.asarray(rng.choice(HW, size=n, replace=False), jnp.int32),
        resample_weights=jnp.asarray(rng.rand(n).astype(np.float32)),
        uv_size=W,
    )
    disp = jnp.asarray(rng.rand(2, W, W, 3).astype(np.float32) * 255.0)
    exact = np.asarray(unpack_rgb8(pack_rgb8(s.fused_apply(disp, 2))))
    packed = np.asarray(unpack_rgb8(s.fused_apply_packed(pack_rgb8(disp), 2)))
    assert np.abs(exact - packed).max() <= 2.0


def test_seam_fused_empty_is_identity():
    from audio2photoreal_tpu.render.assets import empty_seam_sampler

    s = empty_seam_sampler(8)
    tex = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 2).astype(np.float32))
    assert s.fused_apply(tex, 2) is tex
    assert s.impaint(tex) is tex
    assert s.resample(tex) is tex


def test_linear2srgb_anchors():
    assert float(linear2srgb(jnp.array(0.0))) == pytest.approx(0.0, abs=1e-6)
    assert float(linear2srgb(jnp.array(1.0))) == pytest.approx(1.0, abs=1e-3)
    # below the linear knee
    assert float(linear2srgb(jnp.array(0.001))) == pytest.approx(0.01292, abs=1e-4)


def test_linear2display_batch_range():
    img = jnp.asarray(np.random.RandomState(5).rand(1, 4, 4, 3) * 255)
    out = linear2display_batch(img)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0


def test_finalize_display_packed_matches_composed_ops():
    """One-pass Pallas texture finalisation (ops/pallas/display_pack) vs the
    composed XLA ops it replaces: ×std+mean → ×shadow → display transform →
    RGB8 pack, all in f32.  On CPU the kernel runs in interpreter mode (the
    same jnp ops) — bytes must match exactly; on TPU the measured deviation
    is ≤1 count for ≥99.99% of texels with a ~3e-6 tail at ±2-3 in
    near-black (Mosaic pow ULP), asserted loosely enough to hold on both."""
    import numpy as np

    from audio2photoreal_tpu.ops.gridsample import pack_rgb8
    from audio2photoreal_tpu.ops.pallas.display_pack import finalize_display_packed
    from audio2photoreal_tpu.render.color import linear2display_batch

    B, H, W = 2, 256, 256
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.3)
    sh = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    mean = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 200.0)
    std = 35.0

    t = tex * std + mean[None]
    t = t * sh
    ref = np.asarray(pack_rgb8(linear2display_batch(t)))
    got = np.asarray(finalize_display_packed(tex, sh, mean, std, block_h=64))

    rr = np.stack([(ref >> s) & 0xFF for s in (0, 8, 16)], -1).astype(np.int32)
    kk = np.stack([(got >> s) & 0xFF for s in (0, 8, 16)], -1).astype(np.int32)
    d = np.abs(rr - kk)
    assert (d <= 1).mean() > 0.9999, f"frac>1 = {(d > 1).mean()}"
    assert d.max() <= 3, f"max channel diff {d.max()}"
