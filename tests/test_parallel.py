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


def test_meshed_renderer_matches_single_device():
    """BodyRenderer with a data mesh shards the frame batch across devices
    (render is frame-parallel, params replicated) and must reproduce the
    single-device frames exactly."""
    import jax
    import numpy as np

    from audio2photoreal_tpu.apps.render_pipeline import BodyRenderer, Camera
    from audio2photoreal_tpu.parallel import MeshSpec, create_mesh
    from audio2photoreal_tpu.render.assets import make_synthetic_assets
    from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

    rcfg = RendererConfig(
        uv_size=64, init_uv_size=16, upscale_size=128, n_embs=32, n_face_embs=256,
        n_pose_enc_channels=8, n_embs_enc_channels=8, n_init_channels=16,
        n_min_channels=4, shadow_size=32, view_unet_ftrs=4, encoder_in_size=64,
        face_tex_size=64, n_face_verts=64, image_height=48, image_width=32,
    )
    assets = make_synthetic_assets(rcfg)
    model = BodyAvatar(rcfg, assets)
    motion0 = np.zeros((1, 104), np.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        motion0, np.zeros((1, 3), np.float32),
        geom=assets.lbs.pose(None, motion0),
        face_embs=np.zeros((1, 256), np.float32),
    )
    cams = {
        "cam0": Camera(
            campos=np.array([0.0, -3.0, 1.0], np.float32),
            K=np.array([[40.0, 0, 16], [0, 40.0, 24], [0, 0, 1]], np.float32),
            Rt=np.array([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], np.float32),
        ),
    }
    rng = np.random.RandomState(0)
    T = 10
    pose = rng.randn(T, 104).astype(np.float32) * 0.05
    face = rng.randn(T, 256).astype(np.float32) * 0.05

    single = BodyRenderer(rcfg, assets, params, cams, frame_batch=8)
    mesh = create_mesh(MeshSpec((-1,), ("data",)))
    sharded = BodyRenderer(rcfg, assets, params, cams, frame_batch=8, mesh=mesh)
    assert sharded.frame_batch % len(jax.devices()) == 0

    f_single = single.render_sequence(pose, face)
    f_sharded = sharded.render_sequence(pose, face)
    assert f_single.shape == f_sharded.shape == (T, 48, 32, 3)
    # uint8 frames: allow ±1 count differences from fused rounding
    diff = np.abs(f_single.astype(np.int32) - f_sharded.astype(np.int32))
    assert diff.max() <= 1


def test_multicam_decode_once_matches_per_cam_renders():
    """render_sequence_multicam (decode ONCE per frame + render_view per rig
    camera — the 2-camera product loop, render_codes.py:97-127, with the
    body encode HOISTED to the constant template embedding,
    BodyAvatar.template_body_embs) must reproduce the per-camera
    render_sequence outputs (full per-frame-encode __call__ path)
    side-by-side: same math, reordered, plus the unpose∘pose float roundtrip;
    ±1 uint8 count."""
    import jax
    import numpy as np

    from audio2photoreal_tpu.apps.render_pipeline import BodyRenderer, Camera
    from audio2photoreal_tpu.render.assets import make_synthetic_assets
    from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

    rcfg = RendererConfig(
        uv_size=64, init_uv_size=16, upscale_size=128, n_embs=32, n_face_embs=256,
        n_pose_enc_channels=8, n_embs_enc_channels=8, n_init_channels=16,
        n_min_channels=4, shadow_size=32, view_unet_ftrs=4, encoder_in_size=64,
        face_tex_size=64, n_face_verts=64, image_height=48, image_width=32,
    )
    assets = make_synthetic_assets(rcfg)
    model = BodyAvatar(rcfg, assets)
    motion0 = np.zeros((1, 104), np.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        motion0, np.zeros((1, 3), np.float32),
        geom=assets.lbs.pose(None, motion0),
        face_embs=np.zeros((1, 256), np.float32),
    )
    cams = {
        "cam0": Camera(
            campos=np.array([0.0, -3.0, 1.0], np.float32),
            K=np.array([[40.0, 0, 16], [0, 40.0, 24], [0, 0, 1]], np.float32),
            Rt=np.array([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], np.float32),
        ),
        "cam1": Camera(
            campos=np.array([0.5, -3.0, 1.0], np.float32),
            K=np.array([[40.0, 0, 16], [0, 40.0, 24], [0, 0, 1]], np.float32),
            Rt=np.array([[1, 0, 0, -0.5], [0, 0, -1, 1], [0, 1, 0, 3]], np.float32),
        ),
    }
    rng = np.random.RandomState(1)
    T = 6
    pose = rng.randn(T, 104).astype(np.float32) * 0.05
    face = rng.randn(T, 256).astype(np.float32) * 0.05

    r = BodyRenderer(rcfg, assets, params, cams, frame_batch=4)
    combined = r.render_sequence_multicam(pose, face)
    assert combined.shape == (T, 48, 2 * 32, 3)
    for ci, name in enumerate(cams):
        one = r.render_sequence(pose, face, camera_name=name)
        half = combined[:, :, ci * 32 : (ci + 1) * 32]
        diff = np.abs(one.astype(np.int32) - half.astype(np.int32))
        assert diff.max() <= 1, f"camera {name} deviates by {diff.max()}"
