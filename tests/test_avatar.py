"""Integration test: full BodyAvatar forward on synthetic capsule-person assets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig


@pytest.fixture(scope="module")
def avatar():
    cfg = RendererConfig(
        uv_size=64,
        init_uv_size=16,
        upscale_size=128,
        n_embs=32,
        n_face_embs=32,
        n_pose_enc_channels=8,
        n_embs_enc_channels=8,
        n_init_channels=16,
        n_min_channels=4,
        shadow_size=32,
        view_unet_ftrs=4,
        encoder_in_size=64,
        face_tex_size=64,
        n_face_verts=64,
        image_height=48,
        image_width=32,
    )
    assets = make_synthetic_assets(cfg)
    model = BodyAvatar(cfg, assets)
    B = 2
    motion = jnp.asarray(np.random.RandomState(0).randn(B, 104).astype(np.float32) * 0.1)
    campos = jnp.asarray(np.array([[0.0, -3.0, 1.0]] * B, np.float32))
    V = assets.lbs.template_verts.shape[1]
    geom = jnp.broadcast_to(assets.lbs.template_verts, (B, V, 3))
    face_embs = jnp.asarray(np.random.RandomState(1).randn(B, 32).astype(np.float32))
    K = jnp.asarray(
        np.array([[[40.0, 0, 16], [0, 40.0, 24], [0, 0, 1]]] * B, np.float32)
    )
    # camera at (0,-3,1) looking +y: x_cam = x, y_cam = -z + 1, z_cam = y + 3
    Rt = jnp.asarray(
        np.array(
            [[[1.0, 0, 0, 0], [0, 0, -1, 1.0], [0, 1, 0, 3.0]]] * B, np.float32
        )
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        motion, campos, geom=geom, face_embs=face_embs, K=K, Rt=Rt,
    )
    return model, params, dict(motion=motion, campos=campos, geom=geom, face_embs=face_embs, K=K, Rt=Rt)


def test_avatar_forward_shapes(avatar):
    model, params, b = avatar
    preds = model.apply(
        params, b["motion"], b["campos"], geom=b["geom"], face_embs=b["face_embs"],
        K=b["K"], Rt=b["Rt"],
    )
    B = 2
    assert preds["geom"].shape[0] == B and preds["geom"].shape[2] == 3
    assert preds["tex_rec"].shape == (B, 128, 128, 3)
    assert preds["rgb"].shape == (B, 48, 32, 3)
    assert preds["embs"].shape == (B, 32)
    assert preds["shadow_map"].shape[1:3] == (128, 128)
    for k in ("geom", "tex_rec", "rgb"):
        assert bool(jnp.all(jnp.isfinite(preds[k]))), f"non-finite {k}"


def test_avatar_renders_nonempty_coverage(avatar):
    model, params, b = avatar
    preds = model.apply(
        params, b["motion"], b["campos"], geom=b["geom"], face_embs=b["face_embs"],
        K=b["K"], Rt=b["Rt"],
    )
    coverage = float((preds["pix_to_face"] >= 0).mean())
    assert coverage > 0.05, f"avatar not visible, coverage={coverage}"


def test_avatar_decode_only_path(avatar):
    """Driving path used at inference: given embeddings, skip the encoder."""
    model, params, b = avatar
    embs = jnp.zeros((2, 32))
    face_embs_body = jnp.zeros((2, 32))
    preds = model.apply(
        params, b["motion"], b["campos"],
        embs=embs, face_embs_body=face_embs_body, encode=False, render=False,
    )
    assert preds["tex_rec"].shape == (2, 128, 128, 3)
    assert "embs_mu" not in preds


def test_avatar_pose_changes_geometry(avatar):
    model, params, b = avatar
    p0 = model.apply(params, b["motion"], b["campos"], geom=b["geom"],
                     face_embs=b["face_embs"], encode=True, render=False)
    m2 = b["motion"].at[:, 6].add(0.8)  # bend joint 1
    p1 = model.apply(params, m2, b["campos"], geom=b["geom"],
                     face_embs=b["face_embs"], encode=True, render=False)
    delta = float(jnp.abs(p0["geom"] - p1["geom"]).max())
    assert delta > 0.01


def test_bf16_render_close_to_f32(avatar):
    """bf16 compute policy deviates <2% of the dynamic range from f32."""
    import jax.numpy as jnp
    from audio2photoreal_tpu.render.layers import render_compute_dtype

    model, params, b = avatar
    f32 = model.apply(params, b["motion"], b["campos"], geom=b["geom"],
                      face_embs=b["face_embs"], render=False)
    with render_compute_dtype(jnp.bfloat16):
        bf16 = model.apply(params, b["motion"], b["campos"], geom=b["geom"],
                           face_embs=b["face_embs"], render=False)
    a = np.asarray(f32["tex_rec"], np.float32)
    c = np.asarray(bf16["tex_rec"], np.float32)
    rng = max(a.max() - a.min(), 1e-6)
    assert np.abs(a - c).max() / rng < 0.02


def test_decode_render_view_split_matches_call(avatar):
    """The multicam product path (decode_frame once + render_view per rig
    camera, mesh_vae.py) must reproduce the monolithic __call__ EXACTLY on
    both the linear and the display-packed render paths — the split only
    reorders view-independent work (the shadow seam resample moves ahead of
    the texture ops), it must not change a single value."""
    model, params, b = avatar
    view_keys = ("geom", "tex_mean_rec", "shadow_seamed")
    decoded = model.apply(
        params, b["motion"], geom=b["geom"], face_embs=b["face_embs"],
        method=BodyAvatar.decode_frame,
    )
    for disp in (False, True):
        full = model.apply(
            params, b["motion"], b["campos"], geom=b["geom"],
            face_embs=b["face_embs"], K=b["K"], Rt=b["Rt"],
            render_display=disp,
        )
        view = model.apply(
            params, {k: decoded[k] for k in view_keys},
            b["campos"], b["K"], b["Rt"], render_display=disp,
            method=BodyAvatar.render_view,
        )
        for k in ("rgb", "tex_rec", "depth"):
            np.testing.assert_array_equal(
                np.asarray(view[k]), np.asarray(full[k]),
                err_msg=f"{k}, render_display={disp}",
            )
    np.testing.assert_array_equal(np.asarray(decoded["geom"]),
                                  np.asarray(full["geom"]))
