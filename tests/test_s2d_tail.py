"""Exactness of the relayout-free s2d decoder tail.

The production ConvDecoder keeps its lane-bound tail (up blocks → seam →
final fused conv) in space-to-depth coordinates end-to-end (s2d_tail=True).
These tests pin that path to the per-stage relayout baseline (s2d_tail=False)
— identical parameters, identical math, different tensor layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.render.layers import (
    depth_to_space,
    resize_bilinear,
    resize_bilinear_s2d,
    space_to_depth,
)


def test_resize_bilinear_s2d_matches_dense():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 12).astype(np.float32))
    for ac in (True, False):
        ref = resize_bilinear(x, (64, 64), align_corners=ac)
        got = depth_to_space(
            resize_bilinear_s2d(space_to_depth(x), (64, 64), align_corners=ac)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_seam_fused_apply_s2d_matches_dense():
    from audio2photoreal_tpu.render.seams import SeamSampler

    rng = np.random.RandomState(1)
    S, M = 32, 40
    seam = SeamSampler(
        impaint_dst=jnp.asarray(rng.choice(S * S, M, replace=False), jnp.int32),
        impaint_src=jnp.asarray(rng.randint(0, S * S, M), jnp.int32),
        resample_uvs=jnp.asarray(rng.rand(M, 2).astype(np.float32) * 2 - 1),
        resample_dst=jnp.asarray(rng.choice(S * S, M, replace=False), jnp.int32),
        resample_weights=jnp.asarray(rng.rand(M).astype(np.float32)),
        uv_size=S,
    )
    x = jnp.asarray(rng.randn(3, S, S, 8).astype(np.float32))
    ref = seam.fused_apply(x, n_resample=2)
    got = depth_to_space(seam.fused_apply_s2d(space_to_depth(x), n_resample=2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_upconv_block_s2d_io_matches():
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 128, 128, 32).astype(np.float32) * 0.3)
    ref_blk = UpConvBlockDeep(32, 256, groups=2)
    p = ref_blk.init(jax.random.PRNGKey(0), x)
    ref = ref_blk.apply(p, x)

    io_blk = UpConvBlockDeep(32, 256, groups=2, s2d_in=True, s2d_out=True)
    got = depth_to_space(io_blk.apply(p, space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

    # mixed edges: dense in, s2d out
    half_blk = UpConvBlockDeep(32, 256, groups=2, s2d_out=True)
    got2 = depth_to_space(half_blk.apply(p, x))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("uv_size,init", [(512, 32)])
def test_conv_decoder_s2d_tail_matches(uv_size, init):
    """Full ConvDecoder with the s2d tail vs the relayout baseline — the
    512/32 geometry exercises the dense→s2d boundary (up2), a chained s2d
    block (up3), the s2d seam, and the s2d final conv."""
    from dataclasses import replace

    from audio2photoreal_tpu.render.assets import make_synthetic_assets
    from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

    cfg = RendererConfig(
        uv_size=uv_size, init_uv_size=init, upscale_size=2 * uv_size,
        n_embs=64, n_face_embs=64, shadow_size=64, encoder_in_size=64,
        face_tex_size=64, n_face_verts=32, image_height=64, image_width=64,
        s2d_tail=True,
    )
    assets = make_synthetic_assets(cfg, mesh_density=2)
    rng = np.random.RandomState(3)
    B = 2
    motion = jnp.asarray(rng.randn(B, 104).astype(np.float32) * 0.1)
    embs = jnp.asarray(rng.randn(B, cfg.n_embs).astype(np.float32) * 0.3)
    fembs = jnp.asarray(rng.randn(B, cfg.n_face_embs).astype(np.float32) * 0.3)

    model = BodyAvatar(cfg, assets)
    params = model.init(
        {"params": jax.random.PRNGKey(1)}, motion, embs, fembs,
        method=lambda m, mo, e, f: m.decoder(mo, e, f),
    )
    out = model.apply(
        params, motion, embs, fembs, method=lambda m, mo, e, f: m.decoder(mo, e, f)
    )

    cfg0 = replace(cfg, s2d_tail=False)
    model0 = BodyAvatar(cfg0, assets)
    out0 = model0.apply(
        params, motion, embs, fembs, method=lambda m, mo, e, f: m.decoder(mo, e, f)
    )
    for k in ("tex_mean_rec", "geom_uv_delta_rec", "geom_delta_rec"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(out0[k]), atol=5e-5,
            err_msg=f"s2d tail diverged on {k}",
        )
