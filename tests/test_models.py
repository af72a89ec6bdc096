"""Shape/semantics tests for the model family (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.core.config import DenoiserConfig, GuideConfig, VQConfig
from audio2photoreal_tpu.models.audio_encoder import VQ_WAV2VEC_SPEC, feature_frames
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.models.guide import GuideTransformer, nucleus_sample
from audio2photoreal_tpu.models.vqvae import TemporalVertexCodec, VQState
from audio2photoreal_tpu.ops.rotary import apply_rotary, make_rotary_table


def tiny_pose_cfg(T=12):
    return DenoiserConfig(
        data_format="pose",
        nfeats=8,
        latent_dim=16,
        ff_size=32,
        num_layers=2,
        num_heads=2,
        max_seq_length=T,
        keyframe_step=6,
    )


def tiny_face_cfg(T=12):
    return DenoiserConfig(
        data_format="face",
        nfeats=6,
        latent_dim=16,
        ff_size=32,
        num_layers=2,
        num_heads=2,
        max_seq_length=T,
        cond_encoder_layers=1,
    )


def test_wav2vec_feature_frames_matches_reference_1998():
    # 600 frames × 1600 samples @48k = 320000 samples @16k → 1998 tokens
    # (reference hardcodes emb_len=1998, model/diffusion.py:136-137)
    assert feature_frames(320_000) == 1998
    # 240 frames → 128000 samples → 798 (train_guide.py:316)
    assert feature_frames(128_000) == 798


def test_rotary_orthogonality():
    """Rotation preserves norms and relative-position dot products."""
    table = make_rotary_table(8, 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8))
    r = apply_rotary(x, table)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(r), axis=-1),
        rtol=1e-5,
    )
    # relative property: <R(p)q, R(p+k)v> independent of p
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 8))
    def dot_at(p, k):
        rq = apply_rotary(q, table, offset=p)
        rv = apply_rotary(v, table, offset=p + k)
        return float(jnp.sum(rq * rv))
    assert dot_at(0, 3) == pytest.approx(dot_at(7, 3), rel=1e-4)


def _pose_batch(B=2, T=12, S=None):
    S = S or T * 1600
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 8))
    t = jnp.array([3, 7][:B])
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, S, 2)) * 0.1
    kf = jax.random.normal(jax.random.PRNGKey(2), (B, 2, 104))
    kv = jnp.ones((B, 2))
    return x, t, audio, kf, kv


def test_film_denoiser_pose_shapes_and_cfg_null():
    cfg = tiny_pose_cfg()
    model = FiLMDenoiser(cfg)
    x, t, audio, kf, kv = _pose_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        x, t, audio, kf, kv,
    )
    out = model.apply(params, x, t, audio, kf, kv)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))

    # encode/denoise split agrees with the fused __call__
    cond = model.apply(params, audio, kf, kv, method=FiLMDenoiser.encode_conditioning)
    keep = jnp.ones((x.shape[0],), bool)
    out2 = model.apply(params, x, t, cond, keep, method=FiLMDenoiser.denoise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    # keep=False must change the output (null conditioning path)
    out3 = model.apply(
        params, x, t, cond, jnp.zeros((x.shape[0],), bool), method=FiLMDenoiser.denoise
    )
    assert not np.allclose(np.asarray(out2), np.asarray(out3))


def test_cfg_per_sample_scale():
    """cfg_model_fn accepts a per-sample scale tensor, broadcast
    view(-1, 1, 1) like the reference (cfg_sampler.py:30-33)."""
    from audio2photoreal_tpu.models.cfg import cfg_model_fn

    cfg = tiny_pose_cfg()
    model = FiLMDenoiser(cfg)
    x, t, audio, kf, kv = _pose_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        x, t, audio, kf, kv,
    )
    cond = model.apply(params, audio, kf, kv, method=FiLMDenoiser.encode_conditioning)

    def apply_fn(p, xx, tt, cc, keep):
        return model.apply(p, xx, tt, cc, keep, method=FiLMDenoiser.denoise)

    B = x.shape[0]
    scales = jnp.asarray(np.linspace(1.5, 3.0, B).astype(np.float32))
    out_vec = cfg_model_fn(apply_fn, params, cond, scales)(x, t)
    # row b with per-sample scale s_b must equal the scalar-scale output
    for b in (0, B - 1):
        out_scalar = cfg_model_fn(apply_fn, params, cond, float(scales[b]))(x, t)
        np.testing.assert_allclose(
            np.asarray(out_vec[b]), np.asarray(out_scalar[b]), atol=1e-5
        )


def test_film_denoiser_face_shapes():
    cfg = tiny_face_cfg()
    model = FiLMDenoiser(cfg)
    B, T = 1, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 6))
    t = jnp.array([5])
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T * 1600, 2)) * 0.1
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, audio)
    out = model.apply(params, x, t, audio)
    assert out.shape == (B, T, 6)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_guide_forward_and_generate():
    cfg = GuideConfig(
        tokens=16, latent_dim=16, ff_size=32, num_layers=2, num_heads=2, vq_depth=2
    )
    model = GuideTransformer(cfg)
    B, S = 2, 30 * 1600  # 1 s
    audio = jax.random.normal(jax.random.PRNGKey(0), (B, S, 2)) * 0.1
    tokens = jnp.zeros((B, 5), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(1), "cond_drop": jax.random.PRNGKey(2)},
        tokens, audio,
    )
    logits = model.apply(params, tokens, audio)
    assert logits.shape == (B, 5, 16)

    gen = model.apply(
        params, audio, 4, jax.random.PRNGKey(3), method=GuideTransformer.generate
    )
    assert gen.shape == (B, 4)
    assert bool(jnp.all((gen >= 0) & (gen < 16)))


def test_guide_causality():
    """Changing a later token must not change earlier logits."""
    cfg = GuideConfig(tokens=16, latent_dim=16, ff_size=32, num_layers=1, num_heads=2)
    model = GuideTransformer(cfg)
    B, S = 1, 30 * 1600
    audio = jnp.zeros((B, S, 2))
    t1 = jnp.array([[1, 2, 3, 4]], jnp.int32)
    t2 = jnp.array([[1, 2, 9, 9]], jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, t1, audio)
    l1 = model.apply(params, t1, audio)
    l2 = model.apply(params, t2, audio)
    np.testing.assert_allclose(np.asarray(l1[:, :2]), np.asarray(l2[:, :2]), atol=1e-5)


def test_nucleus_sample_restricts_to_top_p():
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    samples = [
        int(nucleus_sample(jax.random.PRNGKey(i), logits, top_p=0.5)[0]) for i in range(20)
    ]
    # top_p=0.5: shifted-cumsum rule keeps only token 0
    assert set(samples) == {0}
    samples = [
        int(nucleus_sample(jax.random.PRNGKey(i), logits, top_p=0.81)[0]) for i in range(50)
    ]
    assert set(samples) <= {0, 1, 2}


def test_vqvae_roundtrip_and_training_state():
    cfg = VQConfig(nfeats=10, emb_width=8, code_dim=12, depth=2, kmeans_iters=3)
    model = TemporalVertexCodec(cfg)
    B, T = 4, 6
    motion = jax.random.normal(jax.random.PRNGKey(0), (B, T, 10))
    vq = VQState.create(jax.random.PRNGKey(1), cfg)
    params = model.init(jax.random.PRNGKey(2), motion, vq)

    # training step initializes codebooks via k-means and returns new state
    recon, commit, ppl, codes, vq2 = model.apply(
        params, motion, vq, train=True, key=jax.random.PRNGKey(3)
    )
    assert recon.shape == motion.shape
    assert bool(vq2.inited)
    assert codes.shape == (B, T, 2)
    assert float(commit) >= 0
    assert bool(jnp.all(jnp.isfinite(recon)))

    # encode/decode consistency: decode(encode(x)) == forward quantized recon
    enc = model.apply(params, motion, vq2, method=TemporalVertexCodec.encode)
    dec = model.apply(params, enc, vq2, method=TemporalVertexCodec.decode)
    recon2, *_ = model.apply(params, motion, vq2)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(recon2), atol=1e-4)


def test_vqvae_ema_moves_toward_data():
    cfg = VQConfig(nfeats=4, emb_width=4, code_dim=4, depth=1, kmeans_iters=2)
    model = TemporalVertexCodec(cfg)
    motion = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4))
    vq = VQState.create(jax.random.PRNGKey(1), cfg)
    params = model.init(jax.random.PRNGKey(2), motion, vq)
    _, _, _, _, vq1 = model.apply(params, motion, vq, train=True, key=jax.random.PRNGKey(3))
    _, _, _, _, vq2 = model.apply(params, motion, vq1, train=True, key=jax.random.PRNGKey(4))
    # cluster sizes updated by EMA
    assert not np.allclose(np.asarray(vq1.cluster_size), np.asarray(vq2.cluster_size))


def test_cached_cfg_model_fn_matches_uncached():
    """cfg_model_fn_cached hoists the step-invariant conditioning work (memory
    rows, their fused cross-K/V, pooled FiLM vector, pose tokens) out of the
    sampling scan; per step only the two t-token rows are projected.  Must
    equal the uncached cfg_model_fn to float tolerance on both model
    families and both guidance modes."""
    from audio2photoreal_tpu.models.cfg import cfg_model_fn, cfg_model_fn_cached

    for fmt, nfeats in (("pose", 16), ("face", 12)):
        cfg = DenoiserConfig(
            data_format=fmt, nfeats=nfeats, latent_dim=32, ff_size=48,
            num_layers=2, num_heads=2, max_seq_length=24, keyframe_step=6,
            dropout=0.0,
        )
        model = FiLMDenoiser(cfg)
        B, T = 2, 24
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, nfeats))
        t = jnp.asarray([3, 7], jnp.int32)
        audio = jax.random.normal(jax.random.PRNGKey(1), (B, T * 1600, 2)) * 0.1
        init_args = [x, jnp.zeros((B,), jnp.int32), audio]
        enc_args = [audio]
        if fmt == "pose":
            kf = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 104))
            kv = jnp.ones((B, 4))
            init_args += [kf, kv]
            enc_args += [kf, kv]
        params = model.init(
            {"params": jax.random.PRNGKey(3), "cond_drop": jax.random.PRNGKey(4)},
            *init_args,
        )
        cond = model.apply(params, *enc_args, method=FiLMDenoiser.encode_conditioning)

        def apply_denoise(p, xx, tt, cc, keep):
            return model.apply(p, xx, tt, cc, keep, method=FiLMDenoiser.denoise)

        for scale in (1.0, 2.5):
            ref = cfg_model_fn(apply_denoise, params, cond, scale)(x, t)
            got = cfg_model_fn_cached(model, params, cond, scale)(x, t)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5,
                err_msg=f"{fmt}, scale={scale}",
            )


def test_nucleus_sample_empirical_distribution_matches_law():
    """The top-p DRAW (not just the mask): sampling many tokens from fixed
    logits must reproduce the shifted-nucleus renormalized distribution
    (nucleus_probs — the construction pinned against the live reference in
    test_topp_ancestral_parity) to statistical tolerance."""
    from audio2photoreal_tpu.models.guide import nucleus_probs

    rng = np.random.RandomState(3)
    logits_row = rng.randn(8).astype(np.float32) * 1.5
    top_p = 0.7
    B = 4096  # draw many samples in one vectorized call
    logits = jnp.asarray(np.tile(logits_row, (B, 1)))
    draws = np.asarray(nucleus_sample(jax.random.PRNGKey(11), logits, top_p))

    sorted_idx, keep, kept = nucleus_probs(jnp.asarray(logits_row[None]), top_p)
    law = np.zeros(8)
    np.put_along_axis(law[None], np.asarray(sorted_idx), np.asarray(kept), -1)

    emp = np.bincount(draws, minlength=8) / B
    # tokens outside the nucleus must NEVER be drawn
    assert emp[law == 0].sum() == 0.0
    # within the nucleus: ~3 sigma of the binomial at n=4096
    for tok in np.nonzero(law)[0]:
        sigma = np.sqrt(law[tok] * (1 - law[tok]) / B)
        assert abs(emp[tok] - law[tok]) < 4 * sigma + 1e-3, (
            f"token {tok}: emp {emp[tok]:.4f} vs law {law[tok]:.4f}"
        )
