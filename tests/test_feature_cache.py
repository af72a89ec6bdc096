"""Feature-cache tests: precomputed frozen-frontend conditioning
(data/feature_cache.py) — bypass exactness, cache geometry, loader + train
step integration."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.core.config import DataConfig, DenoiserConfig, DiffusionConfig, GuideConfig
from audio2photoreal_tpu.data.feature_cache import (
    FRAME_QUANTUM,
    build_cache_for_index,
    make_frontend_apply,
    quantize_window,
    tokens_for_frames,
)
from audio2photoreal_tpu.data.fixtures import make_synthetic_person
from audio2photoreal_tpu.data.loader import FastLoader, SceneIndex
from audio2photoreal_tpu.data.stats import DataStats
from audio2photoreal_tpu.models.audio_encoder import Wav2VecFeatureExtractor, feature_frames
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.models.guide import GuideTransformer


@pytest.fixture(scope="module")
def person_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache_data")
    make_synthetic_person(str(root), "SYNTH01", num_scenes=4, frames_per_scene=66)
    return str(root)


@pytest.fixture(scope="module")
def stats(person_root):
    return DataStats.load(os.path.join(person_root, "SYNTH01", "data_stats.npz"))


def test_quantize_window():
    q = FRAME_QUANTUM
    for start, length, frames, mn in [(7, 50, 66, 12), (0, 66, 66, 12), (60, 66, 66, 12),
                                      (13, 9, 66, 4), (5, 700, 66, 400)]:
        s, l = quantize_window(start, length, frames, mn)
        assert s % q == 0 and l % q == 0
        assert s >= 0 and s + l <= frames
        assert l >= min(q, frames)


def test_tokens_for_frames_matches_extractor_geometry():
    # 3 frames = 1600 samples @16k = 10 hops: windows tile the token stream
    assert tokens_for_frames(600) == feature_frames(320000) == 1998
    assert tokens_for_frames(6) + 10 == tokens_for_frames(9)


def _tiny_pose_model():
    cfg = DenoiserConfig(
        data_format="pose", nfeats=8, latent_dim=16, ff_size=32,
        num_layers=2, num_heads=2, max_seq_length=12, keyframe_step=6,
    )
    model = FiLMDenoiser(cfg)
    B, T = 2, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 8))
    t = jnp.array([3, 7], jnp.int32)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T * 1600, 2)) * 0.1
    kf = jax.random.normal(jax.random.PRNGKey(2), (B, 2, 104))
    kv = jnp.ones((B, 2))
    params = model.init({"params": jax.random.PRNGKey(3)}, x, t, audio, kf, kv)
    return model, params, (x, t, audio, kf, kv)


def test_denoiser_feature_bypass_exact():
    """model(audio_features=frontend(audio)) is BIT-equal to model(audio)."""
    model, params, (x, t, audio, kf, kv) = _tiny_pose_model()
    feats = model.apply(params, audio, method=FiLMDenoiser.encode_audio)
    y_raw = model.apply(params, x, t, audio, kf, kv)
    y_feat = model.apply(params, x, t, None, kf, kv, audio_features=feats)
    np.testing.assert_array_equal(np.asarray(y_raw), np.asarray(y_feat))


def test_face_feature_bypass_exact():
    """Face denoiser: cached wav2vec features + per-frame lip vertices give
    the bit-identical forward (raw path T<120 runs the lip model on one
    true-length chunk — the same computation)."""
    from audio2photoreal_tpu.models.lip_regressor import LipRegressor

    cfg = DenoiserConfig(
        data_format="face", nfeats=16, latent_dim=16, ff_size=32,
        num_layers=2, num_heads=2, max_seq_length=12, cond_encoder_layers=1,
    )
    model = FiLMDenoiser(cfg)
    B, T = 1, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 16))
    t = jnp.array([5], jnp.int32)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T * 1600, 2)) * 0.1
    params = model.init({"params": jax.random.PRNGKey(2)}, x, t, audio)
    feats = model.apply(params, audio, method=FiLMDenoiser.encode_audio)
    frames = audio[..., 0].reshape(B, T, 1600)
    verts = LipRegressor().apply({"params": params["params"]["lip_model"]}, frames)
    lip_flat = verts.reshape(B, T, -1)
    y_raw = model.apply(params, x, t, audio)
    y_feat = model.apply(params, x, t, None, audio_features=feats, lip_verts=lip_flat)
    np.testing.assert_array_equal(np.asarray(y_raw), np.asarray(y_feat))


def test_guide_feature_bypass_exact():
    cfg = GuideConfig(tokens=16, vq_depth=2, latent_dim=16, num_layers=2,
                      num_heads=2, ff_size=32)
    model = GuideTransformer(cfg)
    B, T = 2, 12
    audio = jax.random.normal(jax.random.PRNGKey(0), (B, T * 1600, 2)) * 0.1
    tokens = jnp.zeros((B, 4), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(1)}, tokens, audio)
    feats = jax.lax.stop_gradient(
        Wav2VecFeatureExtractor().apply(
            {"params": params["params"]["audio_frontend"]},
            audio,
        )
    )
    y_raw = model.apply(params, tokens, audio)
    y_feat = model.apply(params, tokens, None, audio_features=feats)
    np.testing.assert_array_equal(np.asarray(y_raw), np.asarray(y_feat))


@pytest.fixture(scope="module")
def built_cache(person_root, stats):
    fe = Wav2VecFeatureExtractor()
    wav = jnp.zeros((1, 12 * 1600, 2))
    fe_params = fe.init(jax.random.PRNGKey(0), wav)["params"]
    index = SceneIndex(person_root, "SYNTH01", "train", 1, 1)
    cache = build_cache_for_index(
        index, stats.norm_audio, make_frontend_apply(fe, fe_params),
        seg_tokens=64, verbose=False,
    )
    return index, cache, fe, fe_params


def test_cache_window_geometry(built_cache):
    index, cache, fe, fe_params = built_cache
    frames = index.entries[0][1]
    total = tokens_for_frames((frames // 3) * 3)
    assert cache.features[0].shape[0] >= total
    # full-width window fills without silence; short window is silence-padded
    w = cache.window(0, 0, 66, tokens_for_frames(66))
    assert w.shape == (tokens_for_frames(66), 1024)
    out_tokens = tokens_for_frames(66)
    w2 = cache.window(0, 0, 12, out_tokens)
    n12 = tokens_for_frames(12)
    np.testing.assert_array_equal(w2[n12:], np.broadcast_to(cache.silence, (out_tokens - n12, 1024)))


def test_cache_matches_exact_crop(built_cache, person_root, stats):
    """Cached window ≈ extractor run on the exact crop audio.  Values agree
    up to the group-norm statistics span (20 s cache segments vs the crop) —
    tight correlation, loose elementwise tolerance."""
    from audio2photoreal_tpu.data.dataset import read_wav

    index, cache, fe, fe_params = built_cache
    base, frames = index.entries[0]
    start, L = 6, 36
    audio = stats.norm_audio(
        read_wav(base + "_audio.wav")[start * 1600 : (start + L) * 1600]
    ).astype(np.float32)
    exact = np.asarray(fe.apply({"params": fe_params}, jnp.asarray(audio[None])))[0]
    cached = cache.window(0, start, L, tokens_for_frames(L))
    assert cached.shape == exact.shape
    a, b = cached.ravel(), exact.ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.99, cos
    # interior tokens (past the crop's zero-context boundary) agree closely
    rel = np.abs(cached[5:-2] - exact[5:-2]) / (np.abs(exact[5:-2]) + 1e-2)
    assert float(np.median(rel)) < 0.05, float(np.median(rel))


def test_loader_and_train_step_with_cache(person_root, stats, built_cache):
    index, cache, _, _ = built_cache
    cfg = DataConfig(person="SYNTH01", data_format="pose", batch_size=4,
                     max_seq_length=66, min_seq_length=24)
    loader = FastLoader(index, stats, cfg, seed=0, feature_cache=cache)
    batch = loader.sample_batch(4)
    assert "audio" not in batch
    assert batch["audio_features"].shape == (4, tokens_for_frames(66), 1024)
    assert np.isfinite(batch["audio_features"]).all()
    assert int(batch["lengths"].max()) % FRAME_QUANTUM == 0

    from audio2photoreal_tpu.diffusion.schedules import make_schedule
    from audio2photoreal_tpu.train.loops import make_diffusion_train_step
    from audio2photoreal_tpu.train.state import create_train_state
    from audio2photoreal_tpu.core.config import TrainConfig

    mcfg = DenoiserConfig(
        data_format="pose", nfeats=104, latent_dim=16, ff_size=32,
        num_layers=2, num_heads=2, max_seq_length=66, keyframe_step=30,
    )
    model = FiLMDenoiser(mcfg)
    x = jnp.asarray(batch["motion"])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        x, jnp.zeros((4,), jnp.int32), None,
        jnp.asarray(batch["keyframes"]), jnp.asarray(batch["keyframe_valid"]),
        audio_features=jnp.asarray(batch["audio_features"]),
    )
    state = create_train_state(params, TrainConfig(lr=1e-4))
    dcfg = DiffusionConfig(steps=20)
    step = jax.jit(make_diffusion_train_step(model, make_schedule("cosine", 20), dcfg))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step(state, jb, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
