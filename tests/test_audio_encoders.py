"""AudioTcn / mel spectrogram / Wav2VecDownsampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.models.audio_encoder import AudioTcn, Wav2VecDownsampler
from audio2photoreal_tpu.ops.melspec import mel_filterbank, melspectrogram


def test_melspec_shape_and_tone():
    sr = 24_000
    ts = np.arange(sr) / sr
    wav = jnp.asarray(np.sin(2 * np.pi * 1000 * ts).astype(np.float32))[None]
    mel = melspectrogram(wav)
    assert mel.shape[1] == 80
    # energy concentrates around the 1 kHz mel bin
    fb = mel_filterbank(sr, 1024, 80)
    peak_bin = int(np.asarray(mel.mean(axis=2)).argmax())
    freqs = np.linspace(0, sr / 2, 513)
    bin_center = freqs[fb[:, peak_bin].argmax()]
    assert 800 < bin_center < 1300


def test_melspec_frames_per_visual_frame():
    # T visual frames → 1600·T samples @48k → 800·T @24k → hop 400 → 2T+1 stft
    # frames; the AudioTcn drops frame 0 and keeps 2 per visual frame
    T = 10
    wav24 = jnp.zeros((1, 800 * T))
    mel = melspectrogram(wav24)
    assert mel.shape[2] >= 2 * T + 1


def test_wav2vec_downsampler_output_length():
    ds = Wav2VecDownsampler(dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 100, 16).astype(np.float32))
    p = ds.init(jax.random.PRNGKey(0), x, 30)
    out = ds.apply(p, x, 30)
    assert out.shape == (2, 30, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_audiotcn_shapes_and_causality():
    tcn = AudioTcn(encoding_dim=16, use_melspec=True, use_wav2vec=False)
    frames = jnp.asarray(np.random.RandomState(1).randn(1, 8, 1600).astype(np.float32) * 0.1)
    p = tcn.init({"params": jax.random.PRNGKey(0)}, frames)
    out = tcn.apply(p, frames)
    assert out.shape == (1, 8, 16)


def test_audiotcn_with_wav2vec_branch():
    tcn = AudioTcn(encoding_dim=16, use_melspec=False, use_wav2vec=True)
    frames = jnp.asarray(np.random.RandomState(2).randn(1, 6, 1600).astype(np.float32) * 0.1)
    p = tcn.init({"params": jax.random.PRNGKey(1)}, frames)
    out = tcn.apply(p, frames)
    assert out.shape == (1, 6, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_frontend_bf16_close_to_f32_same_params():
    """The bf16 frozen-frontend fast path (frontend_dtype) must keep the
    SAME param tree (checkpoint/converter compatibility) and stay within
    bf16 quantization error of the exact f32 path."""
    from audio2photoreal_tpu.models.audio_encoder import Wav2VecFeatureExtractor

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(2, 48_000, 2).astype(np.float32) * 0.1)
    f32 = Wav2VecFeatureExtractor()
    bf16 = Wav2VecFeatureExtractor(compute_dtype="bfloat16")
    params = f32.init(jax.random.PRNGKey(0), audio)
    # identical param tree: bf16 is a compute-path choice, not a model change
    params_b = bf16.init(jax.random.PRNGKey(0), audio)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_b)

    out32 = f32.apply(params, audio)
    out16 = bf16.apply(params, audio)
    assert out16.dtype == out32.dtype == jnp.float32
    denom = np.abs(np.asarray(out32)).mean() + 1e-6
    rel = np.abs(np.asarray(out16) - np.asarray(out32)).mean() / denom
    assert rel < 2e-2, rel
