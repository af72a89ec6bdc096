"""Ops-layer tests: resample, conv framings, grid sample, attention masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.ops.attention import causal_bias, dot_product_attention, padding_bias
from audio2photoreal_tpu.ops.convs import causal_conv1d, conv1d, strided_conv_as_matmul, valid_conv1d
from audio2photoreal_tpu.ops.embeddings import sinusoidal_pos_emb, timestep_embedding
from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear
from audio2photoreal_tpu.ops.resample import resample


def test_resample_preserves_sine_frequency():
    """48k→16k of a 440 Hz tone stays a 440 Hz tone."""
    sr, t = 48_000, 0.5
    ts = np.arange(int(sr * t)) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440 * ts).astype(np.float32))[None]
    y = np.asarray(resample(x, 48_000, 16_000))[0]
    assert len(y) == int(16_000 * t)
    # dominant FFT bin at 440 Hz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    freq = np.fft.rfftfreq(len(y), 1 / 16_000)
    assert abs(freq[spec.argmax()] - 440) < 5
    # amplitude preserved within a few percent (interior)
    assert np.abs(y[100:-100]).max() == pytest.approx(1.0, abs=0.05)


def test_resample_identity():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 100).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(resample(x, 16000, 16000)), np.asarray(x))


def test_strided_matmul_conv_equals_valid_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 333, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(8, 4, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    a = valid_conv1d(x, k, b, stride=4)
    m = strided_conv_as_matmul(x, k, b, stride=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(m), atol=1e-4)


def test_causal_conv_is_causal():
    rng = np.random.RandomState(2)
    k = jnp.asarray(rng.randn(3, 4, 4).astype(np.float32))
    x1 = jnp.asarray(rng.randn(1, 10, 4).astype(np.float32))
    x2 = x1.at[:, 7:].set(0.0)
    y1 = causal_conv1d(x1, k, dilation=2)
    y2 = causal_conv1d(x2, k, dilation=2)
    np.testing.assert_allclose(np.asarray(y1[:, :7]), np.asarray(y2[:, :7]), atol=1e-6)
    assert y1.shape == x1.shape


def test_causal_bias_masks_future():
    b = np.asarray(causal_bias(4, 4))
    assert b[0, 1] < -1e8 and b[1, 0] == 0 and b[3, 3] == 0


def test_attention_padding_bias_zeroes_padded_keys():
    q = jnp.ones((1, 1, 2, 4))
    k = jnp.asarray(np.random.RandomState(3).randn(1, 1, 3, 4).astype(np.float32))
    v = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4))
    valid = jnp.array([[1.0, 1.0, 0.0]])
    out = dot_product_attention(q, k, v, padding_bias(valid))
    # last key must not contribute: output is convex combo of first two values
    o = np.asarray(out[0, 0, 0])
    assert np.all(o <= np.maximum(np.asarray(v[0, 0, 0]), np.asarray(v[0, 0, 1])) + 1e-5)


def test_timestep_embedding_shapes_and_range():
    e = timestep_embedding(jnp.array([0, 10, 999]), 64)
    assert e.shape == (3, 64)
    assert float(jnp.abs(e).max()) <= 1.0 + 1e-6
    s = sinusoidal_pos_emb(jnp.array([3.0]), 16)
    assert s.shape == (1, 16)


def test_grid_sample_center_exact():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    # sample exactly at pixel (1,2) center: x=(2+0.5)/4*2-1, y=(1+0.5)/4*2-1
    grid = jnp.array([[[[(2 + 0.5) / 4 * 2 - 1, (1 + 0.5) / 4 * 2 - 1]]]])
    out = grid_sample_bilinear(img, grid)
    assert float(out[0, 0, 0, 0]) == pytest.approx(6.0, abs=1e-5)


def test_fast_loader_matches_dataset_contract(tmp_path):
    from audio2photoreal_tpu.core.config import DataConfig
    from audio2photoreal_tpu.data.fixtures import make_synthetic_person
    from audio2photoreal_tpu.data.loader import FastLoader, SceneIndex, prefetch
    from audio2photoreal_tpu.data.stats import DataStats

    make_synthetic_person(str(tmp_path), "SYNTH01", num_scenes=3, frames_per_scene=64)
    idx = SceneIndex(str(tmp_path), "SYNTH01", split="all")
    assert len(idx.entries) == 3 and idx.entries[0][1] == 64
    stats = DataStats.load(str(tmp_path / "SYNTH01" / "data_stats.npz"))
    cfg = DataConfig(person="SYNTH01", max_seq_length=48, min_seq_length=32)
    loader = FastLoader(idx, stats, cfg, seed=0)
    batch = loader.sample_batch(4)
    assert batch["motion"].shape == (4, 48, 104)
    assert batch["audio"].shape == (4, 48 * 1600, 2)
    for b in range(4):
        L = int(batch["lengths"][b])
        assert batch["mask"][b, :L].all() and not batch["mask"][b, L:].any()
    # values match the reference python loader for the same window
    from audio2photoreal_tpu.data.dataset import load_local_data

    scenes = load_local_data(str(tmp_path), "SYNTH01")
    pose_n = stats.norm_pose(scenes[0].pose[:48])
    direct, _, kf = loader._read_window(idx.entries[0][0], 0, 48)
    np.testing.assert_allclose(direct, pose_n, atol=2e-4)
    np.testing.assert_allclose(kf, pose_n[::30], atol=2e-4)

    # face format: codes z-normed, missing frames zeroed in motion AND mask
    fcfg = DataConfig(person="SYNTH01", data_format="face",
                      max_seq_length=48, min_seq_length=48)
    floader = FastLoader(idx, stats, fcfg, seed=0)
    fb = floader.sample_batch(4)
    assert fb["motion"].shape == (4, 48, 256)
    assert "keyframes" not in fb
    code_n = stats.norm_code(scenes[0].face[:48])
    code_n = np.where(scenes[0].missing[:48, None], 0.0, code_n)
    fdirect, _, _ = floader._read_window(idx.entries[0][0], 0, 48)
    fdirect = np.where(idx.missing[0][:48, None], 0.0, fdirect)
    np.testing.assert_allclose(fdirect, code_n, atol=2e-4)
    # masks reflect missing frames for at least the scenes that have them
    for b in range(4):
        L = int(fb["lengths"][b])
        assert not fb["mask"][b, L:].any()
        assert (fb["motion"][b][fb["mask"][b] == 0.0] == 0.0).all()

    # prefetch wraps an iterator transparently
    it = prefetch(iter([{"a": np.ones(1)}, {"a": np.zeros(1)}]))
    items = list(it)
    assert len(items) == 2


def test_fast_loader_native_root_wrap(tmp_path):
    """The C fused z-norm applies the capture-1/2 root-angle wrap (wrap_col=3)
    so PXB184/RLW104 stay on the fast path — must equal the python
    _wrap_root_angle + z-norm exactly (ADVICE round-1 #3)."""
    from audio2photoreal_tpu.core.config import DataConfig
    from audio2photoreal_tpu.data.dataset import _wrap_root_angle
    from audio2photoreal_tpu.data.fixtures import make_synthetic_person
    from audio2photoreal_tpu.data.loader import HAVE_FASTDATA, FastLoader, SceneIndex
    from audio2photoreal_tpu.data.stats import DataStats

    make_synthetic_person(str(tmp_path), "PXB184", num_scenes=1, frames_per_scene=64)
    base = str(tmp_path / "PXB184" / "scene00")
    # force negatives into the root-angle column so the wrap actually fires
    pose_path = base + "_body_pose.npy"
    pose = np.load(pose_path)
    pose[:, 3] = np.linspace(-1.5, 1.5, len(pose))
    np.save(pose_path, pose)

    idx = SceneIndex(str(tmp_path), "PXB184", split="all")
    stats = DataStats.load(str(tmp_path / "PXB184" / "data_stats.npz"))
    cfg = DataConfig(person="PXB184", max_seq_length=48, min_seq_length=32)
    loader = FastLoader(idx, stats, cfg, seed=0)
    assert loader.wrap_root
    got = loader._read_rows(pose_path, 0, 48, stats.pose_mean, loader.inv_pose, True)
    want = ((_wrap_root_angle(pose[:48].astype(np.float32)) - stats.pose_mean)
            * loader.inv_pose).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-6)
    if HAVE_FASTDATA:
        # sanity: the fast path really ran (wrap col changed vs unwrapped norm)
        unwrapped = ((pose[:48].astype(np.float32) - stats.pose_mean)
                     * loader.inv_pose).astype(np.float32)
        assert not np.allclose(got[:, 3], unwrapped[:, 3])
