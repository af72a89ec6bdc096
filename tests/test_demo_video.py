"""Demo audio prep + video writer + seam resample tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from audio2photoreal_tpu.apps.demo import prepare_audio
from audio2photoreal_tpu.render.seams import SeamSampler
from audio2photoreal_tpu.render.video import write_video


def test_prepare_audio_contract():
    """mono 16k → 48k stereo, trimmed to 4s multiples, near-silent ch2
    (reference: demo/demo.py:156-216)."""
    sr = 16_000
    wav = np.sin(2 * np.pi * 220 * np.arange(sr * 9) / sr).astype(np.float32)
    out = prepare_audio(wav, sr, seed=0)
    assert out.shape == (8 * 48_000, 2)  # 9s → 8s (4s multiples)
    assert np.abs(out[:, 1]).max() < 0.01  # synthetic quiet channel 2
    assert np.abs(out[:, 0]).max() > 0.5


def test_prepare_audio_rejects_short():
    with pytest.raises(ValueError):
        prepare_audio(np.zeros(48_000), 48_000)


def test_prepare_audio_stereo_input_downmixes():
    wav = np.stack([np.ones(48_000 * 4), -np.ones(48_000 * 4)], 1).astype(np.float32)
    out = prepare_audio(wav, 48_000, seed=1)
    assert np.abs(out[:, 0]).max() < 1e-6  # mono downmix of ±1 = 0


def test_write_video_npz_fallback(tmp_path):
    frames = [np.full((8, 8, 3), i * 10, np.uint8) for i in range(5)]
    out = write_video(str(tmp_path / "clip.mp4"), frames, fps=30,
                      audio=np.zeros((8000, 2), np.float32))
    data = np.load(out)
    assert data["frames"].shape == (5, 8, 8, 3)
    assert int(data["fps"]) == 30


def test_seam_resample_blends():
    H = 4
    tex = jnp.ones((1, H, H, 1)) * 2.0
    s = SeamSampler(
        impaint_dst=jnp.zeros((0,), jnp.int32),
        impaint_src=jnp.zeros((0,), jnp.int32),
        # resample texel 5 from the center of the image (value 2) with w=0.5
        resample_uvs=jnp.array([[0.0, 0.0]]),
        resample_dst=jnp.array([5], jnp.int32),
        resample_weights=jnp.array([0.5]),
        uv_size=H,
    )
    tex = tex.at[0, 1, 1, 0].set(0.0)  # dst texel 5 = (1,1)
    out = s(tex)
    # grid (0,0) samples the image center (pixels 1..2 bilinear at 0.25 each:
    # 0,2,2,2 → 1.5); blended: 0.5·old(0) + 0.5·1.5 = 0.75
    assert float(out[0, 1, 1, 0]) == pytest.approx(0.75, abs=1e-5)


def test_guide_converter_pads_null_embed():
    import torch

    from audio2photoreal_tpu.train import convert

    D = 8
    sd = {
        "token_embedding.weight": torch.randn(17, D),
        "cond_projection.weight": torch.randn(D, D),
        "cond_projection.bias": torch.randn(D),
        "norm_cond.weight": torch.ones(D), "norm_cond.bias": torch.zeros(D),
        "non_attn_cond_projection.0.weight": torch.ones(D),
        "non_attn_cond_projection.0.bias": torch.zeros(D),
        "non_attn_cond_projection.1.weight": torch.randn(D, D),
        "non_attn_cond_projection.1.bias": torch.randn(D),
        "non_attn_cond_projection.3.weight": torch.randn(D, D),
        "non_attn_cond_projection.3.bias": torch.randn(D),
        "null_cond_embed": torch.randn(1, 798, D),
        "null_cond_hidden": torch.randn(1, D),
        "final_layer.weight": torch.randn(16, D),
        "final_layer.bias": torch.randn(16),
    }
    p = convert.convert_guide(sd, num_layers=0, num_audio_layers=0, null_embed_len=2048)
    assert p["params"]["null_cond_embed"].shape == (1, 2048, 8)
    # trained rows preserved
    np.testing.assert_allclose(
        p["params"]["null_cond_embed"][:, :798],
        sd["null_cond_embed"].numpy(), atol=1e-7,
    )
