"""Mel spectrogram (torchaudio.transforms.MelSpectrogram equivalent).

Used by the AudioTcn conditioning encoder (reference:
model/modules/audio_encoder.py:95-104 — 24 kHz, n_fft 1024, win 800, hop 400,
80 mels → two feature frames per 30 fps visual frame).  STFT is framing +
Hann window + rfft; the mel filterbank follows the HTK-free (Slaney-less,
torchaudio default htk=False? torchaudio uses HTK formula when norm=None) —
we use the HTK mel scale like torchaudio's default.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@lru_cache(maxsize=4)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float = None):
    fmax = fmax or sr / 2
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    fpts = mel_to_hz(mels)
    fb = np.zeros((n_freqs, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = fpts[m], fpts[m + 1], fpts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.clip(np.minimum(up, down), 0, None)
    return fb


def melspectrogram(
    wav: jnp.ndarray,  # [B, S]
    sr: int = 24_000,
    n_fft: int = 1024,
    win_length: int = 800,
    hop_length: int = 400,
    n_mels: int = 80,
) -> jnp.ndarray:
    """→ power mel spectrogram [B, n_mels, n_frames] (torchaudio layout,
    center-padded)."""
    B, S = wav.shape
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None]
    frames = x[:, idx]  # [B, n_frames, n_fft]
    window = jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))
    window = jnp.pad(window, ((n_fft - win_length) // 2, (n_fft - win_length + 1) // 2))
    spec = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
    power = jnp.abs(spec) ** 2  # [B, n_frames, n_freqs]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    mel = jnp.einsum("btf,fm->bmt", power, fb)
    return mel
