"""Polyphase audio resampling (torchaudio.transforms.Resample equivalent).

The reference resamples 48 kHz capture audio to 16 kHz for wav2vec
(model/utils.py:25, model/modules/audio_encoder.py:33-35).  This is a
windowed-sinc polyphase filter expressed as a strided conv so it runs on
device; numerically matches torchaudio's `sinc_interp_hann` kernel
construction.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.convs import conv1d


@lru_cache(maxsize=8)
def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6, rolloff: float = 0.99) -> np.ndarray:
    """Build the polyphase kernel bank [K, 1, new_freq/gcd] (one output phase
    per column), following torchaudio's construction."""
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig  # [1, K]
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx  # [new, K]
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq / orig
    kernels = np.where(t == 0, 1.0, np.sinc(t)) * window * scale
    return kernels.astype(np.float32), width, orig, new  # type: ignore[return-value]


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample last axis. x: [..., T] → [..., ceil(T·new/orig)]."""
    if orig_freq == new_freq:
        return x
    kernels, width, orig, new = _resample_kernel(orig_freq, new_freq)
    lead = x.shape[:-1]
    T = x.shape[-1]
    xb = x.reshape((-1, T, 1))  # [B, T, 1]
    # pad like torchaudio: width zeros left, width + orig right
    xb = jnp.pad(xb, ((0, 0), (width, width + orig), (0, 0)))
    # kernel bank as conv: [K, 1, new] with stride orig
    k = jnp.asarray(kernels).T[:, None, :]  # [K, 1, new]
    y = conv1d(xb, k, stride=orig, padding=(0, 0))  # [B, T', new]
    y = y.reshape(lead + (-1,))
    target_len = int(math.ceil(new * T / orig))
    return y[..., :target_len]
