"""Precomputed frozen-frontend features — the trainer's conditioning cache.

The conditioning frontends are FROZEN (reference model/utils.py:18-26,
model/diffusion.py:273-280): the vq-wav2vec feature extractor consumed by both
denoisers and the guide LM, and the lip regressor consumed by the face
denoiser.  The reference recomputes them on every training step; at the bs-64
operating point that frontend is ~1/3 of the whole step (HBM-bound conv
stack over 64×20 s of audio) plus a ~470 MB host→device raw-audio transfer.

This module computes the features ONCE per scene and lets the loader emit
feature windows instead of raw audio:

- **Alignment is exact.** Crop starts/lengths are rounded to 3-frame quanta:
  3 frames = 4800 samples @48 kHz = 1600 @16 kHz = 10 feature hops (hop 160),
  so the crop's token window is a contiguous slice of the scene's token
  stream, and every token's conv receptive field covers exactly the samples
  the raw-audio path would see.
- **Normalization spans ~20 s segments.** The extractor's group norm reduces
  over the whole clip (fairseq Fp32GroupNorm), so features are not purely
  local.  Scenes are processed in fixed windows of ``seg_tokens`` tokens
  (default 2000 ≈ 600 frames ≈ 20 s) with exact conv-window tiling
  (parallel/seq_shard.py geometry) and masked moments over the real signal
  (ConvFeatureExtractor ``n_valid``) — the SAME normalization span the
  inference pipeline sees for its 600-frame chunks.  Training crops therefore
  get segment-level statistics instead of per-crop statistics; the frontends
  are frozen, so this is a conditioning-statistics choice, not a change to
  what is learned, and it brings train-time conditioning CLOSER to the
  inference distribution.
- **Padding region** beyond a crop is filled with the frontend's silence
  response (the raw path feeds zero samples there).

Face models additionally cache the frozen lip-regressor vertices per frame
(chunks of 120 frames like the reference, model/diffusion.py:295-313), sliced
per crop and nearest-resized in-model (FiLMDenoiser ``lip_verts=``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np

from audio2photoreal_tpu.models.audio_encoder import feature_frames

FRAME_QUANTUM = 3  # crop starts/lengths round to 3 frames = 10 feature hops
TOKENS_PER_QUANTUM = 10
FRAME_HOP_16K = 160
RECEPTIVE_FIELD_16K = 465
SAMPLES_48K_PER_QUANTUM = 3 * 1600


def tokens_for_frames(n_frames: int) -> int:
    """Feature-token count for an n_frames crop (n_frames % 3 == 0)."""
    assert n_frames % FRAME_QUANTUM == 0, n_frames
    return feature_frames(n_frames * 1600 // 3)


def quantize_window(start: int, length: int, n_frames: int, min_length: int):
    """Round a (start, length) crop to the 3-frame cache quantum, staying
    inside the scene and at/above the (also-quantized) minimum length."""
    q = FRAME_QUANTUM
    length = max((min(length, n_frames) // q) * q, (min(min_length, n_frames) // q) * q, q)
    start = min((start // q) * q, ((n_frames - length) // q) * q)
    return max(start, 0), length


@dataclass
class AudioFeatureCache:
    """Per-scene frozen conditioning features.

    ``features[i]`` is scene i's token stream [Ttok_i, 1024] (f32 or f16);
    ``silence`` [1024] fills padding; ``lip[i]`` [T_i, 1014] per-frame lip
    vertices + ``lip_silence`` [1014] when built for a face model.
    """

    features: List[np.ndarray]
    silence: np.ndarray
    lip: Optional[List[np.ndarray]] = None
    lip_silence: Optional[np.ndarray] = None

    @property
    def dim(self) -> int:
        return int(self.silence.shape[-1])

    def window(
        self, scene_i: int, start_frame: int, n_frames: int, out_tokens: int
    ) -> np.ndarray:
        """Token window for a crop → [out_tokens, 1024] f32 (silence-padded)."""
        assert start_frame % FRAME_QUANTUM == 0 and n_frames % FRAME_QUANTUM == 0
        off = (start_frame // FRAME_QUANTUM) * TOKENS_PER_QUANTUM
        n = tokens_for_frames(n_frames)
        f = self.features[scene_i]
        assert off + n <= f.shape[0], (off, n, f.shape)
        out = np.empty((out_tokens, f.shape[1]), np.float32)
        out[:n] = f[off : off + n]
        out[n:] = self.silence
        return out

    def lip_window(
        self, scene_i: int, start_frame: int, n_frames: int, out_frames: int
    ) -> np.ndarray:
        """Per-frame lip vertices for a crop → [out_frames, 1014] f32."""
        assert self.lip is not None, "cache was not built with lip vertices"
        v = self.lip[scene_i]
        out = np.empty((out_frames, v.shape[1]), np.float32)
        w = v[start_frame : start_frame + n_frames]
        out[: w.shape[0]] = w
        out[w.shape[0] :] = self.lip_silence
        return out

    def nbytes(self) -> int:
        n = sum(f.nbytes for f in self.features)
        if self.lip is not None:
            n += sum(v.nbytes for v in self.lip)
        return n


def _segment_windows_48k(n_samples_48k: int, seg_tokens: int):
    """Exact conv-window tiling in the 48 kHz domain: segment i owns tokens
    [i·m, (i+1)·m); its window covers 16 kHz samples
    [i·m·160, (i·m + m−1)·160 + 465) = 48 kHz samples ×3 (the resampler is a
    3:1 polyphase decimator, so 16 kHz sample k comes from 48 kHz sample 3k's
    neighborhood)."""
    m = seg_tokens
    total_16k = n_samples_48k // 3
    total_tokens = feature_frames(total_16k)
    w16 = (m - 1) * FRAME_HOP_16K + RECEPTIVE_FIELD_16K
    w48 = w16 * 3
    n_seg = max(-(-total_tokens // m), 1)
    return total_tokens, n_seg, w48, m


def build_audio_feature_cache(
    frontend_apply: Callable[[np.ndarray, int], np.ndarray],
    scene_audios: Sequence[np.ndarray],  # per scene [S, 2] raw 48 kHz, UN-normalized
    norm_audio: Callable[[np.ndarray], np.ndarray],
    *,
    seg_tokens: int = 2000,
    dtype=np.float32,
    lip_apply: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    lip_chunk: int = 120,
    verbose: bool = True,
) -> AudioFeatureCache:
    """Run the frozen frontends over every scene once.

    ``frontend_apply(audio [1, W, 2], n_valid) -> [1, T, 1024]`` — a jitted
    Wav2VecFeatureExtractor apply with masked group-norm moments; called on
    ONE static window shape, so it compiles once.
    ``lip_apply(frames [1, lip_chunk, 1600]) -> [1, lip_chunk, 1014]`` builds
    the face models' lip cache when given.
    """
    feats: List[np.ndarray] = []
    lips: Optional[List[np.ndarray]] = [] if lip_apply is not None else None

    # one dummy segment defines the compiled shape AND the silence response
    _, _, w48, m = _segment_windows_48k(seg_tokens * FRAME_HOP_16K * 3 + 2000, seg_tokens)
    silence_full = np.asarray(frontend_apply(np.zeros((1, w48, 2), np.float32), w48))
    silence = silence_full[0, m // 2].astype(np.float32)

    lip_silence = None
    if lip_apply is not None:
        lv = np.asarray(lip_apply(np.zeros((1, lip_chunk, 1600), np.float32)))
        lip_silence = lv[0, lip_chunk // 2].astype(np.float32)

    for si, raw in enumerate(scene_audios):
        audio = norm_audio(np.asarray(raw, np.float32))
        S = audio.shape[0]
        total_tokens, n_seg, _, _ = _segment_windows_48k(S, seg_tokens)
        scene = np.empty((total_tokens, silence.shape[0]), dtype)
        for i in range(n_seg):
            s0 = i * m * FRAME_HOP_16K * 3
            win = audio[s0 : s0 + w48]
            n_valid = win.shape[0]
            if n_valid < w48:
                win = np.pad(win, ((0, w48 - n_valid), (0, 0)))
            out = np.asarray(frontend_apply(win[None], n_valid))[0]
            lo, hi = i * m, min((i + 1) * m, total_tokens)
            scene[lo:hi] = out[: hi - lo]
        feats.append(scene)

        if lips is not None:
            T = S // 1600
            n_chunks = -(-T // lip_chunk)
            verts = np.empty((n_chunks * lip_chunk, lip_silence.shape[0]), dtype)
            frames = audio[: T * 1600].reshape(T, 1600)
            for c in range(n_chunks):
                chunk = frames[c * lip_chunk : (c + 1) * lip_chunk]
                if chunk.shape[0] < lip_chunk:
                    chunk = np.pad(chunk, ((0, lip_chunk - chunk.shape[0]), (0, 0)))
                verts[c * lip_chunk : (c + 1) * lip_chunk] = np.asarray(
                    lip_apply(chunk[None])
                )[0]
            lips.append(verts[:T])
        if verbose:
            print(f"feature_cache: scene {si + 1}/{len(scene_audios)}: "
                  f"{total_tokens} tokens", flush=True)

    cache = AudioFeatureCache(feats, silence, lips, lip_silence)
    if verbose:
        print(f"feature_cache: {cache.nbytes() / 1e6:.1f} MB host RAM", flush=True)
    return cache


def build_cache_for_index(
    index,  # data/loader.SceneIndex — cache scene order MUST match the loader's
    norm_audio: Callable[[np.ndarray], np.ndarray],
    frontend_apply: Callable,
    lip_apply: Optional[Callable] = None,
    *,
    dtype=np.float32,
    seg_tokens: int = 2000,
    verbose: bool = True,
) -> AudioFeatureCache:
    """Build the cache over a SceneIndex's train-split scenes (full-scene wav
    reads happen once, here — the steady-state loop never touches audio)."""
    from audio2photoreal_tpu.data.dataset import read_wav

    audios = []
    for base, frames in index.entries:
        wav = read_wav(base + "_audio.wav")
        audios.append(np.asarray(wav[: frames * 1600], np.float32))
    return build_audio_feature_cache(
        frontend_apply,
        audios,
        norm_audio,
        seg_tokens=seg_tokens,
        dtype=dtype,
        lip_apply=lip_apply,
        verbose=verbose,
    )


def make_frontend_apply(frontend_module, frontend_params) -> Callable:
    """Jit a Wav2VecFeatureExtractor apply (audio [1, W, 2], n_valid) → feats.

    ``frontend_params`` is the frozen subtree (e.g.
    ``params["params"]["audio_frontend"]``)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def apply(audio, n_valid):
        return frontend_module.apply(
            {"params": frontend_params}, audio, jnp.asarray(n_valid)
        )

    return apply


def make_lip_apply(lip_module, lip_params) -> Callable:
    """Jit a LipRegressor apply (frames [1, chunk, 1600] mono ch0) → verts
    [1, chunk, 1014]."""
    import jax

    @jax.jit
    def apply(frames):
        v = lip_module.apply({"params": lip_params}, frames)
        return v.reshape(v.shape[0], v.shape[1], -1)

    return apply
