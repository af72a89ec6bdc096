"""Sequence-axis sharding for the audio frontend — the long-context hook.

The reference has no sequence parallelism (SURVEY §5.7); clip lengths are
capped at 20 s partly because the wav2vec conv stack runs on the full signal.
This module shards the TIME axis of the feature extractor over the mesh's
``seq`` axis with EXACT semantics:

- the valid conv stack has receptive field 465 samples / hop 160,
- the signal is cut into n overlapping windows, window i covering exactly the
  receptive fields of output frames [i·m, (i+1)·m) — the conv windows seen by
  each shard are bit-identical to the unsharded extractor's,
- ``shard_map`` over the ``seq`` axis runs one window per device; outputs
  concatenate along time with no halo correction needed.

Normalization semantics are EXACT: the extractor's group norm reduces over
the FULL time axis (fairseq Fp32GroupNorm), so each layer psums
de-duplicated masked moments over the ``seq`` axis (SeqShardCtx →
_GroupNormAll) — every device normalizes with the global statistics and the
sharded output equals the unsharded extractor's to float tolerance.

This removes the per-device memory ceiling on clip length (arbitrary-minute
audio on a pod slice) and is the designated growth path for streaming.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audio2photoreal_tpu.models.audio_encoder import VQ_WAV2VEC_SPEC

FRAME_HOP = 160


def receptive_field(spec=VQ_WAV2VEC_SPEC) -> int:
    rf, jump = 1, 1
    for _, k, s in spec:
        rf = rf + (k - 1) * jump
        jump *= s
    return rf  # 465 for the wav2vec stack


def chunked_windows(wav: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    """[B, S] → [B, n, W] overlapping windows with exact output tiling.

    Output frames per chunk m = ceil(N_out / n); window length
    W = (m−1)·160 + rf.  The tail is zero-padded (matching a zero-padded
    unsharded signal)."""
    rf = receptive_field()
    B, S = wav.shape
    n_out = max((S - rf) // FRAME_HOP + 1, 0)
    m = -(-n_out // n_chunks)
    W = (m - 1) * FRAME_HOP + rf
    need = (n_chunks - 1) * m * FRAME_HOP + W
    wav = jnp.pad(wav, ((0, 0), (0, max(need - S, 0))))
    starts = jnp.arange(n_chunks) * (m * FRAME_HOP)
    idx = starts[:, None] + jnp.arange(W)[None]
    return wav[:, idx]  # [B, n, W]


def seq_sharded_extract(
    extract_fn: Callable,  # (win [B, W], seq_ctx) → [B, m, C]
    wav: jnp.ndarray,  # [B, S]
    mesh: Mesh,
    axis: str = "seq",
) -> jnp.ndarray:
    """Run the extractor with time sharded over `axis` → [B, n·m, C].

    ``extract_fn(win, seq_ctx)`` receives a SeqShardCtx (models/audio_encoder)
    so each group norm psums exact global moments over the shard axis."""
    from audio2photoreal_tpu.models.audio_encoder import SeqShardCtx

    n = mesh.shape[axis]
    windows = chunked_windows(wav, n)  # [B, n, W]
    rf = receptive_field()
    n_out = max((wav.shape[1] - rf) // FRAME_HOP + 1, 0)
    m = -(-n_out // n)

    def local(win):  # win: [B, 1, W] per device
        B, k, W = win.shape
        ctx = SeqShardCtx(
            axis_name=axis,
            win_index=jax.lax.axis_index(axis),
            n_windows=n,
            frames_per_window=m,
            orig_len=wav.shape[1],
        )
        feats = extract_fn(win.reshape(B * k, W), ctx)
        return feats.reshape(B, -1, feats.shape[-1])

    out = shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(windows)
    return out[:, :n_out]
