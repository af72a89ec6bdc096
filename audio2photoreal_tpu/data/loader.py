"""High-throughput batch loader: native windowed reads + background prefetch.

The host here has ONE core shared with XLA dispatch, so the data plane must
be cheap: the ``fastdata`` C extension (native/fastdata.c) reads exactly the
requested wav/npy windows off disk (no full-file loads, GIL released during
I/O), and a single prefetch thread keeps a small queue of ready batches ahead
of the train loop — the role torch's C++ DataLoader workers play in the
reference (data_loaders/get_data.py:35-43).
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from audio2photoreal_tpu.core.config import DataConfig
from audio2photoreal_tpu.data.stats import DataStats

try:
    from audio2photoreal_tpu.data import fastdata

    HAVE_FASTDATA = True
except ImportError:  # extension not built — fall back to numpy reads
    HAVE_FASTDATA = False


class SceneIndex:
    """Per-scene file paths + lengths, resolved once (no data loaded)."""

    def __init__(self, data_root: str, person: str):
        pdir = os.path.join(data_root, person)
        self.entries: List[Tuple[str, int]] = []  # (base path, frames)
        for pose_path in sorted(glob.glob(os.path.join(pdir, "*_body_pose.npy"))):
            base = pose_path[: -len("_body_pose.npy")]
            # length from the npy header only
            with open(pose_path, "rb") as f:
                f.seek(8)
                hlen = int.from_bytes(f.read(2), "little")
                hdr = f.read(hlen).decode("latin1")
            shape = hdr.split("'shape': (")[1].split(")")[0]
            frames = int(shape.split(",")[0])
            self.entries.append((base, frames))
        if not self.entries:
            raise FileNotFoundError(f"no scenes under {pdir}")


class FastLoader:
    """Random-window batch sampler using native reads."""

    def __init__(self, index: SceneIndex, stats: DataStats, cfg: DataConfig, seed: int = 0):
        assert cfg.data_format == "pose", "fast path currently serves the pose trainer"
        self.index = index
        self.stats = stats
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.inv_pose = 1.0 / float(stats.pose_std + 1e-8)
        self.inv_audio = 1.0 / float(stats.audio_std + 1e-8)

    def _read_window(self, base: str, start: int, L: int):
        apf = self.cfg.audio_per_frame
        if HAVE_FASTDATA:
            pbuf, pc = fastdata.read_npy_rows(base + "_body_pose.npy", start, L)
            pose = np.frombuffer(
                fastdata.normalize_rows(pbuf, self.stats.pose_mean.tobytes(), self.inv_pose),
                np.float32,
            ).reshape(L, pc)
            abuf, ch = fastdata.read_wav_window(base + "_audio.wav", start * apf, L * apf)
            audio = np.frombuffer(
                fastdata.normalize_rows(abuf, self.stats.audio_mean.tobytes(), self.inv_audio),
                np.float32,
            ).reshape(L * apf, ch)
        else:
            pose = self.stats.norm_pose(
                np.load(base + "_body_pose.npy", mmap_mode="r")[start : start + L]
            ).astype(np.float32)
            from audio2photoreal_tpu.data.dataset import read_wav

            audio = self.stats.norm_audio(
                read_wav(base + "_audio.wav")[start * apf : (start + L) * apf]
            ).astype(np.float32)
        return pose, audio

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        Tmax = cfg.max_seq_length
        Kmax = -(-Tmax // 30)
        apf = cfg.audio_per_frame
        out = {
            "motion": np.zeros((batch_size, Tmax, 104), np.float32),
            "mask": np.zeros((batch_size, Tmax), np.float32),
            "lengths": np.zeros((batch_size,), np.int32),
            "audio": np.zeros((batch_size, Tmax * apf, 2), np.float32),
            "keyframes": np.zeros((batch_size, Kmax, 104), np.float32),
            "keyframe_valid": np.zeros((batch_size, Kmax), np.float32),
        }
        for b in range(batch_size):
            base, frames = self.index.entries[self.rng.randint(len(self.index.entries))]
            L = int(self.rng.randint(cfg.min_seq_length, cfg.max_seq_length + 1))
            L = min(L, frames)
            start = int(self.rng.randint(0, max(frames - L, 0) + 1))
            pose, audio = self._read_window(base, start, L)
            out["motion"][b, :L] = pose
            out["mask"][b, :L] = 1.0
            out["lengths"][b] = L
            out["audio"][b, : L * apf] = audio
            kf = pose[::30]
            out["keyframes"][b, : len(kf)] = kf
            out["keyframe_valid"][b, : len(kf)] = 1.0
        return out


def prefetch(batches: Iterator, depth: int = 2) -> Iterator:
    """Run the batch iterator in a daemon thread, `depth` batches ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for b in batches:
                q.put(b)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
