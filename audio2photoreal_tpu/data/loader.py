"""High-throughput batch loader: native windowed reads + background prefetch.

The host here has ONE core shared with XLA dispatch, so the data plane must
be cheap: the ``fastdata`` C extension (native/fastdata.c) reads exactly the
requested wav/npy windows off disk (no full-file loads, GIL released during
I/O), and a single prefetch thread keeps a small queue of ready batches ahead
of the train loop — the role torch's C++ DataLoader workers play in the
reference (data_loaders/get_data.py:35-43).

Serves both trainer formats (pose and face) with SocialDataset-equivalent
semantics: the train-split scene subset (data.py:52-54), capture-1/2
root-angle wrap (get_data.py:74-77), face codes zeroed at missing frames
(data.py:251-252), random window lengths with zero-padding + masks.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Dict, Iterator, List, Tuple

import numpy as np

from audio2photoreal_tpu.core.config import DataConfig
from audio2photoreal_tpu.data.stats import DataStats

try:
    from audio2photoreal_tpu.data import fastdata

    HAVE_FASTDATA = True
except ImportError:  # extension not built — fall back to numpy reads
    HAVE_FASTDATA = False


def _npy_rows(path: str) -> int:
    """Row count from the npy header only (no data load)."""
    with open(path, "rb") as f:
        f.seek(8)
        hlen = int.from_bytes(f.read(2), "little")
        hdr = f.read(hlen).decode("latin1")
    shape = hdr.split("'shape': (")[1].split(")")[0]
    return int(shape.split(",")[0])


class SceneIndex:
    """Per-scene file paths + lengths + missing-frame masks, resolved once.

    ``split`` applies the reference's scene split (train = all but the last
    num_val+num_test scenes, data.py:52-54) so the fast path samples the same
    population as SocialDataset."""

    def __init__(
        self,
        data_root: str,
        person: str,
        split: str = "train",
        num_val: int = 2,
        num_test: int = 4,
    ):
        pdir = os.path.join(data_root, person)
        entries: List[Tuple[str, int]] = []  # (base path, frames)
        for pose_path in sorted(glob.glob(os.path.join(pdir, "*_body_pose.npy"))):
            base = pose_path[: -len("_body_pose.npy")]
            frames = _npy_rows(pose_path)
            face_path = base + "_face_expression.npy"
            if os.path.exists(face_path):
                frames = min(frames, _npy_rows(face_path))
            entries.append((base, frames))
        if not entries:
            raise FileNotFoundError(f"no scenes under {pdir}")
        n_hold = num_val + num_test
        if split == "all":
            pass
        elif split == "train":
            entries = entries[: max(len(entries) - n_hold, 0)]
        elif split == "val":
            entries = entries[len(entries) - n_hold : len(entries) - num_test]
        elif split == "test":
            entries = entries[len(entries) - num_test :]
        if not entries:
            raise ValueError(f"no scenes for split {split}")
        self.entries = entries
        # missing-face-frame indices are tiny — load eagerly per scene
        self.missing: List[np.ndarray] = []
        for base, frames in self.entries:
            mpath = base + "_missing_face_frames.npy"
            miss = np.zeros(frames, bool)
            if os.path.exists(mpath):
                idx = np.load(mpath).astype(int)
                miss[idx[idx < frames]] = True
            self.missing.append(miss)


class FastLoader:
    """Random-window batch sampler using native reads (pose or face)."""

    def __init__(
        self,
        index: SceneIndex,
        stats: DataStats,
        cfg: DataConfig,
        seed: int = 0,
        feature_cache=None,  # data/feature_cache.AudioFeatureCache — when set,
        # batches carry "audio_features" (+ face: "lip_verts") instead of raw
        # "audio"; crops quantize to the 3-frame cache grid
    ):
        assert cfg.data_format in ("pose", "face")
        self.index = index
        self.stats = stats
        self.cfg = cfg
        self.feature_cache = feature_cache
        self.rng = np.random.RandomState(seed)
        self.inv_pose = 1.0 / float(stats.pose_std + 1e-8)
        self.inv_audio = 1.0 / float(stats.audio_std + 1e-8)
        self.inv_code = 1.0 / float(getattr(stats, "code_std", 1.0) + 1e-8)
        # capture-1/2 persons need the root-angle wrap BEFORE z-norm, same as
        # SocialDataset (get_data.py:74-77 via dataset._wrap_root_angle)
        self.wrap_root = cfg.person in ("PXB184", "RLW104")
        self.nfeats = 104 if cfg.data_format == "pose" else 256

    def _read_rows(self, path: str, start: int, L: int, mean, inv: float, wrap: bool):
        if HAVE_FASTDATA:
            # the root-angle wrap runs inside the fused C z-norm (wrap_col=3)
            # so capture-1/2 persons stay on the fast path
            buf, cols = fastdata.read_npy_rows(path, start, L)
            try:
                out = fastdata.normalize_rows(
                    buf, np.asarray(mean, np.float32).tobytes(), inv,
                    3 if wrap else -1,
                )
                return np.frombuffer(out, np.float32).reshape(L, cols)
            except TypeError:  # stale extension without wrap_col — rebuild path
                if not wrap:
                    out = fastdata.normalize_rows(
                        buf, np.asarray(mean, np.float32).tobytes(), inv
                    )
                    return np.frombuffer(out, np.float32).reshape(L, cols)
                raw = np.frombuffer(buf, np.float32).reshape(L, cols).copy()
        else:
            raw = np.asarray(np.load(path, mmap_mode="r")[start : start + L], np.float32)
        if wrap:
            from audio2photoreal_tpu.data.dataset import _wrap_root_angle

            raw = _wrap_root_angle(raw)
        return ((raw - mean) * inv).astype(np.float32)

    def _read_window(self, base: str, start: int, L: int, with_audio: bool = True):
        cfg = self.cfg
        apf = cfg.audio_per_frame
        if cfg.data_format == "pose":
            motion = self._read_rows(
                base + "_body_pose.npy", start, L,
                self.stats.pose_mean, self.inv_pose, self.wrap_root,
            )
        else:
            motion = self._read_rows(
                base + "_face_expression.npy", start, L,
                self.stats.code_mean, self.inv_code, False,
            )
        if not with_audio:
            audio = None
        elif HAVE_FASTDATA:
            abuf, ch = fastdata.read_wav_window(base + "_audio.wav", start * apf, L * apf)
            audio = np.frombuffer(
                fastdata.normalize_rows(
                    abuf, np.asarray(self.stats.audio_mean, np.float32).tobytes(),
                    self.inv_audio,
                ),
                np.float32,
            ).reshape(L * apf, ch)
        else:
            from audio2photoreal_tpu.data.dataset import read_wav

            audio = self.stats.norm_audio(
                read_wav(base + "_audio.wav")[start * apf : (start + L) * apf]
            ).astype(np.float32)
        keyframes = None
        if cfg.data_format == "pose":
            # 1 fps keyframes from the SAME window (dataset.py kf = pose[::30])
            keyframes = motion[::30]
        return motion, audio, keyframes

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        cache = self.feature_cache
        Tmax = cfg.max_seq_length
        Kmax = -(-Tmax // 30)
        apf = cfg.audio_per_frame
        C = self.nfeats
        out = {
            "motion": np.zeros((batch_size, Tmax, C), np.float32),
            "mask": np.zeros((batch_size, Tmax), np.float32),
            "lengths": np.zeros((batch_size,), np.int32),
        }
        if cache is None:
            out["audio"] = np.zeros((batch_size, Tmax * apf, 2), np.float32)
        else:
            from audio2photoreal_tpu.data.feature_cache import tokens_for_frames

            Ta = tokens_for_frames(Tmax)
            out["audio_features"] = np.empty((batch_size, Ta, cache.dim), np.float32)
            if cfg.data_format == "face":
                out["lip_verts"] = np.empty((batch_size, Tmax, 1014), np.float32)
        if cfg.data_format == "pose":
            out["keyframes"] = np.zeros((batch_size, Kmax, 104), np.float32)
            out["keyframe_valid"] = np.zeros((batch_size, Kmax), np.float32)
        for b in range(batch_size):
            si = self.rng.randint(len(self.index.entries))
            base, frames = self.index.entries[si]
            missing = self.index.missing[si]
            L = int(self.rng.randint(cfg.min_seq_length, cfg.max_seq_length + 1))
            L = min(L, frames)
            start = int(self.rng.randint(0, max(frames - L, 0) + 1))
            if cfg.data_format == "face":
                # retry while the window is entirely missing (data.py:173-218)
                for _ in range(10):
                    if not missing[start : start + L].all():
                        break
                    start = int(self.rng.randint(0, max(frames - L, 0) + 1))
            if cache is not None:
                from audio2photoreal_tpu.data.feature_cache import quantize_window

                start, L = quantize_window(start, L, frames, cfg.min_seq_length)
            motion, audio, kf = self._read_window(base, start, L, with_audio=cache is None)
            miss_w = missing[start : start + L]
            if cfg.data_format == "face":
                # zero codes at missing frames; mask mirrors it (data.py:251-252)
                motion = np.where(miss_w[:, None], 0.0, motion)
                out["mask"][b, :L] = (~miss_w).astype(np.float32)
            else:
                out["mask"][b, :L] = 1.0
            out["motion"][b, :L] = motion
            out["lengths"][b] = L
            if cache is None:
                out["audio"][b, : L * apf] = audio
            else:
                out["audio_features"][b] = cache.window(si, start, L, Ta)
                if cfg.data_format == "face":
                    out["lip_verts"][b] = cache.lip_window(si, start, L, Tmax)
            if kf is not None:
                out["keyframes"][b, : len(kf)] = kf
                out["keyframe_valid"][b, : len(kf)] = 1.0
        return out

    def batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.sample_batch(batch_size)


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


def make_train_iterator(
    data_root: str,
    stats: DataStats,
    cfg: DataConfig,
    seed: int = 0,
    prefetch_depth: int = 2,
    feature_cache=None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Background-prefetched train batches — FastLoader (native windowed
    reads) when the raw scene files are indexable, else the SocialDataset
    sampler; either way the host assembles the NEXT batch while XLA runs the
    current step (the reference's DataLoader(num_workers) role).

    ``feature_cache`` (data/feature_cache.AudioFeatureCache, built over the
    SAME train-split SceneIndex) switches batches from raw audio to
    precomputed frozen-frontend features."""
    try:
        index = SceneIndex(data_root, cfg.person, "train", cfg.num_val_seqs, cfg.num_test_seqs)
        loader = FastLoader(index, stats, cfg, seed=seed, feature_cache=feature_cache)
        it: Iterator = loader.batches(cfg.batch_size)
    except (FileNotFoundError, ValueError, AssertionError):
        if feature_cache is not None:
            raise  # the cache is index-ordered; no silent fallback
        from audio2photoreal_tpu.data.dataset import SocialDataset, load_local_data

        scenes = load_local_data(data_root, cfg.person)
        ds = SocialDataset(scenes, stats, cfg, "train")
        it = ds.iter_batches(cfg.batch_size, seed=seed)
    return prefetch(it, depth=prefetch_depth)
