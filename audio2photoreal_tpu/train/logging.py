"""kv-logger: stdout table + JSONL sidecar (+ optional TensorBoard).

Lineage of the reference's OpenAI-baselines logger (utils/logger.py:28-474)
and TrainPlatform strategy (train/train_platforms.py:10-56), trimmed to what
the trainers actually use: logkv/logkv_mean + dumpkvs with stdout/JSON/TB
writers.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional


class KVLogger:
    def __init__(self, save_dir: Optional[str] = None, tensorboard: bool = False):
        self.save_dir = save_dir
        self._jsonl = None
        self._tb = None
        self._means = defaultdict(lambda: [0.0, 0])
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self._jsonl = open(os.path.join(save_dir, "log.jsonl"), "a")
        if tensorboard and save_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(save_dir)
            except Exception:
                self._tb = None

    def logkv_mean(self, key: str, value: float) -> None:
        s = self._means[key]
        s[0] += float(value)
        s[1] += 1

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        for k, v in metrics.items():
            self.logkv_mean(k, v)
        self.dump(step)

    def dump(self, step: int) -> None:
        kv = {k: s[0] / max(s[1], 1) for k, s in self._means.items()}
        self._means.clear()
        row = {"step": step, "time": time.time(), **kv}
        parts = " | ".join(f"{k} {v:.4g}" for k, v in kv.items())
        print(f"[step {step}] {parts}", flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps(row) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in kv.items():
                self._tb.add_scalar(k, v, step)

    @contextmanager
    def profile_kv(self, name: str):
        """Wall-time per named scope (utils/logger.py:296-325)."""
        t0 = time.time()
        try:
            yield
        finally:
            self.logkv_mean(f"wall_{name}", time.time() - t0)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
