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


# --------------------------------------------------------------------- #
# TrainPlatform strategy (reference train/train_platforms.py:10-56): a
# pluggable experiment reporter.  The reference ships ClearML / Tensorboard /
# NoPlatform; ClearML is a proprietary SaaS client, so the equivalent here is
# the same strategy surface over KVLogger (Tensorboard/JSONL) plus a no-op —
# external trackers plug in by subclassing TrainPlatform.


class TrainPlatform:
    """report_scalar/report_args/close strategy (train_platforms.py:10-24)."""

    def __init__(self, save_dir: Optional[str] = None):
        self.save_dir = save_dir

    def report_scalar(self, name: str, value: float, iteration: int, group_name: str = "") -> None:
        pass

    def report_args(self, args, name: str = "args") -> None:
        pass

    def close(self) -> None:
        pass


class NoPlatform(TrainPlatform):
    """train_platforms.py:51-56."""


class TensorboardPlatform(TrainPlatform):
    """train_platforms.py:36-49 — backed by KVLogger's TB/JSONL writers."""

    def __init__(self, save_dir: str):
        super().__init__(save_dir)
        self._logger = KVLogger(save_dir, tensorboard=True)

    def report_scalar(self, name: str, value: float, iteration: int, group_name: str = "") -> None:
        key = f"{group_name}/{name}" if group_name else name
        self._logger.log(iteration, {key: float(value)})

    def report_args(self, args, name: str = "args") -> None:
        if self.save_dir:
            import dataclasses

            payload = (
                dataclasses.asdict(args) if dataclasses.is_dataclass(args) else vars(args)
            )
            with open(os.path.join(self.save_dir, f"{name}.json"), "w") as f:
                json.dump(payload, f, indent=1, default=str)

    def close(self) -> None:
        self._logger.close()


class ClearmlPlatform(TrainPlatform):
    """train_platforms.py:24-40 — same lazy-SDK pattern as the reference: the
    ``clearml`` import happens in __init__, so selecting this platform without
    the SDK installed raises at construction (exactly the reference behavior)
    and the rest of the framework carries no dependency on it."""

    def __init__(self, save_dir: str):
        if save_dir is None:
            raise ValueError("ClearmlPlatform requires save_dir")
        from clearml import Task  # not baked into this image; user-installed

        super().__init__(save_dir)
        path, name = os.path.split(save_dir)
        self.task = Task.init(
            project_name="motion_diffusion", task_name=name, output_uri=path
        )
        self.logger = self.task.get_logger()

    def report_scalar(self, name: str, value: float, iteration: int, group_name: str = "") -> None:
        self.logger.report_scalar(
            title=group_name, series=name, iteration=iteration, value=value
        )

    def report_args(self, args, name: str = "args") -> None:
        self.task.connect(args, name=name)

    def close(self) -> None:
        self.task.close()


def create_platform(name: str, save_dir: Optional[str]) -> TrainPlatform:
    """``--train_platform_type`` factory (reference
    utils/diff_parser_utils.py:182-187 + train_platforms.py)."""
    platforms = {
        "NoPlatform": lambda: NoPlatform(save_dir),
        "TensorboardPlatform": lambda: TensorboardPlatform(save_dir),
        "ClearmlPlatform": lambda: ClearmlPlatform(save_dir),
    }
    if name not in platforms:
        raise ValueError(f"unknown train platform {name!r}; options: {sorted(platforms)}")
    return platforms[name]()
