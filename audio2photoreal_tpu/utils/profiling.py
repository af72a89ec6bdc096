"""Tracing / profiling utilities.

Replaces the reference's cProfile-first-1000-steps + Timer + profile_kv
(train/training_loop.py:136-162, utils/misc.py:197-223,
utils/logger.py:296-325) with TPU-appropriate tools:
- ``profile_trace``: a jax.profiler trace context writing a TensorBoard-
  loadable trace,
- ``aot_compile``: lower+compile with wall-time reporting (compile time is a
  first-class cost on TPU),
- ``Timer``: steps/sec EMA for host loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """``with profile_trace('/tmp/trace'): step(...)`` → TB trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def aot_compile(name: str, fn: Callable, *args, verbose: bool = True, **kwargs):
    """Ahead-of-time lower+compile; returns the compiled executable."""
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args, **kwargs)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    if verbose:
        print(f"[aot] {name}: trace/lower {t1-t0:.1f}s, compile {t2-t1:.1f}s", flush=True)
    return compiled


class Timer:
    """steps/sec with EMA (utils/misc.py:197-223 equivalent)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rate: Optional[float] = None
        self._last = time.time()

    def tick(self, n: int = 1) -> float:
        now = time.time()
        dt = max(now - self._last, 1e-9)
        self._last = now
        inst = n / dt
        self.rate = inst if self.rate is None else self.ema * self.rate + (1 - self.ema) * inst
        return self.rate
