"""Orbax checkpointing with the config.json sidecar contract.

Reference behaviors reproduced (SURVEY §5.4): save-every-N with step-stamped
names, latest-checkpoint lookup, resume restoring params+optimizer+step, and
the load-bearing config sidecar that lets inference re-hydrate model
hyperparameters (training_loop.py:89-107,229-267; utils/diff_parser_utils.py:14-53).

Saves are ASYNC: the host here has one core shared with XLA dispatch, so a
blocking save stalls the train loop every save_interval.  Managers are cached
per directory and `mgr.save` returns immediately; any read path
(latest_step/restore) flushes pending writes first, and ``wait_all()`` flushes
everything at end of training.
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

_MANAGERS: Dict[Tuple[str, int], ocp.CheckpointManager] = {}


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    key = (os.path.abspath(ckpt_dir), max_to_keep)
    if key not in _MANAGERS:
        _MANAGERS[key] = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )
    return _MANAGERS[key]


def wait_all() -> None:
    """Flush every pending async save."""
    for mgr in _MANAGERS.values():
        mgr.wait_until_finished()


atexit.register(wait_all)


def save(ckpt_dir: str, step: int, tree: Any, max_to_keep: int = 3, block: bool = False) -> None:
    """tree: any pytree (e.g. {"state": train_state, "vq": vq_state}).

    Returns immediately (async write); pass ``block=True`` for the final save
    of a run if you need the files on disk before proceeding."""
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(tree))
    if block:
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    wait_all()  # a pending write may BE the latest step
    if not os.path.isdir(ckpt_dir):
        return None
    return _manager(ckpt_dir).latest_step()


def restore(ckpt_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``target`` (an abstract or
    concrete pytree)."""
    wait_all()
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    return mgr.restore(step, args=ocp.args.StandardRestore(target))
