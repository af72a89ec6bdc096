"""Orbax checkpointing with the config.json sidecar contract.

Reference behaviors reproduced (SURVEY §5.4): save-every-N with step-stamped
names, latest-checkpoint lookup, resume restoring params+optimizer+step, and
the load-bearing config sidecar that lets inference re-hydrate model
hyperparameters (training_loop.py:89-107,229-267; utils/diff_parser_utils.py:14-53).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save(ckpt_dir: str, step: int, tree: Any, max_to_keep: int = 3) -> None:
    """tree: any pytree (e.g. {"state": train_state, "vq": vq_state})."""
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(tree))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(ckpt_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``target`` (an abstract or
    concrete pytree)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    out = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return out
