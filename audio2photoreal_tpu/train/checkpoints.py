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


# --------------------------------------------------------------------- #
# full-train-state durability, shared by every trainer
# --------------------------------------------------------------------- #


def state_tree(state) -> Dict[str, Any]:
    """The durable slice of a train.state.TrainState: params + optimizer +
    step (+ EMA when present) — what the reference resumes for its trainers
    (train_guide.py:281-293 model+optim+iteration; train_vq.py:157-165
    net+optimizer+scheduler; training_loop.py:89-107)."""
    tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    if getattr(state, "ema_params", None) is not None:
        tree["ema_params"] = state.ema_params
    return tree


def save_train_state(
    ckpt_dir: str,
    step: int,
    state,
    extra: Optional[Dict[str, Any]] = None,
    max_to_keep: int = 3,
    block: bool = False,
) -> None:
    """Checkpoint the FULL train state (async).  ``extra`` carries trainer-
    specific pytrees alongside it (e.g. the VQ codebook EMA state) at the top
    level, preserving each trainer's published payload keys."""
    import jax

    tree = {"state": state_tree(state)}
    if extra:
        tree.update(extra)
    save(ckpt_dir, step, jax.device_get(tree), max_to_keep=max_to_keep, block=block)


def try_resume(ckpt_dir: str, state, extra: Optional[Dict[str, Any]] = None):
    """Self-resume: restore the latest checkpoint INTO the structure of a
    freshly-created state (so optax NamedTuple opt-states and dtypes survive
    the orbax round-trip).  Returns ``(state, extra, step)`` — unchanged
    inputs and step None when no checkpoint exists."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    last = latest_step(ckpt_dir)
    if last is None:
        return state, extra, None
    target: Dict[str, Any] = {"state": jax.device_get(state_tree(state))}
    target["state"]["step"] = np.zeros((), np.int32)
    if extra:
        target.update(jax.device_get(extra))
    restored = restore(ckpt_dir, target, last)
    st = restored["state"]
    state = state.replace(
        params=st["params"],
        opt_state=st["opt_state"],
        step=jnp.asarray(st["step"]),
        **(
            {"ema_params": st["ema_params"]}
            if "ema_params" in st
            else {}
        ),
    )
    if extra:
        extra = {k: restored[k] for k in extra}
    return state, extra, last
