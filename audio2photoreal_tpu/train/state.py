"""Train state: params + optimizer + EMA + step, as one pytree.

Replaces the reference's TrainLoop-held torch module/optimizer pair and the
manual fp16 master-param machinery (train/training_loop.py:43-131,
diffusion/fp16_util.py:162-246): on TPU the params stay float32, compute is
bfloat16 by module policy, and no loss scaling is needed.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from audio2photoreal_tpu.core.config import TrainConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Optional[Any] = None

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )


# frozen-frontend module names: the reference never optimizes these
# (requires_grad=False on wav2vec/lip-regressor params, model/utils.py:18-26,
# model/diffusion.py:273-280) — their grads here are structurally zero via
# stop_gradient, but WITHOUT a mask AdamW still reads/writes m, v, and params
# for all of them every step.  On the face model that is 51.5M of 100.6M
# params (lip_model 46.2M + audio_frontend 5.25M): ~1.2 GB of pure HBM churn
# per step plus ~400 MB of dead optimizer state.
FROZEN_MODULES = ("audio_frontend", "lip_model")


def trainable_mask(params) -> Any:
    """True for leaves the optimizer should update (optax.masked mask)."""

    def _is_trainable(path, _):
        return not any(
            str(getattr(p, "key", p)) in FROZEN_MODULES for p in path
        )

    return jax.tree_util.tree_map_with_path(_is_trainable, params)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with the reference's linear anneal (training_loop.py:217-222) or
    warmup, plus optional global-norm clipping (train_guide.py:103-105).
    Frozen frontends are masked out entirely (see FROZEN_MODULES)."""
    if cfg.lr_anneal_steps:
        sched = optax.linear_schedule(cfg.lr, 0.0, cfg.lr_anneal_steps)
    elif cfg.warmup_steps:
        sched = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    else:
        sched = cfg.lr
    chain = []
    if cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(
        optax.masked(optax.adamw(sched, weight_decay=cfg.weight_decay), trainable_mask)
    )
    return optax.chain(*chain)


def create_train_state(params: Any, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    ema = jax.tree_util.tree_map(jnp.copy, params) if cfg.ema_decay > 0 else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=ema,
        tx=tx,
    )


def update_ema(state: TrainState, decay: float) -> TrainState:
    if state.ema_params is None:
        return state
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), state.ema_params, state.params
    )
    return state.replace(ema_params=new_ema)
