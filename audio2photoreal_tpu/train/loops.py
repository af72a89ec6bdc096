"""Jitted train steps + host-side loops for the three model families.

Reference equivalents: TrainLoop (train/training_loop.py:133-288, diffusion),
ModelTrainer VQ (train/train_vq.py:54-271), ModelTrainer guide
(train/train_guide.py:27-293).  Each train step here is a pure function
``(state, batch, rng) -> (state, metrics)`` jitted once; data parallelism is
just a sharded batch (parallel/sharding.py) — XLA inserts the gradient psum.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from audio2photoreal_tpu.core.config import DiffusionConfig
from audio2photoreal_tpu.diffusion import gaussian, losses, tsample
from audio2photoreal_tpu.diffusion.schedules import Schedule
from audio2photoreal_tpu.models.vqvae import VQState
from audio2photoreal_tpu.train.state import TrainState, update_ema


# --------------------------------------------------------------------- #
# diffusion denoiser
# --------------------------------------------------------------------- #


def make_diffusion_train_step(
    model,
    schedule: Schedule,
    dcfg: DiffusionConfig,
    ema_decay: float = 0.0,
    schedule_sampler: str = "uniform",
):
    """One denoiser training step (reference: training_loop.py:174-215 +
    gaussian_diffusion.py:1195-1271).

    ``schedule_sampler``: "uniform" (reference default, resample.py:75) or
    "loss_second_moment" (resample.py:138-168) — the latter threads a
    ``tsample.LossSecondMomentState`` through the step:
    ``step(state, batch, rng, ts_state) -> (state, metrics, ts_state)``."""
    loss_aware = schedule_sampler == "loss_second_moment"
    if not loss_aware and schedule_sampler != "uniform":
        raise ValueError(f"unknown schedule_sampler {schedule_sampler!r}")

    def step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        ts_state: Optional[tsample.LossSecondMomentState] = None,
    ):
        # fold the step counter in HERE, inside the compiled step: an eager
        # per-step split in the host loop is its own tiny device execution,
        # which serializes the loop through the device tunnel (3x slowdown
        # measured) — trainers pass one base key for the whole run
        rng = jax.random.fold_in(rng, state.step)
        k_t, k_noise, k_drop, k_dropout = jax.random.split(rng, 4)
        x0 = batch["motion"]
        B = x0.shape[0]
        if loss_aware:
            t, weights = tsample.loss_second_moment_sample(k_t, ts_state, B)
        else:
            t, weights = tsample.uniform_sample(k_t, schedule.num_timesteps, B)
        noise = jax.random.normal(k_noise, x0.shape)
        xt = gaussian.q_sample(schedule, x0, t, noise)
        mask = batch["mask"][..., None]

        def loss_fn(params):
            out = model.apply(
                params,
                xt,
                t,
                batch.get("audio"),
                batch.get("keyframes"),
                batch.get("keyframe_valid"),
                cond_drop_prob=dcfg.cond_drop_prob,
                deterministic=False,
                rngs={"cond_drop": k_drop, "dropout": k_dropout},
                # precomputed frozen-frontend conditioning (data/feature_cache)
                audio_features=batch.get("audio_features"),
                lip_verts=batch.get("lip_verts"),
            )
            terms = losses.training_losses(
                schedule,
                dcfg.predict,
                out,
                x0,
                xt,
                t,
                mask,
                lambda_vel=dcfg.lambda_vel,
                var_type=dcfg.var_type,
                with_vb=True,
            )
            loss = (terms["loss"] * weights).mean()
            return loss, terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # non-finite guard: skip the update instead of poisoning the params —
        # the role of the reference's fp16 NaN backoff (fp16_util.py:206-211)
        # and ca_body's NaN hard stop (ca_body/utils/train.py:178-184)
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        new_state = state.apply_gradients(grads)
        if ema_decay > 0:
            new_state = update_ema(new_state, ema_decay)
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_state, state
        )
        metrics = {
            "loss": loss,
            "mse": terms["mse"].mean(),
            "vb": terms["vb"].mean(),
            "grad_norm": grad_norm,
            "skipped_nonfinite": (~finite).astype(jnp.float32),
        }
        # loss-quartile logging by timestep bucket (training_loop.py:282-288)
        quartile = (4 * t) // schedule.num_timesteps
        for q in range(4):
            sel = quartile == q
            metrics[f"loss_q{q}"] = jnp.where(
                sel.any(), (terms["loss"] * sel).sum() / jnp.maximum(sel.sum(), 1), jnp.nan
            )
        if loss_aware:
            # reference update_with_local_losses (resample.py:85-118); the
            # pmean inside keeps replicas identical under a mesh
            ts_state = tsample.loss_second_moment_update(
                ts_state, t, jax.lax.stop_gradient(terms["loss"])
            )
            return state, metrics, ts_state
        return state, metrics

    return step


# --------------------------------------------------------------------- #
# VQ-VAE
# --------------------------------------------------------------------- #


def huber(a, b, delta: float = 1.0):
    """SmoothL1 (train_vq.py loss, torch.nn.SmoothL1Loss equivalent)."""
    d = jnp.abs(a - b)
    return jnp.where(d < delta, 0.5 * d**2 / delta, d - 0.5 * delta).mean()


def make_vq_train_step(model, commit_weight: float = 0.02, lambda_vel: float = 1.0):
    """One codec step (reference: train_vq.py:127-155): SmoothL1 recon +
    commit·vq + velocity on 1 fps keyframes.  The VQ codebook state rides in
    the step signature, not the optimizer."""

    def step(
        state: TrainState, vq: VQState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ):
        rng = jax.random.fold_in(rng, state.step)  # see diffusion step
        motion = batch["keyframes"]  # [B, K, nfeats] — 1 fps downsampled

        def loss_fn(params):
            recon, commit, ppl, codes, vq_new = model.apply(
                params, motion, vq, train=True, key=rng
            )
            recon_loss = huber(recon, motion)
            vel_loss = huber(recon[:, 1:] - recon[:, :-1], motion[:, 1:] - motion[:, :-1])
            loss = recon_loss + commit_weight * commit + lambda_vel * vel_loss
            return loss, (recon_loss, commit, ppl, vq_new)

        (loss, (recon_loss, commit, ppl, vq_new)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "recon": recon_loss,
            "commit": commit,
            "perplexity": ppl,
            "grad_norm": optax.global_norm(grads),
        }
        return state, vq_new, metrics

    return step


# --------------------------------------------------------------------- #
# codec-avatar renderer (ca_body)
# --------------------------------------------------------------------- #


def make_avatar_train_step(
    model,
    kl_weight: float = 1e-3,
    geom_weight: float = 1.0,
    shadow_weight: float = 0.1,
    blur_reg_weight: float = 1e-3,
):
    """One BodyAvatar fine-tuning step (the training-mode forward the
    reference wires through CalV5/LearnableBlur/CameraPixelBias +
    ShadowUNet/PoseToShadow, mesh_vae_drivable.py:322-371, driven by the
    generic config loop ca_body/utils/train.py:152-222 — the reference ships
    the machinery but not a concrete loss module; this step uses the
    standard codec-avatar objective):

    - masked L1 image reconstruction (through texture + calibration; the
      raster's visibility is non-differentiable so geometry trains via a
      direct vertex L2 against the GT geometry),
    - VAE KL on the body/face encoder posteriors,
    - pose→shadow distillation (pose_to_shadow learns to mimic the GT-AO
      ShadowUNet map, enabling AO-free inference),
    - LearnableBlur identity regularizer (dof_cal.py reg).

    batch: motion [B,104], geom [B,V,3], face_embs [B,Nf], ao
    [B,S,S,1], campos/K/Rt, image [B,H,W,3], image_mask [B,H,W,1],
    cam_idx [B] int32.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        k_noise = jax.random.fold_in(rng, 1)

        def loss_fn(params):
            preds = model.apply(
                params,
                batch["motion"],
                batch["campos"],
                geom=batch["geom"],
                face_embs=batch["face_embs"],
                K=batch["K"],
                Rt=batch["Rt"],
                ao=batch["ao"],
                encode=True,
                training=True,
                cam_idx=batch["cam_idx"],
                noise_key=k_noise,
                render=True,
            )
            mask = batch.get("image_mask")
            if mask is None:
                mask = (preds["pix_to_face"] >= 0)[..., None].astype(jnp.float32)
            denom = jnp.maximum(mask.sum(), 1.0)
            l_rgb = (jnp.abs(preds["rgb"] - batch["image"]) * mask).sum() / denom / 3.0
            l_geom = ((preds["geom"] - batch["geom"]) ** 2).mean()

            def kl(mu, logvar):
                # embs = mu + exp(logvar)·noise (mesh_vae_drivable.py:441-447)
                # → σ = exp(logvar); KL(N(mu,σ²) ‖ N(0,1))
                return 0.5 * (
                    jnp.exp(2 * logvar) + mu**2 - 1.0 - 2 * logvar
                ).mean()

            l_kl = kl(preds["embs_mu"], preds["embs_logvar"]) + kl(
                preds["face_embs_mu"], preds["face_embs_logvar"]
            )
            l_shadow = (
                (preds["pose_shadow_map"] - jax.lax.stop_gradient(preds["shadow_map"]))
                ** 2
            ).mean()
            l_blur = (
                1.0
                - jax.nn.softmax(
                    params["params"]["learn_blur"]["weights"][batch["cam_idx"]], -1
                )[:, 0]
            ).mean()
            loss = (
                l_rgb
                + geom_weight * l_geom
                + kl_weight * l_kl
                + shadow_weight * l_shadow
                + blur_reg_weight * l_blur
            )
            return loss, {
                "loss_rgb": l_rgb,
                "loss_geom": l_geom,
                "loss_kl": l_kl,
                "loss_shadow": l_shadow,
                "loss_blur_reg": l_blur,
            }

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        new_state = state.apply_gradients(grads)
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_state, state
        )
        return state, {"loss": loss, "grad_norm": grad_norm, **parts}

    return step


# --------------------------------------------------------------------- #
# guide transformer
# --------------------------------------------------------------------- #


def make_guide_train_step(
    model,
    tokenize: Callable[[jnp.ndarray], jnp.ndarray],
    vq_depth: int,
    label_smoothing: float = 0.1,
    cond_drop_prob: float = 0.2,
):
    """One guide-LM step (reference: train_guide.py:71-107): tokenize GT
    keyframes with the frozen VQ, shift-right with the start token, CE with
    label smoothing.  ``tokenize`` is a closed-over frozen-codec apply."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)  # see diffusion step
        k_drop, k_dropout = jax.random.split(rng)
        keyframes = batch["keyframes"]
        B = keyframes.shape[0]
        targets = tokenize(keyframes)  # [B, K, depth] int32
        targets = targets.reshape(B, -1)  # flatten time-major (train_guide.py:84-88)
        start = jnp.full((B, 1), model.start_token, jnp.int32)
        inputs = jnp.concatenate([start, targets[:, :-1]], axis=1)
        valid = jnp.repeat(batch["keyframe_valid"], vq_depth, axis=-1)  # [B, K·depth]

        def loss_fn(params):
            logits = model.apply(
                params,
                inputs,
                batch.get("audio"),
                cond_drop_prob=cond_drop_prob,
                deterministic=False,
                rngs={"cond_drop": k_drop, "dropout": k_dropout},
                audio_features=batch.get("audio_features"),
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            # label smoothing (train_guide.py:50-52): (1−ε)·CE + ε·uniform-CE
            ce = (1.0 - label_smoothing) * nll - label_smoothing * logp.mean(axis=-1)
            loss = (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)
            acc = ((logits.argmax(-1) == targets) * valid).sum() / jnp.maximum(valid.sum(), 1.0)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "acc": acc, "grad_norm": optax.global_norm(grads)}

    return step


