"""VQ-VAE trainer CLI.

Equivalent of ``python -m train.train_vq`` (reference: train/train_vq.py):
1 fps keyframes → codec with EMA codebooks; SmoothL1 recon + commit +
velocity; periodic val recon/perplexity; best/last checkpoints.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import DataConfig, TrainConfig, VQConfig, save_config
from audio2photoreal_tpu.data.dataset import SocialDataset, load_local_data
from audio2photoreal_tpu.models.vqvae import TemporalVertexCodec, VQState
from audio2photoreal_tpu.train import checkpoints
from audio2photoreal_tpu.train.logging import KVLogger
from audio2photoreal_tpu.train.loops import huber, make_vq_train_step
from audio2photoreal_tpu.train.state import create_train_state
from audio2photoreal_tpu.apps.generate import find_stats


def evaluate(model, params, vq, val_ds, batch_size=8) -> dict:
    """Val recon/perplexity (reference: train_vq.py:216-271)."""
    recons, ppls = [], []
    for i in range(min(len(val_ds), 16)):
        ex = val_ds.get_chunk(i) if val_ds.chunks is not None else None
        if ex is None:
            break
        kf = jnp.asarray(ex["keyframes"])[None]
        recon, commit, ppl, codes, _ = model.apply(params, kf, vq)
        recons.append(float(huber(recon, kf)))
        ppls.append(float(ppl))
    return {"val_recon": float(np.mean(recons)), "val_ppl": float(np.mean(ppls))}


def train(data_root: str, save_dir: str, vcfg: VQConfig, datacfg: DataConfig, tcfg: TrainConfig):
    from audio2photoreal_tpu.parallel import distributed as dist
    from audio2photoreal_tpu.parallel.mesh import data_mesh
    from audio2photoreal_tpu.parallel.sharding import replicated

    coord = dist.is_coordinator()
    if coord:
        os.makedirs(save_dir, exist_ok=True)
        save_config(save_dir, vq=vcfg, data=datacfg, train=tcfg)
    logger = KVLogger(save_dir, tensorboard=True) if coord else None

    scenes = load_local_data(data_root, datacfg.person)
    stats = find_stats(os.path.join(data_root, datacfg.person))
    ds = SocialDataset(scenes, stats, datacfg, "train")
    val_ds = SocialDataset(scenes, stats, datacfg, "val")

    model = TemporalVertexCodec(vcfg)
    rng_np = np.random.RandomState(tcfg.seed)
    batch0 = ds.sample_batch(rng_np, datacfg.batch_size)
    vq = VQState.create(jax.random.PRNGKey(0), vcfg)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(batch0["keyframes"]), vq)
    state = create_train_state(params, tcfg)
    mesh = data_mesh(datacfg.batch_size)
    state = jax.device_put(state, replicated(mesh))
    vq = jax.device_put(vq, replicated(mesh))
    step_fn = jax.jit(make_vq_train_step(model, vcfg.commit_weight))

    ckpt_dir = os.path.join(save_dir, "ckpt")
    from audio2photoreal_tpu.core import rng as rng_util

    rng = rng_util.key(tcfg.seed, tcfg.rng_impl)
    best = float("inf")
    # self-resume: net + optimizer + codebook EMA state + best-val marker
    # (reference train_vq.py:157-165 restores net/optimizer/scheduler)
    state, extra, last = checkpoints.try_resume(
        ckpt_dir, state,
        extra={"vq": jax.device_get(vq)._asdict(), "best": np.zeros((), np.float64)},
    )
    if last is not None:
        vq = VQState(**{k: jnp.asarray(v) for k, v in extra["vq"].items()})
        best = float(extra["best"]) or float("inf")
        print(f"resumed from step {last}")
    from audio2photoreal_tpu.data.loader import make_train_iterator

    import dataclasses

    local_datacfg = dataclasses.replace(
        datacfg, batch_size=dist.local_batch_size(datacfg.batch_size)
    )
    batches = make_train_iterator(
        data_root, stats, local_datacfg, seed=dist.per_process_seed(tcfg.seed)
    )

    def save_payload(step):
        checkpoints.save_train_state(
            ckpt_dir, step, state,
            extra={
                "vq": jax.device_get(vq)._asdict(),
                "best": np.float64(0.0 if best == float("inf") else best),
            },
        )

    for i in range(int(state.step), tcfg.num_steps):
        batch = dist.shard_batch_global(
            mesh, {"keyframes": next(batches)["keyframes"]}
        )
        state, vq, metrics = step_fn(state, vq, batch, rng)  # step folds state.step
        if i % tcfg.log_interval == 0 and coord:
            logger.log(i, {k: float(v) for k, v in metrics.items()})
        if (i + 1) % tcfg.save_interval == 0:
            val = evaluate(model, state.params, vq, val_ds)
            if coord:
                logger.log(i, val)
            if val["val_recon"] < best:
                best = val["val_recon"]
                if coord:
                    checkpoints.save(
                        os.path.join(save_dir, "ckpt_best"), i + 1,
                        {
                            "params": jax.device_get(state.params),
                            "vq": jax.device_get(vq)._asdict(),
                        },
                    )
            if coord:
                save_payload(i + 1)
    if coord:
        save_payload(tcfg.num_steps)
    return state, vq


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--person", default="PXB184")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--total_iter", type=int, default=300_000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--code_dim", type=int, default=1024)
    p.add_argument("--output_emb_width", type=int, default=64)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--save_interval", type=int, default=10_000)
    p.add_argument("--rng_impl", choices=["rbg", "threefry"], default="rbg")
    from audio2photoreal_tpu.parallel import distributed as dist

    dist.add_distributed_args(p)
    args = p.parse_args()
    dist.initialize_from_args(args)  # before any device query

    vcfg = VQConfig(
        nfeats=104, emb_width=args.output_emb_width, code_dim=args.code_dim, depth=args.depth
    )
    datacfg = DataConfig(person=args.person, data_format="pose", batch_size=args.batch_size)
    tcfg = TrainConfig(
        save_dir=args.save_dir, lr=args.lr, num_steps=args.total_iter,
        save_interval=args.save_interval, warmup_steps=1000, rng_impl=args.rng_impl,
    )
    train(args.data_root, args.save_dir, vcfg, datacfg, tcfg)


if __name__ == "__main__":
    main()
