"""Guide-transformer trainer CLI.

Equivalent of ``python -m train.train_guide`` (reference: train/train_guide.py):
frozen VQ codec tokenizes 1 fps keyframes, the guide LM is trained with
teacher forcing + label-smoothed CE; periodic val CE / token accuracy /
decoded-L2.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import DataConfig, GuideConfig, TrainConfig, load_config, save_config
from audio2photoreal_tpu.data.dataset import SocialDataset, load_local_data
from audio2photoreal_tpu.models.guide import GuideTransformer
from audio2photoreal_tpu.models.vqvae import TemporalVertexCodec, VQState
from audio2photoreal_tpu.train import checkpoints
from audio2photoreal_tpu.train.logging import KVLogger
from audio2photoreal_tpu.train.loops import make_guide_train_step
from audio2photoreal_tpu.train.state import create_train_state
from audio2photoreal_tpu.apps.generate import find_stats


def load_tokenizer(vq_dir: str):
    """Frozen codec from a VQ checkpoint dir (reference setup_tokenizer,
    model/vqvae.py:18-34 — config re-hydrated from the sidecar)."""
    vcfg = load_config(vq_dir)["vq"]
    codec = TemporalVertexCodec(vcfg)
    restored = checkpoints.restore(os.path.join(vq_dir, "ckpt"), None)
    # both payload layouts: pre-self-resume {"params",...} and full-state
    # {"state": {"params",...},...} (train_vq.py save_payload)
    params = restored["params"] if "params" in restored else restored["state"]["params"]
    vq = VQState(
        embed=jnp.asarray(restored["vq"]["embed"]),
        embed_avg=jnp.asarray(restored["vq"]["embed_avg"]),
        cluster_size=jnp.asarray(restored["vq"]["cluster_size"]),
        inited=jnp.asarray(True),
    )
    return codec, params, vq, vcfg


def train(
    data_root: str, save_dir: str, vq_dir: str,
    gcfg: GuideConfig, datacfg: DataConfig, tcfg: TrainConfig,
    cache_audio_features: bool = False,
):
    from audio2photoreal_tpu.parallel import distributed as dist
    from audio2photoreal_tpu.parallel.mesh import data_mesh
    from audio2photoreal_tpu.parallel.sharding import replicated

    coord = dist.is_coordinator()
    codec, vparams, vq, vcfg = load_tokenizer(vq_dir)
    gcfg = GuideConfig(**{**gcfg.__dict__, "tokens": vcfg.code_dim, "vq_depth": vcfg.depth})
    if coord:
        os.makedirs(save_dir, exist_ok=True)
        save_config(save_dir, guide=gcfg, data=datacfg, train=tcfg)
    logger = KVLogger(save_dir, tensorboard=True) if coord else None

    scenes = load_local_data(data_root, datacfg.person)
    stats = find_stats(os.path.join(data_root, datacfg.person))
    ds = SocialDataset(scenes, stats, datacfg, "train")

    model = GuideTransformer(gcfg)
    rng_np = np.random.RandomState(tcfg.seed)
    batch0 = ds.sample_batch(rng_np, datacfg.batch_size)
    K = batch0["keyframes"].shape[1]
    tokens0 = jnp.zeros((datacfg.batch_size, K * vcfg.depth), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        tokens0, jnp.asarray(batch0["audio"]),
    )
    state = create_train_state(params, tcfg)
    # DP mesh over all devices (all hosts' devices when multi-process): params
    # replicated, batch dim-0 sharded — XLA inserts the gradient psum
    mesh = data_mesh(datacfg.batch_size)
    state = jax.device_put(state, replicated(mesh))

    def tokenize(kf):
        return codec.apply(vparams, kf, vq, method=TemporalVertexCodec.encode)

    step_fn = jax.jit(make_guide_train_step(model, tokenize, vcfg.depth))
    ckpt_dir = os.path.join(save_dir, "ckpt")
    from audio2photoreal_tpu.core import rng as rng_util

    rng = rng_util.key(tcfg.seed, tcfg.rng_impl)
    # self-resume: iteration + model + optimizer, like the reference's
    # --resume_trans path (train_guide.py:54-62,281-293)
    state, _, last = checkpoints.try_resume(ckpt_dir, state)
    if last is not None:
        print(f"resumed from step {last}")
    from audio2photoreal_tpu.data.loader import make_train_iterator

    feature_cache = None
    if cache_audio_features:
        from audio2photoreal_tpu.data.feature_cache import (
            build_cache_for_index,
            make_frontend_apply,
        )
        from audio2photoreal_tpu.data.loader import SceneIndex
        from audio2photoreal_tpu.models.audio_encoder import Wav2VecFeatureExtractor

        fe = Wav2VecFeatureExtractor(compute_dtype=gcfg.frontend_dtype)
        index = SceneIndex(
            data_root, datacfg.person, "train", datacfg.num_val_seqs, datacfg.num_test_seqs
        )
        feature_cache = build_cache_for_index(
            index,
            stats.norm_audio,
            make_frontend_apply(fe, state.params["params"]["audio_frontend"]),
        )

    import dataclasses

    local_datacfg = dataclasses.replace(
        datacfg, batch_size=dist.local_batch_size(datacfg.batch_size)
    )
    batches = make_train_iterator(
        data_root, stats, local_datacfg,
        seed=dist.per_process_seed(tcfg.seed), feature_cache=feature_cache,
    )
    keys = ("keyframes", "keyframe_valid", "audio", "audio_features")
    for i in range(int(state.step), tcfg.num_steps):
        b = next(batches)
        batch = dist.shard_batch_global(mesh, {k: v for k, v in b.items() if k in keys})
        state, metrics = step_fn(state, batch, rng)  # step folds state.step
        if i % tcfg.log_interval == 0 and coord:
            logger.log(i, {k: float(v) for k, v in metrics.items()})
        if (i + 1) % tcfg.save_interval == 0 and coord:
            checkpoints.save_train_state(ckpt_dir, i + 1, state)
    if coord:
        checkpoints.save_train_state(ckpt_dir, tcfg.num_steps, state)
    return state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--resume_pth", required=True, help="VQ checkpoint dir")
    p.add_argument("--person", default="PXB184")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_steps", type=int, default=100_000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--max_seq_length", type=int, default=240)
    p.add_argument("--save_interval", type=int, default=10_000)
    p.add_argument("--rng_impl", choices=["rbg", "threefry"], default="rbg")
    p.add_argument("--frontend_dtype", choices=["float32", "bfloat16"], default="float32",
                   help="frozen wav2vec frontend matmul dtype (bfloat16 = ~3x faster)")
    p.add_argument("--cache_audio_features", action="store_true",
                   help="precompute frozen wav2vec features per scene "
                        "(data/feature_cache.py) — removes the frontend from every step")
    from audio2photoreal_tpu.parallel import distributed as dist

    dist.add_distributed_args(p)
    args = p.parse_args()
    dist.initialize_from_args(args)  # before any device query

    gcfg = GuideConfig(
        latent_dim=args.dim, num_layers=args.layers, frontend_dtype=args.frontend_dtype
    )
    datacfg = DataConfig(
        person=args.person, data_format="pose", batch_size=args.batch_size,
        max_seq_length=args.max_seq_length, min_seq_length=args.max_seq_length,
    )
    tcfg = TrainConfig(
        save_dir=args.save_dir, lr=args.lr, num_steps=args.num_steps,
        save_interval=args.save_interval, grad_clip=1.0, warmup_steps=1000,
        rng_impl=args.rng_impl,
    )
    train(args.data_root, args.save_dir, args.resume_pth, gcfg, datacfg, tcfg,
          cache_audio_features=args.cache_audio_features)


if __name__ == "__main__":
    main()
