"""Convergence A/B: hash-position dropout vs nn.Dropout (VERDICT r4 weak #2).

`hash_drop_mult` is documented as same-LAW-different-STREAM relative to
nn.Dropout's rng_bit_generator draws (COVERAGE.md round 4); the unit test
(test_precision.py:152) pins the mask semantics but not the training-dynamics
question: do the two mask sources give overlapping loss curves?  This probe
trains the SAME tiny pose denoiser twice — identical init, identical data
stream, identical timestep/noise streams (the trainer folds one base key by
state.step, train/loops.py:58) — flipping ONLY `DenoiserConfig.hash_dropout`,
and prints bucketed mean losses plus the final-window gap.

Run:  python tools/probe_hash_dropout_ab.py [n_steps]
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp

from audio2photoreal_tpu.core.config import DataConfig  # noqa: F401 (parity of imports)
from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig, TrainConfig
from audio2photoreal_tpu.diffusion.schedules import make_schedule
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.train.loops import make_diffusion_train_step
from audio2photoreal_tpu.train.state import create_train_state


def make_batches(n_batches=8, B=8, T=60, nfeats=104, seed=0):
    """Smooth sinusoid-mixture motion (so denoising has real structure to
    learn) with keyframes cut FROM the motion (so the cross-attention
    conditioning is informative and its dropout matters)."""
    rng = np.random.RandomState(seed)
    tgrid = np.arange(T)[None, :, None]
    batches = []
    for _ in range(n_batches):
        w = rng.uniform(0.02, 0.3, (B, 1, nfeats))
        ph = rng.uniform(0, 2 * np.pi, (B, 1, nfeats))
        amp = rng.randn(B, 1, nfeats)
        motion = (amp * np.sin(w * tgrid + ph)).astype(np.float32)
        kf = motion[:, ::30]
        batches.append(
            dict(
                motion=jnp.asarray(motion),
                mask=jnp.ones((B, T)),
                audio=jnp.asarray(rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1),
                keyframes=jnp.asarray(kf),
                keyframe_valid=jnp.ones((B, kf.shape[1])),
            )
        )
    return batches


def run(batches, hash_dropout: bool, n_steps: int, latent=64, ff=128, layers=2):
    cfg = DenoiserConfig(
        data_format="pose", nfeats=104, latent_dim=latent, ff_size=ff,
        num_layers=layers, num_heads=4, max_seq_length=60, dropout=0.2,
        hash_dropout=hash_dropout,
    )
    model = FiLMDenoiser(cfg)
    b0 = batches[0]
    B = b0["motion"].shape[0]
    params = model.init(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        b0["motion"], jnp.zeros((B,), jnp.int32), b0["audio"],
        b0["keyframes"], b0["keyframe_valid"],
    )
    state = create_train_state(params, TrainConfig(lr=3e-4))
    step = jax.jit(
        make_diffusion_train_step(model, make_schedule("cosine", 1000), DiffusionConfig())
    )
    base_key = jax.random.PRNGKey(100)  # folded by state.step inside the step
    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, batches[i % len(batches)], base_key)
        losses.append(float(m["loss"]))
    dt = time.perf_counter() - t0
    return np.asarray(losses), dt


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    batches = make_batches()
    curves = {}
    for mode in (False, True):
        losses, dt = run(batches, mode, n_steps)
        curves["hash" if mode else "rng"] = losses
        print(f"{'hash' if mode else 'rng '}: {n_steps} steps in {dt:.1f}s")
    bucket = max(n_steps // 8, 1)
    print(f"\n{'bucket':>10} {'rng':>10} {'hash':>10} {'gap%':>8}")
    for i in range(0, n_steps, bucket):
        a = curves["rng"][i : i + bucket].mean()
        b = curves["hash"][i : i + bucket].mean()
        print(f"{i:>6}-{min(i + bucket, n_steps):<4} {a:>10.4f} {b:>10.4f} "
              f"{100 * (b - a) / max(abs(a), 1e-9):>7.2f}%")
    w = max(n_steps // 4, 1)
    a, b = curves["rng"][-w:].mean(), curves["hash"][-w:].mean()
    drop = curves["rng"][: max(n_steps // 20, 1)].mean() - min(a, b)
    print(f"\nfinal-{w} means: rng {a:.4f}  hash {b:.4f}  "
          f"|gap| {abs(a - b):.4f} = {100 * abs(a - b) / max(drop, 1e-9):.1f}% of the loss drop")


if __name__ == "__main__":
    main()
