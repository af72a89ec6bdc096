"""Batch inference CLI — the flagship sampling path.

Equivalent of ``python -m sample.generate`` (reference: sample/generate.py):
re-hydrate configs from the checkpoint's sidecar, take test-split chunks,
(pose) replace GT keyframes with guide-transformer generations, run DDIM with
classifier-free guidance, inverse-normalize, save ``results.npy`` in the
reference layout {motions, audio, gt, lengths, keyframes}
(sample/generate.py:146-152,290-292 — motions as [B, C, 1, T]).

TPU-native structure: conditioning is encoded once per batch, the DDIM loop
is one compiled scan with batched CFG, and batches are padded to the chunk
length so the jit compiles once.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import (
    DataConfig,
    DenoiserConfig,
    DiffusionConfig,
    GuideConfig,
    VQConfig,
    load_config,
)
from audio2photoreal_tpu.data.dataset import SocialDataset, load_local_data
from audio2photoreal_tpu.data.stats import DataStats
from audio2photoreal_tpu.diffusion import sampling
from audio2photoreal_tpu.diffusion.respace import maybe_respaced
from audio2photoreal_tpu.models.cfg import cfg_model_fn_cached
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.models.guide import GuideTransformer
from audio2photoreal_tpu.models.vqvae import TemporalVertexCodec, VQState
from audio2photoreal_tpu.train import checkpoints


def find_stats(person_dir: str) -> DataStats:
    for name in ("data_stats.npz", "data_stats.pth"):
        p = os.path.join(person_dir, name)
        if os.path.exists(p):
            return DataStats.load(p)
    raise FileNotFoundError(f"no data stats under {person_dir}")


class GuideKeyframer:
    """Replaces GT keyframes with guide-LM generations decoded by the frozen
    VQ codec (reference: sample/generate.py:51-71 _replace_keyframes)."""

    def __init__(self, guide_ckpt: str, vq_ckpt: str):
        gcfgs = load_config(guide_ckpt)
        self.gcfg: GuideConfig = gcfgs["guide"]
        vcfgs = load_config(vq_ckpt)
        self.vcfg: VQConfig = vcfgs["vq"]
        self.guide = GuideTransformer(self.gcfg)
        self.codec = TemporalVertexCodec(self.vcfg)
        g = checkpoints.restore(os.path.join(guide_ckpt, "ckpt"), None)
        self.gparams = g["params"] if "params" in g else g["state"]["params"]
        v = checkpoints.restore(os.path.join(vq_ckpt, "ckpt"), None)
        self.vparams = v["params"] if "params" in v else v["state"]["params"]
        self.vq_state = VQState(
            embed=jnp.asarray(v["vq"]["embed"]),
            embed_avg=jnp.asarray(v["vq"]["embed_avg"]),
            cluster_size=jnp.asarray(v["vq"]["cluster_size"]),
            inited=jnp.asarray(True),
        )

    def __call__(self, audio: jnp.ndarray, num_keyframes: int, key, top_p: float = 0.94):
        import functools

        @functools.partial(jax.jit, static_argnums=(2,))
        def _gen(p, a, n, k):
            return self.guide.apply(
                p, a, n * self.vcfg.depth, k, top_p=top_p,
                method=GuideTransformer.generate,
            )

        tokens = _gen(self.gparams, audio, num_keyframes, key)
        codes = tokens.reshape(audio.shape[0], num_keyframes, self.vcfg.depth)
        return self.codec.apply(
            self.vparams, codes, self.vq_state, method=TemporalVertexCodec.decode
        )


def generate(
    model_path: str,
    data_root: str,
    *,
    num_samples: int = 5,
    num_repetitions: int = 1,
    guidance_param: float = 2.0,
    timestep_respacing: str = "ddim500",
    guide_path: Optional[str] = None,
    vq_path: Optional[str] = None,
    top_p: float = 0.94,
    seed: int = 10,
    output_dir: Optional[str] = None,
    use_ema: bool = False,
    plot: bool = False,
    face_codes: Optional[str] = None,
    renderer_path: Optional[str] = None,
    render_gt: bool = False,
) -> str:
    cfgs = load_config(model_path)
    mcfg: DenoiserConfig = cfgs["denoiser"]
    dcfg: DiffusionConfig = cfgs["diffusion"]
    datacfg: DataConfig = cfgs["data"]
    if mcfg.frontend_dtype != "float32":
        # the frozen wav2vec frontend may train in bf16 (speed), but inference
        # holds the 1e-3-of-reference parity target — force exact f32
        import dataclasses as _dc

        mcfg = _dc.replace(mcfg, frontend_dtype="float32")

    model = FiLMDenoiser(mcfg)
    restored = checkpoints.restore(os.path.join(model_path, "ckpt"), None)
    state = restored["state"] if "state" in restored else restored
    params = state.get("ema_params") if use_ema else None
    if use_ema and params is None:
        import warnings

        warnings.warn(
            f"use_ema=True but {model_path} has no ema_params — falling back "
            "to raw params (was the model trained with ema_decay=0?)"
        )
    params = params or state["params"]

    scenes = load_local_data(data_root, datacfg.person)
    stats = find_stats(os.path.join(data_root, datacfg.person))
    ds = SocialDataset(scenes, stats, datacfg, "test")

    sched = maybe_respaced(dcfg.schedule, dcfg.steps, timestep_respacing)
    keyframer = None
    if mcfg.data_format == "pose" and guide_path and vq_path:
        keyframer = GuideKeyframer(guide_path, vq_path)

    rng = jax.random.PRNGKey(seed)
    n = min(num_samples, len(ds))
    batch = {k: np.stack([ds.get_chunk(i)[k] for i in range(n)]) for k in ds.get_chunk(0)}
    audio = jnp.asarray(batch["audio"])
    gt = jnp.asarray(batch["motion"])
    B, T, C = gt.shape

    def apply_denoise(p, x, t, cond, keep):
        return model.apply(p, x, t, cond, keep, method=FiLMDenoiser.denoise)

    # jit with params as ARGUMENTS (constants would bloat the executable)
    enc = jax.jit(
        lambda p, a, kf, kv: model.apply(
            p, a, kf, kv, method=FiLMDenoiser.encode_conditioning
        )
    )

    @jax.jit
    def run_ddim(p, cond, xT, key):
        # cached CFG: the conditioning cross-K/V and FiLM vector are computed
        # once per clip, outside the 500-step scan (cfg.py:cfg_model_fn_cached)
        model_fn = cfg_model_fn_cached(model, p, cond, guidance_param)
        return sampling.ddim_sample_loop(sched, dcfg.predict, model_fn, xT, key)

    all_motions, all_keyframes = [], []
    for rep in range(num_repetitions):
        rng, k_guide, k_noise, k_samp = jax.random.split(rng, 4)
        kf = jnp.asarray(batch.get("keyframes", np.zeros((B, 0, 104), np.float32)))
        kv = jnp.asarray(batch.get("keyframe_valid", np.zeros((B, 0), np.float32)))
        if keyframer is not None:
            kf = keyframer(audio, kf.shape[1], k_guide, top_p)
            kv = jnp.ones_like(kv)
        cond = enc(
            params, audio,
            kf if mcfg.data_format == "pose" else None,
            kv if mcfg.data_format == "pose" else None,
        )
        xT = jax.random.normal(k_noise, (B, T, C))
        res = run_ddim(params, cond, xT, k_samp)
        sample = res.pred_xstart  # reference returns final pred_xstart (:862)
        if mcfg.data_format == "pose":
            motion = stats.inv_pose(np.asarray(sample))
            all_keyframes.append(stats.inv_pose(np.asarray(kf)))
        else:
            motion = stats.inv_code(np.asarray(sample))
        all_motions.append(motion)

    motions = np.concatenate(all_motions, 0)
    out_dir = output_dir or os.path.join(
        model_path, f"samples_{timestep_respacing}_seed{seed}"
    )
    os.makedirs(out_dir, exist_ok=True)
    inv = stats.inv_pose if mcfg.data_format == "pose" else stats.inv_code
    results = {
        # reference layout: [B, C, 1, T] (sample/generate.py:146-152)
        "motions": motions.transpose(0, 2, 1)[:, :, None, :],
        "gt": inv(np.asarray(gt)).transpose(0, 2, 1)[:, :, None, :],
        "audio": stats.inv_audio(np.asarray(audio)),
        "lengths": np.asarray(batch["lengths"]),
    }
    if all_keyframes:
        results["keyframes"] = np.concatenate(all_keyframes, 0)
    out_path = os.path.join(out_dir, "results.npy")
    np.save(out_path, results)

    if plot:
        _render_pred(
            results,
            face_codes_path=face_codes,
            renderer_path=renderer_path,
            out_dir=out_dir,
            num_samples=n,
            num_repetitions=num_repetitions,
            render_gt=render_gt,
            audio_per_frame=datacfg.audio_per_frame,
        )
    return out_path


def _render_pred(
    results: dict,
    *,
    face_codes_path: Optional[str],
    renderer_path: Optional[str],
    out_dir: str,
    num_samples: int,
    num_repetitions: int,
    render_gt: bool,
    audio_per_frame: int = 1600,
) -> None:
    """Photoreal-render the generated motion (reference sample/generate.py:
    155-207 _render_pred): pair each pose sample with its face-codes sample,
    verify the audio matches, and write per-sample video(s)."""
    from audio2photoreal_tpu.apps.render_pipeline import load_body_renderer

    assert renderer_path, "--plot requires --renderer_path (converted ca_body bundle)"
    assert face_codes_path, "--plot requires --face_codes (face model results.npy)"
    face_res = np.load(face_codes_path, allow_pickle=True).item()
    face_motions = face_res["motions"]
    face_gts = face_res.get("gt")
    face_audio = face_res["audio"]

    renderer = load_body_renderer(renderer_path)
    B = num_samples
    for sample_i in range(num_samples):
        for rep_i in range(num_repetitions):
            idx = rep_i * B + sample_i
            length = int(results["lengths"][idx])
            body_motion = results["motions"][idx].transpose(2, 0, 1)[:length].squeeze(-1)
            face_motion = face_motions[idx].transpose(2, 0, 1)[:length].squeeze(-1)
            # face/pose runs must be conditioned on the SAME audio
            # (sample/generate.py:187-189)
            assert np.array_equal(
                results["audio"][idx], face_audio[idx]
            ), "face audio is not the same"
            audio = results["audio"][idx][: length * audio_per_frame]
            block = {
                "audio": audio,
                "body_motion": body_motion,
                "face_motion": face_motion,
            }
            if render_gt:
                block["gt_body"] = (
                    results["gt"][idx].transpose(2, 0, 1)[:length].squeeze(-1)
                )
                block["gt_face"] = face_gts[idx].transpose(2, 0, 1)[:length].squeeze(-1)
            save_base = os.path.join(out_dir, f"sample{sample_i:02d}_rep{rep_i:02d}")
            renderer.render_full_video(block, save_base, render_gt=False)
            if render_gt:
                renderer.render_full_video(block, save_base, render_gt=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True, help="checkpoint dir with config.json + ckpt/")
    p.add_argument("--data_root", required=True)
    p.add_argument("--num_samples", type=int, default=5)
    p.add_argument("--num_repetitions", type=int, default=1)
    p.add_argument("--guidance_param", type=float, default=2.0)
    p.add_argument("--timestep_respacing", default="ddim500")
    p.add_argument("--resume_trans", default=None, help="guide checkpoint dir")
    p.add_argument("--resume_vq", default=None, help="VQ checkpoint dir")
    p.add_argument("--top_p", type=float, default=0.94)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--plot", action="store_true",
                   help="photoreal-render the samples (sample/generate.py:155-207)")
    p.add_argument("--face_codes", default=None,
                   help="face model results.npy for --plot")
    p.add_argument("--renderer_path", default=None,
                   help="converted ca_body renderer bundle dir for --plot")
    p.add_argument("--render_gt", action="store_true",
                   help="also render the ground-truth pane (render_codes.py:129-163)")
    args = p.parse_args()
    out = generate(
        args.model_path,
        args.data_root,
        num_samples=args.num_samples,
        num_repetitions=args.num_repetitions,
        guidance_param=args.guidance_param,
        timestep_respacing=args.timestep_respacing,
        guide_path=args.resume_trans,
        vq_path=args.resume_vq,
        top_p=args.top_p,
        seed=args.seed,
        output_dir=args.output_dir,
        plot=args.plot,
        face_codes=args.face_codes,
        renderer_path=args.renderer_path,
        render_gt=args.render_gt,
    )
    print(f"saved {out}")


if __name__ == "__main__":
    main()
