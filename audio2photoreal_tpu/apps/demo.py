"""Interactive demo: microphone/wav → face + pose motion (→ optional render).

Equivalent of ``python -m demo.demo`` (reference: demo/demo.py): mono input
resampled to 48 kHz, trimmed to 4 s multiples, a synthetic near-silent second
channel (N(0, 0.001²), demo.py:174-190), face generation at guidance 10.0 and
pose at 2.0 with guide-keyframe top-p sampling, ddim100.

The reference requires gradio + a GPU; here the pipeline is a plain function
driving the same models (web UI attaches via gradio when installed, else the
CLI renders to results files).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import load_config
from audio2photoreal_tpu.data.dataset import read_wav
from audio2photoreal_tpu.data.stats import DataStats
from audio2photoreal_tpu.diffusion import sampling
from audio2photoreal_tpu.diffusion.respace import maybe_respaced
from audio2photoreal_tpu.models.cfg import cfg_model_fn_cached
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.ops.resample import resample
from audio2photoreal_tpu.train import checkpoints
from audio2photoreal_tpu.apps.generate import GuideKeyframer, find_stats


def prepare_audio(wav: np.ndarray, sr: int, seed: int = 0) -> np.ndarray:
    """mono → 48 kHz stereo with synthetic channel 2, 4 s multiples
    (reference: demo/demo.py:156-190)."""
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    if sr != 48_000:
        wav = np.asarray(resample(jnp.asarray(wav[None]), sr, 48_000))[0]
    four_sec = 4 * 48_000
    n = (len(wav) // four_sec) * four_sec
    if n == 0:
        raise ValueError("need at least 4 seconds of audio")
    wav = wav[:n]
    ch2 = np.random.RandomState(seed).randn(n).astype(np.float32) * 0.001
    return np.stack([wav, ch2], axis=1)


class DemoPipeline:
    """Loads face + pose models once; generates per request
    (reference GradioModel, demo.py:26-69)."""

    def __init__(
        self,
        face_model_path: str,
        pose_model_path: str,
        data_root: str,
        person: str = "PXB184",
        timestep_respacing: str = "ddim100",
        renderer_path: Optional[str] = None,
    ):
        self.stats = find_stats(os.path.join(data_root, person))
        # must be set before _load(): the schedule respacing is read there
        self.respacing = timestep_respacing
        self.face = self._load(face_model_path)
        self.pose = self._load(pose_model_path)
        self.renderer = None
        if renderer_path:
            from audio2photoreal_tpu.apps.render_pipeline import load_body_renderer

            self.renderer = load_body_renderer(renderer_path)
        pcfgs = load_config(pose_model_path)
        self.keyframer: Optional[GuideKeyframer] = None
        guide_dir = os.path.join(pose_model_path, "guide")
        vq_dir = os.path.join(pose_model_path, "vq")
        if os.path.isdir(guide_dir) and os.path.isdir(vq_dir):
            self.keyframer = GuideKeyframer(guide_dir, vq_dir)

    def _load(self, path):
        cfgs = load_config(path)
        if cfgs["denoiser"].frontend_dtype != "float32":
            import dataclasses as _dc

            # inference forces the exact-parity f32 frontend (see generate.py)
            cfgs["denoiser"] = _dc.replace(cfgs["denoiser"], frontend_dtype="float32")
        model = FiLMDenoiser(cfgs["denoiser"])
        restored = checkpoints.restore(os.path.join(path, "ckpt"), None)
        state = restored["state"] if "state" in restored else restored
        params = state["params"]
        sched = maybe_respaced(
            cfgs["diffusion"].schedule, cfgs["diffusion"].steps, self.respacing
        )
        return {"model": model, "params": params, "cfgs": cfgs, "sched": sched}

    def _sample(self, entry, audio_n, kf, kv, guidance, key):
        model, params = entry["model"], entry["params"]
        mcfg = entry["cfgs"]["denoiser"]
        cond = model.apply(
            params, audio_n,
            kf if mcfg.data_format == "pose" else None,
            kv if mcfg.data_format == "pose" else None,
            method=FiLMDenoiser.encode_conditioning,
        )

        def apply_fn(p, x, t, c, keep):
            return model.apply(p, x, t, c, keep, method=FiLMDenoiser.denoise)

        mf = cfg_model_fn_cached(model, params, cond, guidance)
        k1, k2 = jax.random.split(key)
        T = audio_n.shape[1] // 1600
        xT = jax.random.normal(k1, (audio_n.shape[0], T, mcfg.nfeats))
        res = sampling.ddim_sample_loop(entry["sched"], "xstart", mf, xT, k2)
        return res.pred_xstart

    def generate(
        self,
        wav: np.ndarray,
        sr: int,
        *,
        face_guidance: float = 10.0,
        pose_guidance: float = 2.0,
        top_p: float = 0.94,
        seed: int = 0,
    ) -> Dict[str, np.ndarray]:
        """→ {"face": [T, 256], "pose": [T, 104], "audio": [S, 2]}
        (reference: demo.py:113-216 — face first, then pose)."""
        audio = prepare_audio(wav, sr, seed)
        audio_n = jnp.asarray(self.stats.norm_audio(audio))[None]
        key = jax.random.PRNGKey(seed)
        kf_face, kf_pose, k_guide = jax.random.split(key, 3)

        face = self._sample(self.face, audio_n, None, None, face_guidance, kf_face)

        T = audio.shape[0] // 1600
        K = -(-T // 30)
        if self.keyframer is not None:
            kf = self.keyframer(audio_n, K, k_guide, top_p)
            kv = jnp.ones((1, K))
        else:
            kf = jnp.zeros((1, K, 104))
            kv = jnp.zeros((1, K))
        pose = self._sample(self.pose, audio_n, kf, kv, pose_guidance, kf_pose)

        return {
            "face": self.stats.inv_code(np.asarray(face[0])),
            "pose": self.stats.inv_pose(np.asarray(pose[0])),
            "audio": audio,
        }

    def render_video(self, result: Dict[str, np.ndarray], out_path: str) -> str:
        """Photoreal video from a generate() result — the reference demo's
        final stage (demo/demo.py:219-235 renders the generated face + pose
        through BodyRenderer)."""
        assert self.renderer is not None, "DemoPipeline built without renderer_path"
        return self.renderer.render_full_video(
            {
                "body_motion": result["pose"],
                "face_motion": result["face"],
                "audio": result["audio"],
            },
            out_path,
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav", required=True)
    p.add_argument("--face_model", required=True)
    p.add_argument("--pose_model", required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--person", default="PXB184")
    p.add_argument("--out", default="demo_out")
    p.add_argument("--top_p", type=float, default=0.94)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--renderer_path", default=None,
                   help="ca_body renderer bundle — renders the demo video "
                        "(reference demo/demo.py:219-235)")
    args = p.parse_args()

    pipe = DemoPipeline(args.face_model, args.pose_model, args.data_root, args.person,
                        renderer_path=args.renderer_path)
    wav = read_wav(args.wav)
    out = pipe.generate(wav, 48_000, top_p=args.top_p, seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "demo_results.npy"), out)
    print(f"saved {args.out}/demo_results.npy "
          f"(face {out['face'].shape}, pose {out['pose'].shape})")
    if pipe.renderer is not None:
        video = pipe.render_video(out, os.path.join(args.out, "demo_video"))
        print(f"rendered {video}")

    try:  # optional web UI (the reference's gradio front-end, demo.py:238-276)
        import gradio as gr

        def fn(audio_tuple, top_p):
            sr, wav = audio_tuple
            res = pipe.generate(wav.astype(np.float32) / 32768.0, sr, top_p=top_p)
            return str({k: v.shape for k, v in res.items()})

        gr.Interface(
            fn, [gr.Audio(), gr.Slider(0.6, 1.0, value=0.94)], "text"
        ).launch()
    except ImportError:
        pass


if __name__ == "__main__":
    main()
