"""BodyRenderer: (pose, face codes) sequences → photoreal video.

Equivalent of visualize/render_codes.py: loads per-person renderer assets +
avatar params, then renders each frame with the BodyAvatar and muxes video +
audio.  TPU-native twist: frames are processed in fixed-size jitted batches
(one compile) instead of the reference's per-frame Python loop
(render_codes.py:97-127).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.color import linear2display_batch
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererAssets, RendererConfig
from audio2photoreal_tpu.render.video import write_video


@dataclass
class Camera:
    campos: np.ndarray  # [3]
    K: np.ndarray  # [3, 3]
    Rt: np.ndarray  # [3, 4]


class BodyRenderer:
    """render_full_video equivalent (render_codes.py:129-163)."""

    def __init__(
        self,
        cfg: RendererConfig,
        assets: RendererAssets,
        params,
        cameras: Dict[str, Camera],
        frame_batch: int = 8,
    ):
        self.cfg = cfg
        self.model = BodyAvatar(cfg, assets)
        self.params = params
        self.cameras = cameras
        self.frame_batch = frame_batch

        def render_frames(params, motion, face_embs, campos, K, Rt):
            preds = self.model.apply(
                params, motion, campos,
                embs=jnp.zeros((motion.shape[0], cfg.n_embs)),
                face_embs_body=face_embs,
                K=K, Rt=Rt,
                encode=False, use_pose_shadow=True, render=True,
            )
            return linear2display_batch(preds["rgb"])

        self._render = jax.jit(render_frames)

    def render_sequence(
        self,
        pose: np.ndarray,  # [T, 104]
        face_embs_body: np.ndarray,  # [T, n_face_embs] body-space face embs
        camera_name: Optional[str] = None,
    ) -> np.ndarray:
        """→ uint8 frames [T, H, W, 3]."""
        cam = self.cameras[camera_name or next(iter(self.cameras))]
        T = len(pose)
        fb = self.frame_batch
        pad = (-T) % fb
        pose_p = np.concatenate([pose, np.repeat(pose[-1:], pad, 0)], 0)
        face_p = np.concatenate([face_embs_body, np.repeat(face_embs_body[-1:], pad, 0)], 0)
        frames = []
        for i in range(0, len(pose_p), fb):
            m = jnp.asarray(pose_p[i : i + fb])
            f = jnp.asarray(face_p[i : i + fb])
            B = m.shape[0]
            out = self._render(
                self.params, m, f,
                jnp.asarray(np.tile(cam.campos, (B, 1))),
                jnp.asarray(np.tile(cam.K, (B, 1, 1))),
                jnp.asarray(np.tile(cam.Rt, (B, 1, 1))),
            )
            frames.append(np.asarray(out, np.uint8))
        return np.concatenate(frames, 0)[:T]

    def render_sequence_multicam(
        self, pose: np.ndarray, face_embs_body: np.ndarray
    ) -> np.ndarray:
        """Side-by-side frames across all cameras — the reference renders two
        views per frame (render_codes.py:115-126)."""
        views = [
            self.render_sequence(pose, face_embs_body, name) for name in self.cameras
        ]
        return np.concatenate(views, axis=2)  # stack along width

    def render_full_video(
        self,
        data_block: Dict[str, np.ndarray],  # {"pose": [T,104], "face": [T,E], "audio": [S,2]}
        out_path: str,
        audio_sr: int = 48_000,
        fps: int = 30,
    ) -> str:
        frames = self.render_sequence(data_block["pose"], data_block["face"])
        return write_video(
            out_path if out_path.endswith(".mp4") else out_path + ".mp4",
            list(frames),
            fps=fps,
            audio=data_block.get("audio"),
            audio_sr=audio_sr,
        )
