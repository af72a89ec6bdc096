"""GT visualization CLI: render ground-truth annotations to video.

Equivalent of ``python -m visualize.render_anno`` (reference:
visualize/render_anno.py:22-58): chunk dataset sequences and render each with
the BodyRenderer.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from audio2photoreal_tpu.core.config import DataConfig
from audio2photoreal_tpu.data.dataset import SocialDataset, load_local_data
from audio2photoreal_tpu.apps.generate import find_stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--person", default="PXB184")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--max_seq_length", type=int, default=600)
    p.add_argument("--assets", default=None, help="static_assets.pt for the renderer")
    p.add_argument("--body_ckpt", default=None, help="converted body_dec checkpoint")
    args = p.parse_args()

    scenes = load_local_data(args.data_root, args.person)
    stats = find_stats(os.path.join(args.data_root, args.person))
    cfg = DataConfig(
        person=args.person, data_format="pose",
        max_seq_length=args.max_seq_length, min_seq_length=args.max_seq_length,
    )
    ds = SocialDataset(scenes, stats, cfg, "test")
    os.makedirs(args.save_dir, exist_ok=True)

    renderer = None
    if args.assets and args.body_ckpt:
        from audio2photoreal_tpu.render.assets import convert_static_assets
        from audio2photoreal_tpu.render.mesh_vae import RendererConfig
        from audio2photoreal_tpu.apps.render_pipeline import BodyRenderer, Camera
        import orbax.checkpoint  # noqa: F401
        from audio2photoreal_tpu.train import checkpoints

        rcfg = RendererConfig()
        assets = convert_static_assets(args.assets, rcfg)
        params = checkpoints.restore(args.body_ckpt, None)["params"]
        cam = Camera(
            campos=np.array([0.0, -3.0, 1.0], np.float32),
            K=np.array([[800.0, 0, 333], [0, 800.0, 512], [0, 0, 1]], np.float32),
            Rt=np.array([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], np.float32),
        )
        renderer = BodyRenderer(rcfg, assets, params, {"default": cam})

    for i in range(len(ds)):
        ex = ds.get_chunk(i)
        pose = stats.inv_pose(ex["motion"][: int(ex["lengths"])])
        out = os.path.join(args.save_dir, f"anno_{i:04d}")
        if renderer is None:
            # no renderer assets: dump the GT pose/audio block (renderable later)
            np.savez(out + ".npz", pose=pose, audio=stats.inv_audio(ex["audio"]))
            print(f"saved {out}.npz")
        else:
            face = np.zeros((len(pose), 256), np.float32)
            video = renderer.render_full_video(
                {"body_motion": pose, "face_motion": face,
                 "audio": stats.inv_audio(ex["audio"])},
                out,
            )
            print(f"rendered {video}")


if __name__ == "__main__":
    main()
