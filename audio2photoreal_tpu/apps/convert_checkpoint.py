"""Convert released reference checkpoints → TPU framework checkpoint dirs.

The reference user's flow is ``scripts/download_allmodels.sh`` → a
``checkpoints/`` tree of torch ``.pt`` files, each re-hydrated from the
sidecar ``args.json`` next to it (reference: README.md:178-198, demo/demo.py
:26-66, model/vqvae.py:18-31, model/diffusion.py:244-269,
visualize/render_codes.py:60-90).  This CLI is the switch-over path: point it
at that tree and it emits this framework's checkpoint dirs (``config.json``
sidecar + orbax ``ckpt/``) that ``apps/generate.py`` / ``apps/demo.py`` /
``apps/render_pipeline.py`` consume directly.

Per-model usage (paths follow the reference README conventions)::

    python -m audio2photoreal_tpu.apps.convert_checkpoint \
        --diffusion checkpoints/diffusion/c1_pose/model000340000.pt --out out/c1_pose
    python -m audio2photoreal_tpu.apps.convert_checkpoint \
        --vq checkpoints/vq/c1_vq/net_iter300000.pth --out out/c1_vq
    python -m audio2photoreal_tpu.apps.convert_checkpoint \
        --guide checkpoints/guide/c1_pose/checkpoints/iter-0100000.pt \
        --vq_args checkpoints/vq/c1_vq/args.json --out out/c1_guide
    python -m audio2photoreal_tpu.apps.convert_checkpoint \
        --avatar checkpoints/ca_body/data/PXB184 \
        --render_defaults assets/render_defaults_PXB184.pth --out out/renderer

or convert a whole person in one shot (mirrors download_allmodels.sh)::

    python -m audio2photoreal_tpu.apps.convert_checkpoint \
        --checkpoints_root checkpoints/ --person PXB184 --out converted/

Torch is only needed host-side to read the blobs; nothing here touches a
device.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from audio2photoreal_tpu.core.config import (
    DataConfig,
    DenoiserConfig,
    DiffusionConfig,
    GuideConfig,
    VQConfig,
    save_config,
)
from audio2photoreal_tpu.train import checkpoints
from audio2photoreal_tpu.train.convert import (
    convert_body_avatar,
    convert_film_denoiser,
    convert_guide,
    convert_lip_regressor,
    convert_vqvae,
)


def _load_torch(path: str) -> Any:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _to_numpy_tree(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _args_json(near: str) -> Dict[str, Any]:
    d = near if os.path.isdir(near) else os.path.dirname(near)
    p = os.path.join(d, "args.json")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"no args.json next to {near} — the reference keeps one beside every "
            "checkpoint (README.md:198)"
        )
    with open(p) as f:
        return json.load(f)


def _person_from_root(data_root: str) -> str:
    # "dataset/PXB184/" → "PXB184" (reference utils/misc get_person_num role)
    return os.path.basename(os.path.normpath(data_root)) if data_root else "PXB184"


# ------------------------------------------------------------------ #
# diffusion (face / pose FiLMTransformer)
# ------------------------------------------------------------------ #


def convert_diffusion_checkpoint(model_path: str, out_dir: str) -> str:
    """model00XXXX.pt + sibling args.json → denoiser checkpoint dir.

    Mirrors utils/model_util.py:41-115: nfeats/latent_dim derive from
    data_format, steps=1000, predict_xstart, MSE, sigma_small→FIXED_SMALL."""
    args = _args_json(model_path)
    fmt = args["data_format"]
    num_audio_layers = int(args.get("num_audio_layers", 3))
    mcfg = DenoiserConfig(
        data_format=fmt,
        nfeats=256 if fmt == "face" else 104,
        latent_dim=512 if fmt == "face" else 256,
        ff_size=1024,
        num_layers=int(args["layers"]),
        num_heads=int(args["heads"]),
        cond_feature_dim=1024,
        max_seq_length=int(args.get("max_seq_length", 600)),
        use_rotary=not args.get("not_rotary", False),
        cond_encoder_layers=num_audio_layers,
    )
    dcfg = DiffusionConfig(
        steps=1000,
        schedule=args.get("noise_schedule", "cosine"),
        predict="xstart",
        var_type="fixed_small" if args.get("sigma_small", True) else "fixed_large",
        timestep_respacing="",
        lambda_vel=float(args.get("lambda_vel", 0.0)),
    )
    datacfg = DataConfig(
        data_root=args.get("data_root", ""),
        person=_person_from_root(args.get("data_root", "")),
        data_format=fmt,
        max_seq_length=int(args.get("max_seq_length", 600)),
        add_frame_cond=args.get("add_frame_cond"),
    )
    sd = _to_numpy_tree(_load_torch(model_path))
    params = convert_film_denoiser(
        sd, fmt, mcfg.num_layers, cond_encoder_layers=num_audio_layers
    )
    os.makedirs(out_dir, exist_ok=True)
    save_config(out_dir, denoiser=mcfg, diffusion=dcfg, data=datacfg)
    checkpoints.save(os.path.join(out_dir, "ckpt"), 0, {"params": params}, block=True)
    print(f"[diffusion:{fmt}] {model_path} -> {out_dir}")
    return out_dir


# ------------------------------------------------------------------ #
# VQ tokenizer
# ------------------------------------------------------------------ #


def convert_vq_checkpoint(net_path: str, out_dir: str) -> str:
    """net_iterXXXX.pth + sibling args.json → VQ checkpoint dir
    (model/vqvae.py:18-31 setup_tokenizer contract: ckpt key "net")."""
    args = _args_json(net_path)
    vcfg = VQConfig(
        nfeats=int(args.get("nb_joints", 104)),
        emb_width=int(args["output_emb_width"]),
        code_dim=int(args["code_dim"]),
        depth=int(args["depth"]),
    )
    ckpt = _load_torch(net_path)
    sd = _to_numpy_tree(ckpt["net"] if "net" in ckpt else ckpt)
    params, vq = convert_vqvae(sd, vcfg.depth)
    datacfg = DataConfig(
        data_root=args.get("data_root", ""),
        person=_person_from_root(args.get("data_root", "")),
        data_format=args.get("data_format", "pose"),
        max_seq_length=int(args.get("max_seq_length", 600)),
        add_frame_cond=args.get("add_frame_cond", 1),
    )
    os.makedirs(out_dir, exist_ok=True)
    save_config(out_dir, vq=vcfg, data=datacfg)
    checkpoints.save(
        os.path.join(out_dir, "ckpt"), 0, {"params": params, "vq": vq}, block=True
    )
    print(f"[vq] {net_path} -> {out_dir}")
    return out_dir


# ------------------------------------------------------------------ #
# guide transformer
# ------------------------------------------------------------------ #


def convert_guide_checkpoint(
    ckpt_path: str,
    out_dir: str,
    vq_args_path: Optional[str] = None,
    checkpoints_root: Optional[str] = None,
) -> str:
    """guide/<c>/checkpoints/iter-XXXX.pt → guide checkpoint dir.

    The reference re-derives the vocab from the VQ the guide was trained
    against (model/diffusion.py:244-259: tokens=tokenizer.n_clusters, vq args
    found via trans_args["resume_pth"]).  ``vq_args_path`` overrides that
    lookup when the VQ lives elsewhere than the recorded resume path."""
    args = _args_json(os.path.dirname(os.path.dirname(ckpt_path)))
    if vq_args_path is None:
        resume = args.get("resume_pth", "")
        cand = [resume, os.path.join(checkpoints_root or ".", resume)]
        for c in cand:
            if c and os.path.exists(os.path.join(os.path.dirname(c), "args.json")):
                vq_args_path = os.path.join(os.path.dirname(c), "args.json")
                break
    if vq_args_path is None:
        raise FileNotFoundError(
            "cannot locate the VQ args.json (trans_args['resume_pth'] not found) — "
            "pass --vq_args explicitly"
        )
    with open(vq_args_path) as f:
        vq_args = json.load(f)
    num_audio_layers = int(args.get("num_audio_layers", 2))
    gcfg = GuideConfig(
        tokens=int(vq_args["code_dim"]),
        latent_dim=int(args["dim"]),
        num_layers=int(args["layers"]),
        vq_depth=int(vq_args["depth"]),
    )
    ckpt = _load_torch(ckpt_path)
    sd = _to_numpy_tree(ckpt.get("model_state_dict", ckpt))
    params = convert_guide(
        sd, gcfg.num_layers, num_audio_layers=num_audio_layers
    )
    datacfg = DataConfig(
        data_root=args.get("data_root", ""),
        person=_person_from_root(args.get("data_root", "")),
        data_format=args.get("data_format", "pose"),
        max_seq_length=int(args.get("max_seq_length", 600)),
        add_frame_cond=args.get("add_frame_cond", 1),
    )
    os.makedirs(out_dir, exist_ok=True)
    save_config(out_dir, guide=gcfg, data=datacfg)
    checkpoints.save(os.path.join(out_dir, "ckpt"), 0, {"params": params}, block=True)
    print(f"[guide] {ckpt_path} -> {out_dir}")
    return out_dir


# ------------------------------------------------------------------ #
# lip regressor (standalone assets/iter-0200000.pt)
# ------------------------------------------------------------------ #


def convert_lip_checkpoint(ckpt_path: str, out_dir: str) -> str:
    """assets/iter-0200000.pt (model/diffusion.py:273-280) → params dir.
    Usually unnecessary — face diffusion checkpoints embed the lip model —
    but kept for parity with the standalone asset."""
    ckpt = _load_torch(ckpt_path)
    sd = _to_numpy_tree(ckpt.get("model_state_dict", ckpt))
    params = convert_lip_regressor(sd)
    os.makedirs(out_dir, exist_ok=True)
    checkpoints.save(os.path.join(out_dir, "ckpt"), 0, {"params": params}, block=True)
    print(f"[lip] {ckpt_path} -> {out_dir}")
    return out_dir


# ------------------------------------------------------------------ #
# ca_body photoreal avatar
# ------------------------------------------------------------------ #


def convert_avatar_checkpoint(
    person_dir: str,
    out_dir: str,
    render_defaults: Optional[str] = None,
) -> str:
    """checkpoints/ca_body/data/<person>/ (config.yml + static_assets.pt +
    body_dec.ckpt, render_codes.py:60-90) → renderer bundle dir consumed by
    apps/render_pipeline.load_body_renderer."""
    import shutil

    from audio2photoreal_tpu.apps.render_pipeline import Camera
    from audio2photoreal_tpu.render.assets import load_render_defaults
    from audio2photoreal_tpu.render.mesh_vae import RendererConfig

    ckpt_path = os.path.join(person_dir, "body_dec.ckpt")
    assets_path = os.path.join(person_dir, "static_assets.pt")
    cfg = RendererConfig()
    n_blocks = int(np.log2(cfg.uv_size // cfg.init_uv_size))
    ckpt = _load_torch(ckpt_path)
    sd = ckpt.get("model_state_dict", ckpt.get("model", ckpt))
    sd = _to_numpy_tree(sd)
    params = convert_body_avatar(sd, n_blocks=n_blocks)

    if render_defaults and os.path.exists(render_defaults):
        cams = load_render_defaults(render_defaults)
    else:
        # fall back to a frontal rig aimed at the LBS template centroid
        a = _load_torch(assets_path)
        verts = np.asarray(a["lbs_template_verts"], np.float32)
        c = verts.mean(0)
        extent = float(np.abs(verts - c).max())
        H, W = cfg.image_height, cfg.image_width
        f = 1.2 * max(H, W)
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        campos = c + np.array([0.0, 0.0, 3.5 * extent], np.float32)
        R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
        t = -R @ campos
        cams = {"frontal": Camera(campos=campos, K=K, Rt=np.concatenate([R, t[:, None]], 1))}

    from audio2photoreal_tpu.render.assets import save_renderer_bundle

    os.makedirs(out_dir, exist_ok=True)
    save_renderer_bundle(out_dir, cfg, params["params"] if "params" in params else params, cams)
    # keep the real per-person assets next to the ckpt — load_renderer_bundle
    # prefers them over synthetic ones
    shutil.copy2(assets_path, os.path.join(out_dir, "static_assets.pt"))
    print(f"[avatar] {person_dir} -> {out_dir}")
    return out_dir


# ------------------------------------------------------------------ #
# whole-person driver
# ------------------------------------------------------------------ #


def convert_person(checkpoints_root: str, person: str, out_root: str) -> Dict[str, str]:
    """Convert every model family found for one person (the layout written by
    scripts/download_prereq.sh + download_allmodels.sh, README.md:178-198)."""
    out: Dict[str, str] = {}
    droot = os.path.join(checkpoints_root, "diffusion")
    for tag_dir in sorted(glob.glob(os.path.join(droot, "c*_face")) + glob.glob(os.path.join(droot, "c*_pose"))):
        pts = sorted(glob.glob(os.path.join(tag_dir, "model*.pt")))
        if not pts:
            continue
        name = os.path.basename(tag_dir)
        out[name] = convert_diffusion_checkpoint(
            pts[-1], os.path.join(out_root, name)
        )
    for vq_dir in sorted(glob.glob(os.path.join(checkpoints_root, "vq", "*"))):
        pths = sorted(glob.glob(os.path.join(vq_dir, "net_iter*.pth")))
        if not pths:
            continue
        name = os.path.basename(vq_dir)
        out[name] = convert_vq_checkpoint(pths[-1], os.path.join(out_root, name))
    for g_dir in sorted(glob.glob(os.path.join(checkpoints_root, "guide", "*"))):
        its = sorted(glob.glob(os.path.join(g_dir, "checkpoints", "iter-*.pt")))
        if not its:
            continue
        name = "guide_" + os.path.basename(g_dir)
        out[name] = convert_guide_checkpoint(
            its[-1], os.path.join(out_root, name), checkpoints_root=checkpoints_root
        )
    person_dir = os.path.join(checkpoints_root, "ca_body", "data", person)
    if os.path.exists(os.path.join(person_dir, "body_dec.ckpt")):
        rd = os.path.join("assets", f"render_defaults_{person}.pth")
        out["renderer"] = convert_avatar_checkpoint(
            person_dir,
            os.path.join(out_root, "renderer"),
            render_defaults=rd if os.path.exists(rd) else None,
        )
    if not out:
        raise FileNotFoundError(f"no convertible checkpoints under {checkpoints_root}")
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="output checkpoint dir (or root for --checkpoints_root)")
    p.add_argument("--diffusion", help="path to diffusion model00X.pt")
    p.add_argument("--vq", help="path to vq net_iterX.pth")
    p.add_argument("--guide", help="path to guide checkpoints/iter-X.pt")
    p.add_argument("--vq_args", help="args.json of the VQ the guide was trained on")
    p.add_argument("--lip", help="path to standalone lip regressor iter-X.pt")
    p.add_argument("--avatar", help="checkpoints/ca_body/data/<person> dir")
    p.add_argument("--render_defaults", help="assets/render_defaults_<person>.pth")
    p.add_argument("--checkpoints_root", help="convert everything under this root")
    p.add_argument("--person", default="PXB184")
    a = p.parse_args()

    did = False
    if a.checkpoints_root:
        convert_person(a.checkpoints_root, a.person, a.out)
        did = True
    if a.diffusion:
        convert_diffusion_checkpoint(a.diffusion, a.out)
        did = True
    if a.vq:
        convert_vq_checkpoint(a.vq, a.out)
        did = True
    if a.guide:
        convert_guide_checkpoint(a.guide, a.out, vq_args_path=a.vq_args,
                                 checkpoints_root=a.checkpoints_root)
        did = True
    if a.lip:
        convert_lip_checkpoint(a.lip, a.out)
        did = True
    if a.avatar:
        convert_avatar_checkpoint(a.avatar, a.out, render_defaults=a.render_defaults)
        did = True
    if not did:
        p.error("nothing to convert — pass --checkpoints_root or a per-model path")


if __name__ == "__main__":
    main()
