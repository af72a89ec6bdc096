"""Renderer asset construction.

Two producers of ``RendererAssets``:
- ``convert_static_assets``: maps the reference's downloaded
  ``static_assets.pt`` + LBS config blobs (visualize/render_codes.py:52-89,
  ca_body/utils/lbs.py:424+) into JAX pytrees.  Runs host-side with torch,
  once per person.
- ``make_synthetic_assets``: a small procedural "capsule person" (cylinder
  mesh, 3-joint chain, grid UV atlas) exercising every asset field — the
  renderer's test fixture, standing in for capture data that the reference
  also does not ship.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.geometry import GeometryModule
from audio2photoreal_tpu.render.lbs import LBSModule, Skeleton
from audio2photoreal_tpu.render.mesh_vae import RendererAssets, RendererConfig
from audio2photoreal_tpu.render.seams import SeamSampler


def seam_sampler_from_reference(data, uv_size: int) -> SeamSampler:
    """Reference seam_data contract (ca_body/utils/seams.py:16-52):
    ``dst_ij``/``src_ij`` are [N, 2] (row, col) texel pairs; ``uvs`` is a
    DENSE [H, W, 2] sample grid in [0, 1]; ``weights`` a dense [H, W] blend
    map ((1-w)·tex + w·resampled).  The dense tables are sparsified here —
    only texels with w > 0 participate, which keeps the TPU-side resample a
    small gather instead of a full-texture grid_sample."""
    W = uv_size
    np_ = np.asarray
    dst_ij = np_(data["dst_ij"]).astype(np.int64).reshape(-1, 2)
    src_ij = np_(data["src_ij"]).astype(np.int64).reshape(-1, 2)
    uvs = np_(data["uvs"]).astype(np.float32).reshape(W, W, 2)
    weights = np_(data["weights"]).astype(np.float32).reshape(W, W)
    ij = np.argwhere(weights > 0)
    sub_uvs = uvs[ij[:, 0], ij[:, 1]]  # [M, 2] in [0, 1]
    return SeamSampler(
        impaint_dst=jnp.asarray(dst_ij[:, 0] * W + dst_ij[:, 1], jnp.int32),
        impaint_src=jnp.asarray(src_ij[:, 0] * W + src_ij[:, 1], jnp.int32),
        resample_uvs=jnp.asarray(2.0 * (sub_uvs - 0.5), jnp.float32),
        resample_dst=jnp.asarray(ij[:, 0] * W + ij[:, 1], jnp.int32),
        resample_weights=jnp.asarray(weights[ij[:, 0], ij[:, 1]], jnp.float32),
        uv_size=uv_size,
    )


def empty_seam_sampler(uv_size: int) -> SeamSampler:
    return SeamSampler(
        impaint_dst=jnp.zeros((0,), jnp.int32),
        impaint_src=jnp.zeros((0,), jnp.int32),
        resample_uvs=jnp.zeros((0, 2)),
        resample_dst=jnp.zeros((0,), jnp.int32),
        resample_weights=jnp.zeros((0,)),
        uv_size=uv_size,
    )


def _cylinder_mesh(n_around: int = 8, n_height: int = 6, radius: float = 0.3, height: float = 2.0):
    """Open cylinder with a grid UV atlas; returns (verts, faces, uv, uv_faces)."""
    verts, uvs = [], []
    for j in range(n_height):
        z = height * j / (n_height - 1)
        for i in range(n_around):
            a = 2 * np.pi * i / n_around
            verts.append([radius * np.cos(a), radius * np.sin(a), z])
            uvs.append([(i + 0.5) / n_around, (j + 0.5) / n_height])
    faces = []
    for j in range(n_height - 1):
        for i in range(n_around):
            a = j * n_around + i
            b = j * n_around + (i + 1) % n_around
            c = (j + 1) * n_around + i
            d = (j + 1) * n_around + (i + 1) % n_around
            # skip the wrap-around strip in UV space (it would fold the atlas)
            if (i + 1) % n_around != 0:
                faces.append([a, b, c])
                faces.append([b, d, c])
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int64),
        np.asarray(uvs, np.float32),
        np.asarray(faces, np.int64),  # uv faces == geom faces (shared indexing)
    )


def synthetic_seam_sampler(uv_size: int, n: int, rng) -> SeamSampler:
    """Random but structurally-valid seam tables at production scale (real
    bodies carry tens of thousands of seam texels per resolution) so
    benchmarks exercise the seam gather/scatter path."""
    HW = uv_size * uv_size
    imp = rng.choice(HW, size=2 * n, replace=False)
    dst_r = rng.choice(HW, size=n, replace=False)
    return SeamSampler(
        impaint_dst=jnp.asarray(imp[:n], jnp.int32),
        impaint_src=jnp.asarray(imp[n:], jnp.int32),
        resample_uvs=jnp.asarray(rng.rand(n, 2) * 2.0 - 1.0, jnp.float32),
        resample_dst=jnp.asarray(dst_r, jnp.int32),
        resample_weights=jnp.asarray(rng.rand(n).astype(np.float32)),
        uv_size=uv_size,
    )


def make_synthetic_assets(
    cfg: RendererConfig, seed: int = 0, mesh_density: int = 1
) -> RendererAssets:
    """``mesh_density=1`` builds a coarse ~70-face cylinder (fast for tests);
    ``mesh_density=10`` a production-scale ~12k-small-triangle mesh matching
    the reference body topology's face count (benchmarks), with
    production-scale synthetic seam tables."""
    rng = np.random.RandomState(seed)
    verts, faces, uvs, uv_faces = _cylinder_mesh(
        n_around=8 * mesh_density, n_height=6 * mesh_density
    )
    V = len(verts)
    geo = GeometryModule.create(faces, uvs, uv_faces, cfg.uv_size, impaint=True)

    # 3-joint chain up the cylinder axis
    skel = Skeleton.create(
        parents=[-1, 0, 1],
        offset=np.array([[0, 0, 0], [0, 0, 1.0], [0, 0, 1.0]], np.float32),
        rotation=np.tile(np.array([0, 0, 0, 1], np.float32), (3, 1)),
    )
    # 104-d pose → 21 channel params: root uses pose[0:6], joints 1/2 rotate
    transform = np.zeros((21, 104), np.float32)
    transform[0:6, 0:6] = np.eye(6)
    transform[10, 6] = 1.0  # joint1 rx
    transform[17, 7] = 1.0  # joint2 rx
    offsets = np.zeros(21, np.float32)
    z = verts[:, 2]
    w1 = np.clip(z / 2.0, 0, 1)
    skin_weights = np.stack([1 - w1, w1 * 0.7, w1 * 0.3], axis=1).astype(np.float32)
    skin_weights /= skin_weights.sum(1, keepdims=True)
    skin_indices = np.tile(np.array([0, 1, 2]), (V, 1))
    lbs = LBSModule.create(skel, transform, offsets, skin_indices, skin_weights, verts)

    S0 = cfg.init_uv_size
    Senc = cfg.encoder_in_size
    return RendererAssets(
        geo=geo,
        lbs=lbs,
        seam=(
            synthetic_seam_sampler(cfg.uv_size, 24_000, rng)
            if mesh_density > 1
            else empty_seam_sampler(cfg.uv_size)
        ),
        seam_2k=(
            synthetic_seam_sampler(cfg.upscale_size, 48_000, rng)
            if mesh_density > 1
            else empty_seam_sampler(cfg.upscale_size)
        ),
        tex_mean=jnp.asarray(rng.rand(cfg.upscale_size, cfg.upscale_size, 3) * 100, jnp.float32),
        tex_std=64.0,
        ao_mean=jnp.asarray(rng.rand(cfg.shadow_size, cfg.shadow_size, 1), jnp.float32),
        face_cond_mask=jnp.asarray((rng.rand(S0, S0, 1) > 0.7), jnp.float32),
        pose_cond_mask=jnp.asarray(rng.rand(S0, S0, 104 - 6) > 0.5, jnp.int32),
        body_cond_mask=jnp.ones((S0, S0, 1), jnp.float32),
        non_head_mask=jnp.ones((Senc, Senc, 1), jnp.float32),
        face_tex_mask=jnp.ones((Senc, Senc, 1), jnp.float32),
        frontal_view=jnp.asarray(np.array([0.0, 0.0, 1.0], np.float32)),
    )


def save_renderer_bundle(out_dir: str, cfg: RendererConfig, params, cameras) -> str:
    """Persist a renderer bundle dir — the role of the reference's
    ``checkpoints/ca_body/data/<person>`` tree (config.yml + static_assets.pt
    + body_dec.ckpt) plus ``render_defaults_<person>.pth``
    (render_codes.py:57-90).  Layout:

    - ``renderer.json``   — RendererConfig fields (+ synthetic-assets seed)
    - ``ckpt/``           — orbax checkpoint of the avatar params
    - ``cameras.npz``     — names, campos [N,3], K [N,3,3], Rt [N,3,4]
    - ``static_assets.pt``— (optional, copied by the conversion CLI) real
                            per-person assets; absent → synthetic assets
    """
    import dataclasses
    import json
    import os

    import jax

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "renderer.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)
    from audio2photoreal_tpu.train import checkpoints

    checkpoints.save(os.path.join(out_dir, "ckpt"), 0, {"params": jax.device_get(params)})
    names = list(cameras.keys())
    np.savez(
        os.path.join(out_dir, "cameras.npz"),
        names=np.array(names),
        campos=np.stack([np.asarray(cameras[n].campos) for n in names]),
        K=np.stack([np.asarray(cameras[n].K) for n in names]),
        Rt=np.stack([np.asarray(cameras[n].Rt) for n in names]),
    )
    return out_dir


def load_renderer_bundle(renderer_dir: str, cfg=None, frame_batch: int = 8, mesh=None):
    """Load a renderer bundle dir (see save_renderer_bundle) → BodyRenderer."""
    import json
    import os

    from audio2photoreal_tpu.apps.render_pipeline import BodyRenderer, Camera
    from audio2photoreal_tpu.train import checkpoints

    if cfg is None:
        with open(os.path.join(renderer_dir, "renderer.json")) as f:
            cfg = RendererConfig(**json.load(f))
    sa = os.path.join(renderer_dir, "static_assets.pt")
    if os.path.exists(sa):
        assets = convert_static_assets(sa, cfg)
    else:
        assets = make_synthetic_assets(cfg)
    restored = checkpoints.restore(os.path.join(renderer_dir, "ckpt"), None)
    # layouts: inference bundle {"params": ...}, avatar-trainer full state
    # {"state": {"params": ...}} (apps/train_avatar.py), or a bare param tree
    if "params" in restored:
        params = restored["params"]
    elif "state" in restored:
        params = restored["state"]["params"]
    else:
        params = restored
    camf = np.load(os.path.join(renderer_dir, "cameras.npz"), allow_pickle=True)
    cameras = {
        str(n): Camera(campos=camf["campos"][i], K=camf["K"][i], Rt=camf["Rt"][i])
        for i, n in enumerate(camf["names"])
    }
    return BodyRenderer(cfg, assets, params, cameras, frame_batch=frame_batch, mesh=mesh)


def load_render_defaults(path: str):
    """Convert the reference's ``assets/render_defaults_<person>.pth``
    (default camera calibration fed to BodyRenderer, render_codes.py:89)
    into Camera objects for apps/render_pipeline."""
    import torch

    from audio2photoreal_tpu.apps.render_pipeline import Camera

    d = torch.load(path, map_location="cpu", weights_only=False)
    cams = {}
    # contract: dict with K/Rt/campos arrays, possibly per-camera sub-dicts
    def mk(entry):
        K = np.asarray(entry["K"], np.float32).reshape(3, 3)
        Rt = np.asarray(entry["Rt"], np.float32).reshape(3, 4)
        campos = entry.get("campos")
        if campos is None:
            R, t = Rt[:, :3], Rt[:, 3]
            campos = (-R.T @ t).astype(np.float32)
        return Camera(campos=np.asarray(campos, np.float32).reshape(3), K=K, Rt=Rt)

    if "K" in d:
        cams["default"] = mk(d)
    else:
        for name, entry in d.items():
            if isinstance(entry, dict) and "K" in entry:
                cams[str(name)] = mk(entry)
    if not cams:
        raise ValueError(f"no camera entries found in {path}")
    return cams


def convert_static_assets(
    static_assets_path: str, cfg: Optional[RendererConfig] = None
) -> RendererAssets:
    """Convert the reference's static_assets.pt into RendererAssets.

    Requires torch host-side; fields follow AutoEncoder.__init__
    (mesh_vae_drivable.py:90-200).  NCHW buffers are permuted to NHWC.
    """
    import torch

    import torch.nn.functional as tF

    cfg = cfg or RendererConfig()
    a = torch.load(static_assets_path, map_location="cpu", weights_only=False)

    def np_(x):
        return np.asarray(x)

    geo = GeometryModule.create(
        np_(a["topology"]["vi"]), np_(a["topology"]["vt"]), np_(a["topology"]["vti"]),
        cfg.uv_size, impaint=True,
        v2uv=np_(a["topology"]["v2uv"]) if "v2uv" in a["topology"] else None,
    )
    skel_json = a["lbs_model_json"]
    lbs_cfg = a["lbs_config_dict"]
    bones = skel_json["Skeleton"]["Bones"]
    parents = [b["Parent"] if b["Parent"] <= len(bones) else -1 for b in bones]
    offs = np.array([b["TranslationOffset"] for b in bones], np.float32)
    rots = np.array([b["PreRotation"] for b in bones], np.float32)
    skel = Skeleton.create(parents, offs, rots)

    skin_model = skel_json["SkinnedModel"]
    weights = np.array([e[1] for e in skin_model["SkinningWeights"]], np.float32)
    indices = np.array([e[0] for e in skin_model["SkinningWeights"]], np.int64)
    offsets_arr = np.array(skin_model["SkinningOffsets"], np.int64)
    nv = len(offsets_arr) - 1
    K = 8
    skin_weights = np.zeros((nv, K), np.float32)
    skin_indices = np.zeros((nv, K), np.int64)
    right = offsets_arr[1:]
    for k in range(K):
        left = offsets_arr[:-1] + k
        valid = left < right
        skin_weights[valid, k] = weights[left[valid]]
        skin_indices[valid, k] = indices[left[valid]]

    # the reference concatenates the per-person (constant) scale params onto
    # every pose before the channel transform (lbs.py:152-158,809-813); with
    # 104-d motion the scale columns fold into the offsets:
    #   transform @ [pose; scale] + off == transform[:, :104] @ pose
    #                                      + (off + transform[:, 104:] @ scale)
    transform = np_(lbs_cfg["transform"]).astype(np.float64)
    offsets = np_(lbs_cfg["transform_offsets"]).reshape(-1).astype(np.float64)
    bind_offsets = offsets.astype(np.float32)  # bind pose: zero scale (lbs.py:112-115)
    n_pose = 104
    if transform.shape[1] > n_pose:
        scale = np_(a.get("lbs_scale", np.zeros(transform.shape[1] - n_pose))).reshape(-1)
        offsets = offsets + transform[:, n_pose:] @ scale.astype(np.float64)
        transform = transform[:, :n_pose]

    lbs = LBSModule.create(
        skel,
        transform.astype(np.float32),
        offsets.astype(np.float32),
        skin_indices,
        skin_weights,
        np_(a["lbs_template_verts"]),
        global_scaling=float(np.asarray(a.get("global_scaling", [1.0])).reshape(-1)[0]),
        bind_offsets=bind_offsets,
    )

    seam_from = seam_sampler_from_reference

    S0 = cfg.init_uv_size
    pose_cond = np_(a["pose_cond_mask"])  # [P?, S0, S0] or [S0, S0, P]
    if pose_cond.ndim == 3 and pose_cond.shape[0] not in (S0,):
        pose_cond = pose_cond.transpose(1, 2, 0)
    head_cond = np_(a.get("head_cond_mask", np.zeros((S0, S0))))
    pose_cond = pose_cond * (1 - head_cond[..., None])

    def hw1(x, size=None):
        x = np_(x).squeeze()
        return jnp.asarray(x[..., None], jnp.float32)

    def _gaussian_blur11(x: "torch.Tensor") -> "torch.Tensor":
        """torchvision.transforms.functional.gaussian_blur(kernel_size=11)
        equivalent: sigma = 0.3·((k−1)/2 − 1) + 0.8 = 2.0, reflect padding,
        separable conv (the reference blurs tex_mean with it,
        mesh_vae_drivable.py:113)."""
        k, sigma = 11, 2.0
        coords = torch.arange(k, dtype=torch.float32) - (k - 1) / 2
        g = torch.exp(-(coords**2) / (2 * sigma**2))
        g = g / g.sum()
        C = x.shape[1]
        pad = k // 2
        xp = tF.pad(x, (pad, pad, pad, pad), mode="reflect")
        out = tF.conv2d(xp, g.view(1, 1, 1, k).expand(C, 1, 1, k), groups=C)
        out = tF.conv2d(out, g.view(1, 1, k, 1).expand(C, 1, k, 1), groups=C)
        return out

    # tex_mean: blur(k=11) then bilinear-resize to the upscale size
    # (mesh_vae_drivable.py:112-114)
    tex_mean_t = torch.as_tensor(np_(a["tex_mean"]), dtype=torch.float32)[None]
    tex_mean_t = _gaussian_blur11(tex_mean_t)
    tex_mean_t = tF.interpolate(
        tex_mean_t, (cfg.upscale_size, cfg.upscale_size), mode="bilinear"
    )[0]

    # encoder mask: bilinear to the encoder input size then BOOL cast — any
    # nonzero interpolated texel participates (mesh_vae_drivable.py:396-398)
    Senc = cfg.encoder_in_size
    non_head_t = torch.as_tensor(
        1.0 - np_(a["face_mask"]), dtype=torch.float32
    )[None, None]
    non_head_t = (tF.interpolate(non_head_t, (Senc, Senc), mode="bilinear") != 0).float()

    # face-encoder tex mask: bilinear, align_corners=True, kept float
    # (mesh_vae_drivable.py:662-667)
    mugsy_t = torch.as_tensor(
        np_(a["mugsy_face_mask"])[..., 0], dtype=torch.float32
    )[None, None]
    mugsy_t = tF.interpolate(mugsy_t, (Senc, Senc), mode="bilinear", align_corners=True)

    # ao_mean: nearest resize to the shadow size (ShadowUNet.__init__,
    # nn/shadow.py:44-47 — F.interpolate default mode)
    ao_t = torch.as_tensor(np_(a["ao_mean"]), dtype=torch.float32).reshape(
        1, 1, *np_(a["ao_mean"]).squeeze().shape
    )
    ao_t = tF.interpolate(ao_t, (cfg.shadow_size, cfg.shadow_size))

    return RendererAssets(
        geo=geo,
        lbs=lbs,
        seam=seam_from(a["seam_data_1024"], cfg.uv_size),
        seam_2k=seam_from(a["seam_data_2048"], cfg.upscale_size),
        tex_mean=jnp.asarray(tex_mean_t.numpy().transpose(1, 2, 0), jnp.float32),
        tex_std=float(a.get("tex_var", 64.0)),
        ao_mean=jnp.asarray(ao_t[0, 0].numpy()[..., None], jnp.float32),
        face_cond_mask=hw1(a["face_cond_mask"]),
        pose_cond_mask=jnp.asarray(pose_cond, jnp.int32),
        body_cond_mask=hw1(a["body_cond_mask"]),
        non_head_mask=jnp.asarray(non_head_t[0, 0].numpy()[..., None], jnp.float32),
        face_tex_mask=jnp.asarray(mugsy_t[0, 0].numpy()[..., None], jnp.float32),
        frontal_view=jnp.asarray(np_(a["face_frontal_view"]), jnp.float32).reshape(-1)[:3],
    )
