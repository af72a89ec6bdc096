"""The drivable codec-avatar body model.

Re-design of ``AutoEncoder`` (visualize/ca_body/models/mesh_vae_drivable.py:72-500):
(104-d lbs pose, 256-d face codes) → posed geometry + view-dependent 2k
texture → rasterized RGB.  Components map 1:1 to the reference:

- ``BodyEncoder``     ← Encoder (:376-455): unposed-verts UV → embs mu/logvar
- ``FaceEncoder``     ← FaceEncoder (:637-719): face tex+geom → body-space face embs
- ``ConvDecoder``     ← ConvDecoder (:456-635): pose-masked tile2d + emb/face
                         deconv pyramids → geom delta UV + mean texture
- ``UNetViewDecoder`` ← (:721-739): view-cos conditioned texture residual
- ``shadow / upscale / forward_tex`` ← (:95-252)

All static per-person assets (masks, means, seam tables, topology, LBS) ride
in a ``RendererAssets`` pytree produced by the asset converter
(render/assets.py) from the reference's ``static_assets.pt``.

Sizes are configurable so tests run at 64² while production runs 1024²/2048².
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.blocks import ConvBlock, ConvDownBlock, UpConvBlockDeep, UpscaleNet
from audio2photoreal_tpu.render.face import FaceDecoderFrontal
from audio2photoreal_tpu.render.geometry import GeometryModule, compute_view_cos
from audio2photoreal_tpu.render.layers import LinearWN, resize_bilinear, tile2d
from audio2photoreal_tpu.render.lbs import LBSModule
from audio2photoreal_tpu.render.rasterizer import render_mesh
from audio2photoreal_tpu.render.seams import SeamSampler
from audio2photoreal_tpu.render.shadow import PoseToShadow, ShadowUNet
from audio2photoreal_tpu.render.unet import UNetWB

lrelu = lambda x: nn.leaky_relu(x, negative_slope=0.2)


@dataclass(frozen=True)
class RendererConfig:
    uv_size: int = 1024
    init_uv_size: int = 64
    upscale_size: int = 2048
    n_embs: int = 256
    n_face_embs: int = 256
    n_pose_dims: int = 98  # motion[6:] (mesh_vae_drivable.py:587)
    n_pose_enc_channels: int = 64
    n_embs_enc_channels: int = 64
    n_init_channels: int = 128
    n_min_channels: int = 16
    shadow_size: int = 256
    view_unet_ftrs: int = 8
    encoder_in_size: int = 512
    face_tex_size: int = 1024
    n_face_verts: int = 7306
    noise_std: float = 1.0
    image_height: int = 1024
    image_width: int = 667
    # > 0 enables the training-only per-camera calibration modules
    # (CalV5 / LearnableBlur / CameraPixelBias, mesh_vae_drivable.py:180-200);
    # 0 = inference-only avatar, no calibration params
    n_cameras: int = 0
    # keep the decoder tail (lane-bound up blocks → seam → final conv) in
    # space-to-depth coordinates end-to-end — identical math, no s2d/d2s
    # relayout passes between stages (each costs ~0.5-1 ms/frame at the
    # production point, tools/probe_relayout.py).  False = the per-stage
    # relayout path (exactness baseline for tests)
    s2d_tail: bool = True


class BodyEncoder(nn.Module):
    """Unposed-verts UV → body embedding (reference Encoder :376-455)."""

    cfg: RendererConfig
    mask: Any  # [S, S, 1] non-head mask at encoder_in_size

    @nn.compact
    def __call__(self, verts_unposed_uv: jnp.ndarray, *, noise_key=None) -> Dict[str, jnp.ndarray]:
        S = self.cfg.encoder_in_size
        B = verts_unposed_uv.shape[0]
        x = resize_bilinear(verts_unposed_uv, (S, S)) * self.mask[None]
        x = ConvDownBlock(8, S, name="verts_conv")(x)
        # production (S=512): 16,32,32,64,128,128 down to 4×4 — exactly the
        # reference's joint_conv_blocks (:497-505); smaller S trims the head
        plan = [16, 32, 32, 64, 128, 128]
        import math

        n_downs = int(math.log2(S // 4)) - 1  # verts_conv already halved once
        chans = [(c, (S // 2) // 2**i) for i, c in enumerate(plan[-n_downs:])]
        for i, (c, size) in enumerate(chans):
            x = ConvDownBlock(c, size, name=f"joint{i}")(x)
        x = x.reshape(B, -1)
        mu = LinearWN(self.cfg.n_embs, name="mu")(x)
        logvar = 0.1 * LinearWN(self.cfg.n_embs, name="logvar")(x)
        if noise_key is not None:
            embs = mu + jnp.exp(logvar) * jax.random.normal(noise_key, mu.shape) * self.cfg.noise_std
        else:
            embs = mu
        return {"embs": embs, "embs_mu": mu, "embs_logvar": logvar}


class FaceEncoder(nn.Module):
    """Face decoder outputs → body-space face embedding (:637-719)."""

    cfg: RendererConfig
    tex_cond_mask: Any  # [512, 512, 1]

    @nn.compact
    def __call__(
        self, face_geom: jnp.ndarray, face_tex: jnp.ndarray, *, noise_key=None
    ) -> Dict[str, jnp.ndarray]:
        B = face_geom.shape[0]
        S = self.cfg.encoder_in_size
        tex = resize_bilinear(face_tex, (S, S))
        tex = (tex / 255.0 - 0.5) * self.tex_cond_mask[None]
        # production (S=512): 4,8,16,32,64,128,128 down to 4×4 (:699-707)
        plan = [4, 8, 16, 32, 64, 128, 128]
        import math

        n_downs = int(math.log2(S // 4))
        chans = [(c, S // 2**i) for i, c in enumerate(plan[-n_downs:])]
        x = tex
        for i, (c, size) in enumerate(chans):
            x = ConvDownBlock(c, size, name=f"conv{i}")(x)
        tex_enc = x.reshape(B, -1)
        geom_enc = lrelu(LinearWN(256, name="geommod")(face_geom.reshape(B, -1)))
        joint = lrelu(LinearWN(512, name="jointmod")(jnp.concatenate([tex_enc, geom_enc], -1)))
        mu = LinearWN(self.cfg.n_face_embs, name="mu")(joint)
        logvar = 0.1 * LinearWN(self.cfg.n_face_embs, name="logvar")(joint)
        if noise_key is not None:
            embs = mu + jnp.exp(logvar) * jax.random.normal(noise_key, mu.shape) * self.cfg.noise_std
        else:
            embs = mu
        return {"face_embs": embs, "face_embs_mu": mu, "face_embs_logvar": logvar}


class ConvDecoder(nn.Module):
    """Pose + embeddings → geometry delta UV + mean texture (:456-635)."""

    cfg: RendererConfig
    geo: GeometryModule
    seam: SeamSampler
    pose_cond_mask: Any  # [S0, S0, P] int
    face_cond_mask: Any  # [S0, S0, 1]
    body_cond_mask: Any  # [S0, S0, 1]

    @nn.compact
    def __call__(
        self,
        motion: jnp.ndarray,  # [B, 104]
        embs: jnp.ndarray,
        face_embs: jnp.ndarray,
        embs_conv: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        S0 = c.init_uv_size
        pose = motion[:, 6:]
        B = pose.shape[0]
        n_blocks = int(np.log2(c.uv_size // S0))
        sizes = [S0 * 2**s for s in range(n_blocks + 1)]
        n_channels = [max(c.n_init_channels // 2**b, c.n_min_channels) for b in range(n_blocks + 1)]

        non_head = jnp.clip(self.body_cond_mask * (1.0 - self.face_cond_mask), 0.0, 1.0)

        pose_masked = tile2d(pose, S0) * self.pose_cond_mask
        pose_conv = ConvBlock(c.n_pose_enc_channels, S0, kernel_size=1, padding=0, name="local_pose_conv_block")(pose_masked) * non_head[None]

        if embs_conv is None:
            # production (S0=64): 128→128→64→enc_channels, 4→64 (:509-515)
            n_ups = int(np.log2(S0 // 4))
            plan = [128, 128, 64][max(3 - (n_ups - 1), 0):] + [c.n_embs_enc_channels]
            plan = plan[-n_ups:]
            h = lrelu(LinearWN(4 * 4 * 128, name="embs_fc")(embs)).reshape(B, 4, 4, 128)
            for i, cc in enumerate(plan):
                h = UpConvBlockDeep(cc, 4 * 2 ** (i + 1), name=f"embs_conv{i}")(h)
            embs_conv = h
        # face pyramid 4→S0/2 (:517-525)
        n_ups_f = int(np.log2(S0 // 8))
        plan_f = ([64, 64][max(2 - (n_ups_f - 1), 0):] + [c.n_embs_enc_channels])[-n_ups_f:]
        hf = lrelu(LinearWN(4 * 4 * 32, name="face_embs_fc")(face_embs)).reshape(B, 4, 4, 32)
        for i, cc in enumerate(plan_f):
            hf = UpConvBlockDeep(cc, 4 * 2 ** (i + 1), name=f"face_embs_conv{i}")(hf)
        face_conv = hf

        # splice face region into the lower-left quadrant (reference
        # :602-606 — embs_conv[:, :, 32:, :32] with NCHW → rows 32:, cols :32)
        h2 = S0 // 2
        region = (
            face_conv * self.face_cond_mask[h2:, :h2][None]
            + embs_conv[:, h2:, :h2] * non_head[h2:, :h2][None]
        )
        # keep the update in the carrier dtype — a mixed-dtype .set upcasts
        # (and copies) the whole buffer
        embs_conv = embs_conv.at[:, h2:, :h2].set(region.astype(embs_conv.dtype))

        joint = jnp.concatenate([pose_conv, embs_conv], axis=-1)
        joint = ConvBlock(c.n_init_channels, S0, name="joint_conv_block")(joint)

        x = jnp.concatenate([joint, joint], axis=-1)  # 2 groups: verts + tex
        # the lane-bound tail blocks (≤32 ch/group at ≥256²) run in s2d-1
        # coordinates END-TO-END — up blocks, seam, and the final fused conv
        # exchange s2d tensors directly instead of relayouting at each edge
        in_s2d = False
        for b in range(n_blocks):
            cin_b, cout_b = n_channels[b] * 2, n_channels[b + 1] * 2
            use = (
                c.s2d_tail
                and sizes[b + 1] >= 256
                and cin_b // 2 <= 32
                and cout_b // 2 <= 32
            )
            x = UpConvBlockDeep(
                cout_b, sizes[b + 1], groups=2, name=f"up{b}",
                s2d_in=in_s2d, s2d_out=use,
            )(x)
            in_s2d = use

        if in_s2d:
            x = self.seam.fused_apply_s2d(x, n_resample=2)
        else:
            x = self.seam.fused_apply(x, n_resample=2)

        from audio2photoreal_tpu.render.layers import (
            Conv2dWNUB,
            conv3x3_s2d,
            depth_to_space,
            space_to_depth,
        )

        half = (x.shape[-1] // (4 if in_s2d else 1)) // 2
        s2d = c.uv_size >= 256 and half <= 32
        # the two final 3×3 convs run FUSED as one block-diagonal conv on the
        # un-split tensor: splitting [B, S, S, 32] materialises two 512MB
        # halves (plus two s2d copies) — the weights_only path yields each
        # module's normalized kernel while keeping the param tree identical
        # for the torch converters.  x[..., :half] is shape inference only
        # (dead in the graph), so it serves the s2d layout too.
        vw, vb = Conv2dWNUB(3, c.uv_size, c.uv_size, 3, 1, 1, name="verts_conv")(
            x[..., :half], weights_only=True
        )
        tw, tb = Conv2dWNUB(3, c.uv_size, c.uv_size, 3, 1, 1, name="tex_conv")(
            x[..., :half], weights_only=True  # same cin as verts; dead code
        )
        wj = jnp.concatenate(
            [
                jnp.concatenate([vw, jnp.zeros_like(vw)], axis=2),
                jnp.concatenate([jnp.zeros_like(tw), tw], axis=2),
            ],
            axis=-1,
        )  # [3, 3, 2·half, 6] block-diagonal
        bj = jnp.concatenate([vb, tb], axis=-1)[None].astype(wj.dtype)
        if s2d:
            xs = x.astype(wj.dtype) if in_s2d else space_to_depth(x.astype(wj.dtype))
            out = conv3x3_s2d(xs, wj)
            out = depth_to_space(out + space_to_depth(bj))
        else:
            out = jax.lax.conv_general_dilated(
                x.astype(wj.dtype), wj, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bj
        verts_uv_delta, tex_mean_rec = out[..., :3], out[..., 3:]
        verts_delta = self.geo.from_uv(verts_uv_delta)
        return {
            "geom_delta_rec": verts_delta,
            "geom_uv_delta_rec": verts_uv_delta,
            "tex_mean_rec": tex_mean_rec,
            "embs_conv": embs_conv,
            "pose_conv": pose_conv,
        }


class UNetViewDecoder(nn.Module):
    """View-cos conditioned texture residual (:721-739)."""

    cfg: RendererConfig
    geo: GeometryModule

    @nn.compact
    def __call__(self, geom_rec, tex_mean_rec, camera_pos) -> Dict[str, jnp.ndarray]:
        view_cos = jax.lax.stop_gradient(
            compute_view_cos(geom_rec, self.geo.faces, camera_pos)
        )
        view_cos_uv = self.geo.to_uv(view_cos[..., None])
        cond = jnp.concatenate([view_cos_uv, tex_mean_rec], axis=-1)
        tex_view = UNetWB(3, self.cfg.uv_size, n_init_ftrs=self.cfg.view_unet_ftrs, name="unet")(cond)
        return {"tex_view_rec": tex_view, "cond_view": cond}


@dataclass
class RendererAssets:
    """Static per-person assets (converted from static_assets.pt)."""

    geo: GeometryModule
    lbs: LBSModule
    seam: SeamSampler  # at uv_size
    seam_2k: SeamSampler  # at upscale_size
    tex_mean: jnp.ndarray  # [2048, 2048, 3]
    tex_std: float
    ao_mean: jnp.ndarray  # [S, S, 1]
    face_cond_mask: jnp.ndarray  # [S0, S0, 1]
    pose_cond_mask: jnp.ndarray  # [S0, S0, P]
    body_cond_mask: jnp.ndarray  # [S0, S0, 1]
    non_head_mask: jnp.ndarray  # [Senc, Senc, 1] encoder mask
    face_tex_mask: jnp.ndarray  # [512, 512, 1]
    frontal_view: jnp.ndarray  # [3]


class BodyAvatar(nn.Module):
    """Full drivable avatar (reference AutoEncoder.forward :276-373)."""

    cfg: RendererConfig
    assets: RendererAssets

    def setup(self):
        c = self.cfg
        a = self.assets
        self.encoder = BodyEncoder(c, a.non_head_mask, name="encoder")
        self.encoder_face = FaceEncoder(c, a.face_tex_mask, name="encoder_face")
        self.decoder_face = FaceDecoderFrontal(
            a.frontal_view,
            n_latent=c.n_face_embs,
            n_vert_out=3 * c.n_face_verts,
            tex_size=c.face_tex_size,
            name="decoder_face",
        )
        self.decoder = ConvDecoder(
            c, a.geo, a.seam, a.pose_cond_mask, a.face_cond_mask, a.body_cond_mask,
            name="decoder",
        )
        self.decoder_view = UNetViewDecoder(c, a.geo, name="decoder_view")
        self.shadow_net = ShadowUNet(
            uv_size=c.upscale_size, shadow_size=c.shadow_size, ao_mean=a.ao_mean,
            biases=False, name="shadow_net",
        )
        self.pose_to_shadow = PoseToShadow(
            n_pose_dims=104, uv_size=c.upscale_size, name="pose_to_shadow"
        )
        self.upscale_net = UpscaleNet(
            out_channels=3, n_ftrs=16, size=c.uv_size, name="upscale_net"
        )
        # training-only calibration (mesh_vae_drivable.py:180-200 wires CalV5 /
        # LearnableBlur / CameraPixelBias when the training config enables them)
        if c.n_cameras > 0:
            from audio2photoreal_tpu.render.calibration import (
                CalV5,
                CameraPixelBias,
                LearnableBlur,
            )

            self.cal = CalV5(n_cameras=c.n_cameras, name="cal")
            self.learn_blur = LearnableBlur(n_cameras=c.n_cameras, name="learn_blur")
            self.pixel_cal = CameraPixelBias(
                n_cameras=c.n_cameras, height=c.image_height, width=c.image_width,
                name="pixel_cal",
            )

    def template_body_embs(self) -> jnp.ndarray:
        """[1, n_embs] body embedding of the TEMPLATE geometry — the constant
        the per-frame body encode collapses to in the driving/product mode.

        Invariant: the product render loop feeds encode() the LBS-posed
        template (render_codes.py:107-114 builds geom from lbs_template_verts
        with the frame's motion) and encode() unposes it with the SAME motion
        (mesh_vae_drivable.py:254-260) — unpose∘pose of the template is the
        template up to float roundtrip (~1e-6 vertex coords → sub-LSB rgb;
        pinned by test_parallel.test_multicam_decode_once_matches_per_cam_renders,
        which compares the hoisted pipeline against per-frame full-encode
        renders)."""
        tv = self.assets.lbs.template_verts
        if tv.ndim == 2:
            tv = tv[None]
        uv = self.assets.geo.to_uv(tv)
        return self.encoder(uv)["embs"]

    def face_codes_to_body_embs(self, face_embs_hqlp: jnp.ndarray) -> jnp.ndarray:
        """HQLP face codes → body-space face embeddings via the frozen face
        decoder + face encoder (the translation the renderer applies to the
        diffusion model's 256-d outputs, render_codes.py:107-114 +
        mesh_vae_drivable.py:265-267)."""
        face_dec = self.decoder_face(face_embs_hqlp)
        face_dec = jax.tree_util.tree_map(jax.lax.stop_gradient, face_dec)
        enc = self.encoder_face(face_dec["face_geom"], face_dec["face_tex"])
        return enc["face_embs"]

    def encode(self, geom, lbs_motion, face_embs_hqlp, noise_key=None):
        """(posed geometry, pose, HQLP face codes) → embeddings (:254-274)."""
        verts_unposed = jax.lax.stop_gradient(self.assets.lbs.unpose(geom, lbs_motion))
        uv = self.assets.geo.to_uv(verts_unposed)
        enc = self.encoder(uv, noise_key=noise_key)
        face_dec = self.decoder_face(face_embs_hqlp)
        face_dec = jax.tree_util.tree_map(jax.lax.stop_gradient, face_dec)
        face_enc = self.encoder_face(face_dec["face_geom"], face_dec["face_tex"], noise_key=noise_key)
        return {**enc, **face_enc, "face_dec_preds": face_dec}

    def forward_tex(
        self,
        tex_mean_rec,
        tex_view_rec,
        shadow_map,
        final_seam: bool = True,
        shadow_seamed=None,
    ):
        """(:230-252): seam fixups → 2k upscale (+pixel-shuffle residual) →
        ×std+mean → shadow multiply → seam fixups.

        ``final_seam=False`` skips the last seam pass — the display-packed
        render path applies it in display space instead
        (SeamSampler.fused_apply_packed), which is ~4× cheaper.

        ``shadow_seamed`` short-circuits the shadow's own seam resample —
        it is VIEW-INDEPENDENT, so the multi-camera product path computes it
        once per frame in ``decode_frame`` and shares it across cameras
        (render_codes.py:115-126 renders a 2-camera rig per output frame)."""
        c = self.cfg
        a = self.assets
        x = jnp.concatenate([tex_mean_rec, tex_view_rec], axis=-1)
        tex = tex_mean_rec + tex_view_rec
        tex = a.seam.fused_apply(tex, n_resample=1)
        tex = resize_bilinear(tex, (c.upscale_size, c.upscale_size))
        tex = tex + self.upscale_net(x)
        # ×std+mean in the carrier dtype: f32 constants would upcast the
        # whole 2048² tail (float promotion), tripling its HBM footprint
        tex = tex * jnp.asarray(a.tex_std, tex.dtype) + a.tex_mean[None].astype(tex.dtype)
        if shadow_seamed is None:
            shadow_seamed = a.seam_2k.fused_apply(shadow_map, n_resample=2)
        tex = tex * shadow_seamed.astype(tex.dtype)
        if final_seam:
            tex = a.seam_2k.fused_apply(tex, n_resample=2)
        return tex

    def decode_frame(
        self,
        lbs_motion: jnp.ndarray,  # [B, 104]
        geom: Optional[jnp.ndarray] = None,  # [B, V, 3] GT posed (encode path)
        face_embs: Optional[jnp.ndarray] = None,  # HQLP codes [B, 256]
        embs: Optional[jnp.ndarray] = None,
        face_embs_body: Optional[jnp.ndarray] = None,
        encode: bool = True,
        use_pose_shadow: bool = True,
        ao: Optional[jnp.ndarray] = None,
        noise_key=None,
    ) -> Dict[str, jnp.ndarray]:
        """The VIEW-INDEPENDENT half of a product frame: encode (face-code
        translation + body encode), ConvDecoder, LBS pose, shadow, and the
        shadow's seam resample.  The reference renders every output frame
        from a per-person 2-camera rig (render_codes.py:115-126: face_embs
        tiled ×2, rgb0/rgb1 concatenated along width) but all of this work is
        identical across the rig's cameras — computing it once per frame and
        fanning out only ``render_view`` is the TPU-first restructuring of
        that loop.  Returns everything ``render_view`` consumes."""
        preds: Dict[str, jnp.ndarray] = {}
        if encode:
            enc = self.encode(geom, lbs_motion, face_embs, noise_key)
            embs = enc["embs"]
            face_embs_body = enc["face_embs"]
            preds.update(enc)
        elif face_embs_body is None and face_embs is not None:
            # driving mode with the body encode HOISTED: at the product
            # operating point the geometry fed to encode() is the LBS-posed
            # template (render_codes.py:107-114), which encode() immediately
            # unposes back — the body encoder's input is the template for
            # EVERY frame, so its 9.1 ms/frame (measured, probe_encode_split)
            # can be computed once (template_body_embs) and passed as `embs`;
            # only the per-frame face-code translation (1.1 ms) remains.
            face_embs_body = self.face_codes_to_body_embs(face_embs)
        dec = self.decoder(lbs_motion, embs, face_embs_body)
        geom_rec = self.assets.lbs.pose(dec["geom_delta_rec"], lbs_motion)
        if use_pose_shadow:
            shadow = self.pose_to_shadow(lbs_motion)
        else:
            shadow = self.shadow_net(ao)
        shadow_seamed = self.assets.seam_2k.fused_apply(
            shadow["shadow_map"], n_resample=2
        )
        preds.update(geom=geom_rec, shadow_seamed=shadow_seamed, **dec, **shadow)
        return preds

    def render_view(
        self,
        decoded: Dict[str, jnp.ndarray],  # decode_frame output (or a subset)
        campos: jnp.ndarray,  # [B, 3]
        K: jnp.ndarray,
        Rt: jnp.ndarray,
        render_display: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """The PER-CAMERA half of a product frame: view-conditioned texture
        residual, texture finalisation, projection, display packing and
        rasterisation.  ``decoded`` only needs the keys {geom, tex_mean_rec,
        shadow_seamed}; call once per rig camera over the same decoded
        batch."""
        geom_rec = decoded["geom"]
        dec_view = self.decoder_view(geom_rec, decoded["tex_mean_rec"], campos)
        tex_rec = self.forward_tex(
            decoded["tex_mean_rec"],
            dec_view["tex_view_rec"],
            None,
            final_seam=not render_display,
            shadow_seamed=decoded["shadow_seamed"],
        )
        from audio2photoreal_tpu.render.geometry import project_points

        pix, depth = project_points(geom_rec, K, Rt)
        tex_packed = None
        if render_display:
            from audio2photoreal_tpu.ops.gridsample import pack_rgb8
            from audio2photoreal_tpu.render.color import linear2display_batch

            tex_packed = pack_rgb8(linear2display_batch(tex_rec.astype(jnp.float32)))
            tex_packed = self.assets.seam_2k.fused_apply_packed(tex_packed, 2)
        rgb, raster = render_mesh(
            pix, depth, self.assets.geo.faces, self.assets.geo.uv_coords,
            self.assets.geo.uv_faces, tex_rec,
            self.cfg.image_height, self.cfg.image_width,
            packed_display=render_display,
            texture_packed=tex_packed,
        )
        return {
            "rgb": rgb,
            "tex_rec": tex_rec,
            "depth": raster.depth,
            "pix_to_face": raster.face_index,
            **dec_view,
        }

    def __call__(
        self,
        lbs_motion: jnp.ndarray,  # [B, 104]
        campos: jnp.ndarray,  # [B, 3]
        geom: Optional[jnp.ndarray] = None,  # [B, V, 3] GT posed (encode path)
        face_embs: Optional[jnp.ndarray] = None,  # HQLP codes [B, 256]
        K: Optional[jnp.ndarray] = None,
        Rt: Optional[jnp.ndarray] = None,
        embs: Optional[jnp.ndarray] = None,
        face_embs_body: Optional[jnp.ndarray] = None,
        ao: Optional[jnp.ndarray] = None,
        encode: bool = True,
        use_pose_shadow: bool = True,
        render: bool = True,
        noise_key=None,
        render_display: bool = False,
        cam_idx: Optional[jnp.ndarray] = None,  # [B] int — training calibration
        training: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """``render_display=True`` is the production video path: the display
        transform (utils/image.py linear2displayBatch) runs densely over the
        UV texture and the rasterizer samples a packed-RGB8 display-space
        texture — preds["rgb"] is then display [0, 255] float (uint8-ready)
        instead of linear.  Exact-linear rendering stays the default."""
        preds: Dict[str, jnp.ndarray] = {}
        if encode:
            enc = self.encode(geom, lbs_motion, face_embs, noise_key)
            embs = enc["embs"]
            face_embs_body = enc["face_embs"]
            preds.update(enc)

        dec = self.decoder(lbs_motion, embs, face_embs_body)
        geom_rec = self.assets.lbs.pose(dec["geom_delta_rec"], lbs_motion)
        dec_view = self.decoder_view(geom_rec, dec["tex_mean_rec"], campos)

        if training and ao is not None:
            # training branch (mesh_vae_drivable.py:322-329): the texture uses
            # the GT-AO shadow; pose_to_shadow trains against it (its map is
            # exposed for a distillation loss, train/loops.py)
            shadow = self.shadow_net(ao)
            shadow["pose_shadow_map"] = self.pose_to_shadow(lbs_motion)["shadow_map"]
        elif use_pose_shadow:
            shadow = self.pose_to_shadow(lbs_motion)
        else:
            shadow = self.shadow_net(ao)
        tex_rec = self.forward_tex(
            dec["tex_mean_rec"], dec_view["tex_view_rec"], shadow["shadow_map"],
            final_seam=not render_display,
        )
        if training and self.cfg.n_cameras > 0 and cam_idx is not None:
            # per-camera color calibration on the texture (:337-339)
            tex_rec = self.cal(tex_rec, cam_idx)

        preds.update(geom=geom_rec, tex_rec=tex_rec, **dec, **shadow, **dec_view)

        if render and K is not None and Rt is not None:
            from audio2photoreal_tpu.render.geometry import project_points

            pix, depth = project_points(geom_rec, K, Rt)
            if training:
                # visibility is non-differentiable (and the Pallas raster has
                # no VJP); geometry trains through the direct vertex loss
                # (make_avatar_train_step), texture/calibration through rgb
                pix = jax.lax.stop_gradient(pix)
                depth = jax.lax.stop_gradient(depth)
            tex_out = tex_rec
            tex_packed = None
            if render_display:
                from audio2photoreal_tpu.ops.gridsample import pack_rgb8
                from audio2photoreal_tpu.render.color import linear2display_batch

                # display transform → pack RGB8 → final seam fixup applied in
                # display-packed space (one int32 channel; see
                # SeamSampler.fused_apply_packed for the ≤1-LSB deviation)
                tex_packed = pack_rgb8(linear2display_batch(tex_rec.astype(jnp.float32)))
                tex_packed = self.assets.seam_2k.fused_apply_packed(tex_packed, 2)
            rgb, raster = render_mesh(
                pix, depth, self.assets.geo.faces, self.assets.geo.uv_coords,
                self.assets.geo.uv_faces, tex_out,
                self.cfg.image_height, self.cfg.image_width,
                packed_display=render_display,
                texture_packed=tex_packed,
            )
            if training and self.cfg.n_cameras > 0 and cam_idx is not None:
                # per-camera depth-of-field proxy + pixel bias on the render
                # (mesh_vae_drivable.py:363-371)
                rgb = self.learn_blur(rgb, cam_idx)
                rgb = rgb + self.pixel_cal(cam_idx)
            preds.update(rgb=rgb, depth=raster.depth, pix_to_face=raster.face_index)
        return preds
