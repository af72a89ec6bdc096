"""ca_body subnet conversion parity vs the REAL reference modules.

These tests import the actual mounted reference implementation
(/root/reference/visualize/ca_body/nn/{blocks,unet,shadow,face}.py — reference
code is used ONLY at test time to verify converted-checkpoint numerics, never
vendored), randomly initialize each subnet, convert its state_dict with
train/convert.py, and assert our flax modules reproduce the torch forward.
This pins the exact path a real body_dec.ckpt takes through
convert_body_avatar.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio2photoreal_tpu.train import convert

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# face.py needs the `attrdict` package (not installed) — a dict subclass with
# attribute access is all it uses
if "attrdict" not in sys.modules:
    class _AttrDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod = types.ModuleType("attrdict")
    mod.AttrDict = _AttrDict
    sys.modules["attrdict"] = mod

from visualize.ca_body.nn.blocks import (  # noqa: E402
    ConvBlock as RefConvBlock,
    ConvDownBlock as RefConvDownBlock,
    UpConvBlockDeep as RefUpConvBlockDeep,
    UpscaleNet as RefUpscaleNet,
)
from visualize.ca_body.nn.shadow import (  # noqa: E402
    PoseToShadow as RefPoseToShadow,
    ShadowUNet as RefShadowUNet,
)
from visualize.ca_body.nn.unet import UNetWB as RefUNetWB  # noqa: E402

torch.manual_seed(0)


def to_np(x):
    return x.detach().cpu().numpy()


def _rand_init(mod):
    """Perturb all weight_v/g/bias so ones-init g doesn't mask norm-axis bugs."""
    with torch.no_grad():
        for name, p in mod.named_parameters():
            p.add_(0.3 * torch.randn_like(p))
    return mod.eval()


def _nchw(x):
    return jnp.asarray(to_np(x).transpose(0, 2, 3, 1))


def _assert_close(out_j, out_t, atol=3e-5):
    np.testing.assert_allclose(
        np.asarray(out_j), to_np(out_t).transpose(0, 2, 3, 1), atol=atol, rtol=1e-4
    )


def test_conv_block_matches_reference():
    from audio2photoreal_tpu.render.blocks import ConvBlock

    ref = _rand_init(RefConvBlock(6, 10, 16))
    x = torch.randn(2, 6, 16, 16)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"b.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert._conv_block(sd, "b")}
    out_j = ConvBlock(10, 16).apply(params, _nchw(x))
    _assert_close(out_j, out_t)


def test_conv_down_block_matches_reference():
    from audio2photoreal_tpu.render.blocks import ConvDownBlock

    ref = _rand_init(RefConvDownBlock(6, 10, 16))
    x = torch.randn(2, 6, 16, 16)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"b.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert._conv_block(sd, "b")}
    out_j = ConvDownBlock(10, 16).apply(params, _nchw(x))
    _assert_close(out_j, out_t)


def test_up_conv_block_deep_matches_reference():
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep

    ref = _rand_init(RefUpConvBlockDeep(6, 10, 16))
    x = torch.randn(2, 6, 8, 8)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"b.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert._conv_block(sd, "b")}
    out_j = UpConvBlockDeep(10, 16).apply(params, _nchw(x))
    _assert_close(out_j, out_t)


def test_up_conv_block_deep_grouped_matches_reference():
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep

    ref = _rand_init(RefUpConvBlockDeep(8, 12, 16, groups=2))
    x = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"b.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert._conv_block(sd, "b")}
    out_j = UpConvBlockDeep(12, 16, groups=2).apply(params, _nchw(x))
    _assert_close(out_j, out_t)


def test_up_conv_block_deep_s2d_path_matches_reference():
    """size ≥ 256 with ≤32 channels/group triggers the space-to-depth conv
    algebra — must stay numerically equal to the reference block."""
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep

    ref = _rand_init(RefUpConvBlockDeep(32, 32, 256, groups=2))
    x = torch.randn(1, 32, 128, 128)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"b.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert._conv_block(sd, "b")}
    blk = UpConvBlockDeep(32, 256, groups=2)
    assert blk._use_s2d(32)
    out_j = blk.apply(params, _nchw(x))
    _assert_close(out_j, out_t, atol=1e-4)


def test_unet_wb_matches_reference():
    from audio2photoreal_tpu.render.unet import UNetWB

    ref = _rand_init(RefUNetWB(4, 3, size=64, n_init_ftrs=4))
    x = torch.randn(2, 4, 64, 64)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"u.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert.convert_unet_wb(sd, "u")}
    out_j = UNetWB(3, 64, n_init_ftrs=4).apply(params, _nchw(x))
    _assert_close(out_j, out_t)


def test_unet_wb_s2d_path_matches_reference():
    """size ≥ 512 with F ≤ 16 triggers the s2d down/up conv algebra — must
    stay numerically equal to the reference UNetWB."""
    from audio2photoreal_tpu.render.unet import UNetWB

    ref = _rand_init(RefUNetWB(4, 3, size=512, n_init_ftrs=8))
    x = torch.randn(1, 4, 512, 512)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"u.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert.convert_unet_wb(sd, "u")}
    out_j = UNetWB(3, 512, n_init_ftrs=8).apply(params, _nchw(x))
    _assert_close(out_j, out_t, atol=1e-4)


def test_shadow_unet_matches_reference():
    from audio2photoreal_tpu.render.shadow import ShadowUNet

    ao_mean = np.random.RandomState(0).rand(1, 64, 64).astype(np.float32)
    ref = _rand_init(
        RefShadowUNet(uv_size=128, ao_mean=ao_mean, shadow_size=64, n_dims=8, biases=False)
    )
    x = torch.rand(2, 1, 64, 64)
    with torch.no_grad():
        out_t = ref(x)["shadow_map"]
    sd = {f"s.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert.convert_shadow_unet(sd, "s")}
    model = ShadowUNet(
        uv_size=128, shadow_size=64, n_dims=8, biases=False,
        ao_mean=jnp.asarray(ao_mean.transpose(1, 2, 0)),
    )
    out_j = model.apply(params, _nchw(x))["shadow_map"]
    _assert_close(out_j, out_t)


def test_pose_to_shadow_matches_reference():
    from audio2photoreal_tpu.render.shadow import PoseToShadow

    ref = _rand_init(RefPoseToShadow(n_pose_dims=104, uv_size=256))
    pose = torch.randn(2, 104)
    with torch.no_grad():
        out_t = ref(pose)["shadow_map"]
    sd = {f"p.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert.convert_pose_to_shadow(sd, "p")}
    model = PoseToShadow(n_pose_dims=104, uv_size=256)
    out_j = model.apply(params, jnp.asarray(to_np(pose)))["shadow_map"]
    _assert_close(out_j, out_t)


def test_upscale_net_matches_reference():
    from audio2photoreal_tpu.render.blocks import UpscaleNet

    ref = _rand_init(RefUpscaleNet(in_channels=6, out_channels=3, n_ftrs=4, size=32))
    x = torch.randn(2, 6, 32, 32)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"u.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert.convert_upscale_net(sd, "u")}
    out_j = UpscaleNet(out_channels=3, n_ftrs=4, size=32, n_convs=2).apply(params, _nchw(x))
    _assert_close(out_j, out_t)


def test_upscale_net_s2d2_path_matches_reference():
    """The opt-in LEVEL-2 space-to-depth conv algebra (4×4 blocks) must stay
    numerically equal to the reference (it loses to level 1 in the full
    decoder, so production keeps the default — but the algebra is exact)."""
    from audio2photoreal_tpu.render.blocks import UpscaleNet

    ref = _rand_init(RefUpscaleNet(in_channels=6, out_channels=3, n_ftrs=4, size=512))
    x = torch.randn(1, 6, 512, 512)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"u.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert.convert_upscale_net(sd, "u")}
    out_j = UpscaleNet(out_channels=3, n_ftrs=4, size=512, s2d_level=2, n_convs=2).apply(
        params, _nchw(x)
    )
    _assert_close(out_j, out_t, atol=1e-4)


def test_up_conv_block_deep_s2d2_path_matches_reference():
    """Opt-in level-2 s2d path in UpConvBlockDeep stays exact."""
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep

    ref = _rand_init(RefUpConvBlockDeep(32, 32, 512, groups=2))
    x = torch.randn(1, 32, 256, 256)
    with torch.no_grad():
        out_t = ref(x)
    sd = {f"b.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert._conv_block(sd, "b")}
    blk = UpConvBlockDeep(32, 512, groups=2, s2d_level=2)
    assert blk._use_s2d(32)
    out_j = blk.apply(params, _nchw(x))
    _assert_close(out_j, out_t, atol=2e-4)


def test_geom_diagnostics_match_reference():
    """project_points_multi / depth2normals vs the real reference geom.py
    (pytorch3d stubbed — only the UV rasterizer needs it)."""
    if "pytorch3d" not in sys.modules:
        p3d = types.ModuleType("pytorch3d")
        rmm = types.ModuleType("pytorch3d.renderer.mesh.rasterize_meshes")
        rmm.rasterize_meshes = None
        struct = types.ModuleType("pytorch3d.structures")
        struct.Meshes = None
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.renderer"] = types.ModuleType("pytorch3d.renderer")
        sys.modules["pytorch3d.renderer.mesh"] = types.ModuleType("pytorch3d.renderer.mesh")
        sys.modules["pytorch3d.renderer.mesh.rasterize_meshes"] = rmm
        sys.modules["pytorch3d.structures"] = struct
    from visualize.ca_body.utils import geom as ref_geom

    from audio2photoreal_tpu.render import geometry as our_geom

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, NC, N = 2, 3, 11
    p = rng.randn(B, N, 3).astype(np.float32)
    Rt = np.tile(np.eye(3, 4, dtype=np.float32), (B, NC, 1, 1))
    Rt[..., 3] = rng.rand(B, NC, 3) + np.array([0, 0, 4.0], np.float32)
    K = np.tile(np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32), (B, NC, 1, 1))
    pix_t, d_t = ref_geom.project_points_multi(
        torch.as_tensor(p), torch.as_tensor(Rt), torch.as_tensor(K)
    )
    pix_j, d_j = our_geom.project_points_multi(
        jnp.asarray(p), jnp.asarray(Rt), jnp.asarray(K)
    )
    np.testing.assert_allclose(np.asarray(pix_j), to_np(pix_t), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_j), to_np(d_t), atol=1e-5)

    depth = (rng.rand(B, 12, 16) * 3 + 1).astype(np.float32)
    focal = np.tile(np.array([[120.0, 0], [0, 130.0]], np.float32), (B, 1, 1))
    pp = np.tile(np.array([8.0, 6.0], np.float32), (B, 1))
    n_t = ref_geom.depth2normals(
        torch.as_tensor(depth)[:, None], torch.as_tensor(focal), torch.as_tensor(pp)
    )
    n_j = our_geom.depth2normals(jnp.asarray(depth), jnp.asarray(focal), jnp.asarray(pp))
    np.testing.assert_allclose(
        np.asarray(n_j), to_np(n_t).transpose(0, 2, 3, 1), atol=1e-5
    )


def test_color_pipeline_matches_reference_image_py():
    """srgb2linear / linear2color_corr_inv / mapped2linear / dilate / erode
    vs the real reference visualize/ca_body/utils/image.py."""
    from visualize.ca_body.utils import image as ref_img

    from audio2photoreal_tpu.render import color as our

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    xt = torch.as_tensor(x)

    np.testing.assert_allclose(
        np.asarray(our.srgb2linear(jnp.asarray(x))), to_np(ref_img.srgb2linear(xt)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(our.linear2color_corr_inv(jnp.asarray(x), -1)),
        to_np(ref_img.linear2color_corr_inv(xt, -1)),
        atol=1e-5,
    )
    ccm = [[0.9, 0.05, 0.05], [0.1, 0.8, 0.1], [0.0, 0.1, 0.9]]
    dc = [0.01, 0.02, 0.03]
    np.testing.assert_allclose(
        np.asarray(our.mapped2linear(jnp.asarray(x), -1, ccm, dc, 2.2)),
        np.asarray(ref_img.mapped2linear(x, -1, ccm, dc, 2.2)),
        atol=1e-5,
    )
    m = (rng.rand(2, 10, 10) > 0.7)
    np.testing.assert_array_equal(
        np.asarray(our.dilate(jnp.asarray(m), 3)),
        to_np(ref_img.dilate(torch.as_tensor(m), 3)[:, 0]),
    )
    np.testing.assert_array_equal(
        np.asarray(our.erode(jnp.asarray(m), 3)),
        to_np(ref_img.erode(torch.as_tensor(m), 3)[:, 0]),
    )


def test_seam_table_conversion_matches_reference():
    """seam_from consumes the reference seam_data schema (dst_ij/src_ij [N,2],
    dense uvs [H,W,2] in [0,1], dense weights [H,W]) and reproduces the
    reference SeamSampler's impaint+resample to float tolerance."""
    from visualize.ca_body.utils.seams import SeamSampler as RefSeamSampler

    rng = np.random.RandomState(0)
    S = 16
    n_pairs = 10
    dst_ij = rng.randint(0, S, (n_pairs, 2))
    src_ij = rng.randint(0, S, (n_pairs, 2))
    uvs = rng.rand(S, S, 2).astype(np.float32) * 0.9 + 0.05
    weights = np.zeros((S, S), np.float32)
    sel = rng.rand(S, S) < 0.2
    weights[sel] = rng.rand(sel.sum()).astype(np.float32)

    seam_data = {
        "dst_ij": torch.as_tensor(dst_ij),
        "src_ij": torch.as_tensor(src_ij),
        "uvs": torch.as_tensor(uvs),
        "weights": torch.as_tensor(weights)[None, :, :, None].permute(0, 3, 1, 2),
    }
    # reference stores weights broadcastable over channels: [1, H, W] works
    ref = RefSeamSampler(
        {
            "dst_ij": seam_data["dst_ij"],
            "src_ij": seam_data["src_ij"],
            "uvs": torch.as_tensor(uvs),
            "weights": torch.as_tensor(weights)[None],
        }
    )
    tex = torch.randn(2, 3, S, S)
    with torch.no_grad():
        out_t = ref(tex)  # impaint → resample

    from audio2photoreal_tpu.render.assets import convert_static_assets  # noqa: F401

    # drive seam_from through its real entry (module-level import indirection)
    import audio2photoreal_tpu.render.assets as assets_mod

    sampler = assets_mod.seam_sampler_from_reference(
        {"dst_ij": dst_ij, "src_ij": src_ij, "uvs": uvs, "weights": weights}, S
    )
    out_j = sampler(jnp.asarray(to_np(tex).transpose(0, 2, 3, 1)))
    _assert_close(out_j, out_t, atol=1e-5)


def test_face_decoder_frontal_matches_reference():
    from audio2photoreal_tpu.render.face import FaceDecoderFrontal

    from visualize.ca_body.nn.face import FaceDecoderFrontal as RefFace

    assets = sys.modules["attrdict"].AttrDict(
        {"face_frontal_view": np.array([0.0, 0.0, 1.0], np.float32)}
    )
    # small texture: 64² output → 4 tex ups
    ref = _rand_init(
        RefFace(assets, n_latent=16, n_vert_out=3 * 11,
                tex_out_shp=(64, 64), tex_roi=((0, 0), (64, 64)))
    )
    # shrink the torch pyramid to 4 ups to match tex 64: rebuild texmod
    import torch.nn as tnn

    import visualize.ca_body.nn.layers as la

    ref.texmod = tnn.Sequential(
        la.ConvTranspose2dWNUB(256, 64, 8, 8, 4, 2, 1), tnn.LeakyReLU(0.2, True),
        la.ConvTranspose2dWNUB(64, 32, 16, 16, 4, 2, 1), tnn.LeakyReLU(0.2, True),
        la.ConvTranspose2dWNUB(32, 8, 32, 32, 4, 2, 1), tnn.LeakyReLU(0.2, True),
        la.ConvTranspose2dWNUB(8, 3, 64, 64, 4, 2, 1),
    )
    _rand_init(ref)
    embs = torch.randn(2, 16)
    with torch.no_grad():
        out_t = ref(embs)
    sd = {f"f.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": convert.convert_face_decoder(sd, "f", n_tex_ups=4)}

    model = FaceDecoderFrontal(
        frontal_view=jnp.asarray(assets["face_frontal_view"]),
        n_latent=16, n_vert_out=3 * 11, tex_size=64,
        tex_pyramid=(64, 32, 8, 3),
    )
    out_j = model.apply(params, jnp.asarray(to_np(embs)))
    np.testing.assert_allclose(
        np.asarray(out_j["face_geom"]), to_np(out_t["face_geom"]), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_j["face_tex"]),
        to_np(out_t["face_tex"]).transpose(0, 2, 3, 1),
        atol=2e-3, rtol=1e-4,
    )
