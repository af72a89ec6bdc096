"""torch → JAX checkpoint converters.

Maps the reference's released state_dicts onto this framework's param trees:
- FiLMTransformer (model/diffusion.py:82-403) → FiLMDenoiser
- GuideTransformer (model/guide.py:26-222) → GuideTransformer
- TemporalVertexCodec (model/vqvae.py:395-550) → codec params + VQState
- fairseq wav2vec feature extractor/aggregator → audio_frontend params

Conventions:
- torch Linear weight [out, in] → flax Dense kernel [in, out] (transpose)
- torch Conv1d [Cout, Cin, K] → [K, Cin, Cout]
- torch MultiheadAttention packed in_proj_weight [3D, D] → q/k/v kernels
- weight-norm pairs (weight_g, weight_v) stay split (render layers keep v/g)

All converters are host-side numpy; they never require a GPU or fairseq —
only the state_dict file.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(sd: Dict[str, Any], key: str) -> np.ndarray:
    v = sd[key]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def linear(sd, prefix) -> Dict[str, np.ndarray]:
    return {"kernel": _t(sd, f"{prefix}.weight").T, "bias": _t(sd, f"{prefix}.bias")}


def layernorm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd, f"{prefix}.weight"), "bias": _t(sd, f"{prefix}.bias")}


def conv1d(sd, prefix) -> Tuple[np.ndarray, np.ndarray]:
    """torch [Cout, Cin, K] → ([K, Cin, Cout], bias)."""
    w = _t(sd, f"{prefix}.weight").transpose(2, 1, 0)
    b = _t(sd, f"{prefix}.bias") if f"{prefix}.bias" in sd else np.zeros(w.shape[-1], np.float32)
    return w, b


def mha(sd, prefix) -> Dict[str, Any]:
    """torch nn.MultiheadAttention → {q,k,v,out}_proj Dense trees."""
    w = _t(sd, f"{prefix}.in_proj_weight")
    b = _t(sd, f"{prefix}.in_proj_bias")
    D = w.shape[1]
    wq, wk, wv = w[:D], w[D : 2 * D], w[2 * D :]
    bq, bk, bv = b[:D], b[D : 2 * D], b[2 * D :]
    return {
        "q_proj": {"kernel": wq.T, "bias": bq},
        "k_proj": {"kernel": wk.T, "bias": bk},
        "v_proj": {"kernel": wv.T, "bias": bv},
        "out_proj": {
            "kernel": _t(sd, f"{prefix}.out_proj.weight").T,
            "bias": _t(sd, f"{prefix}.out_proj.bias"),
        },
    }


def film(sd, prefix) -> Dict[str, Any]:
    """DenseFiLM.block = Sequential(Mish, Linear) (transformer_modules.py:105-120)."""
    return {"proj": linear(sd, f"{prefix}.block.1")}


def film_decoder_layer(sd, prefix, use_cm: bool) -> Dict[str, Any]:
    out = {
        "self_attn": mha(sd, f"{prefix}.self_attn"),
        "cross_attn": mha(sd, f"{prefix}.multihead_attn"),
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "norm3": layernorm(sd, f"{prefix}.norm3"),
        "film1": film(sd, f"{prefix}.film1"),
        "film2": film(sd, f"{prefix}.film2"),
        "film3": film(sd, f"{prefix}.film3"),
        "ff": {
            "linear1": linear(sd, f"{prefix}.linear1"),
            "linear2": linear(sd, f"{prefix}.linear2"),
        },
    }
    if use_cm:
        out["cross_attn2"] = mha(sd, f"{prefix}.multihead_attn2")
        out["norm2a"] = layernorm(sd, f"{prefix}.norm2a")
        out["film2a"] = film(sd, f"{prefix}.film2a")
    return out


def encoder_layer_rotary(sd, prefix) -> Dict[str, Any]:
    return {
        "self_attn": mha(sd, f"{prefix}.self_attn"),
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "ff": {
            "linear1": linear(sd, f"{prefix}.linear1"),
            "linear2": linear(sd, f"{prefix}.linear2"),
        },
    }


def convert_wav2vec_extractor(sd, prefix: str = "feature_extractor") -> Dict[str, Any]:
    """fairseq ConvFeatureExtractionModel → ConvFeatureExtractor params.

    fairseq layout per layer: ``conv_layers.{i}.0.weight`` (conv, no bias) and
    ``conv_layers.{i}.2.{weight,bias}`` (Fp32GroupNorm)."""
    out: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.conv_layers.{i}.0.weight" in sd:
        w = _t(sd, f"{prefix}.conv_layers.{i}.0.weight").transpose(2, 1, 0)
        out[f"conv{i}_kernel"] = w
        gn_w, gn_b = None, None
        for j in (1, 2, 3):
            if f"{prefix}.conv_layers.{i}.{j}.weight" in sd:
                gn_w = _t(sd, f"{prefix}.conv_layers.{i}.{j}.weight").reshape(-1)
                gn_b = _t(sd, f"{prefix}.conv_layers.{i}.{j}.bias").reshape(-1)
                break
        if gn_w is None:
            gn_w = np.ones(w.shape[-1], np.float32)
            gn_b = np.zeros(w.shape[-1], np.float32)
        out[f"norm{i}"] = {"scale": gn_w, "bias": gn_b}
        i += 1
    return out


def convert_wav2vec_aggregator(sd, prefix: str = "feature_aggregator") -> Dict[str, Any]:
    """fairseq ConvAggegator → ConvAggregator params.

    fairseq layout per layer (wav2vec.py ConvAggegator.block): Sequential(
    pad, Conv1d, Dropout, norm, activation) — conv weight at sequential index
    1, norm affine at index 3.  Scanned robustly: within each
    ``conv_layers.{i}.*`` the 3-D weight is the conv, the 1-D weight+bias pair
    is the norm.  Residual projections (``rproj``, used when in/out dims
    differ) are not present in the 512→512 wav2vec_large aggregator."""
    out: Dict[str, Any] = {}
    i = 0
    while any(k.startswith(f"{prefix}.conv_layers.{i}.") for k in sd):
        conv_w = conv_b = norm_w = norm_b = None
        for j in range(6):
            wkey = f"{prefix}.conv_layers.{i}.{j}.weight"
            if wkey not in sd:
                continue
            w = _t(sd, wkey)
            if w.ndim == 3:
                conv_w = w.transpose(2, 1, 0)
                bkey = f"{prefix}.conv_layers.{i}.{j}.bias"
                conv_b = (
                    _t(sd, bkey) if bkey in sd else np.zeros(w.shape[0], np.float32)
                )
            elif w.ndim == 1:
                norm_w = w.reshape(-1)
                norm_b = _t(sd, f"{prefix}.conv_layers.{i}.{j}.bias").reshape(-1)
        assert conv_w is not None, f"no conv weight in {prefix}.conv_layers.{i}"
        out[f"conv{i}_kernel"] = conv_w
        out[f"conv{i}_bias"] = conv_b
        if norm_w is None:
            norm_w = np.ones(conv_w.shape[-1], np.float32)
            norm_b = np.zeros(conv_w.shape[-1], np.float32)
        out[f"norm{i}"] = {"scale": norm_w, "bias": norm_b}
        i += 1
    return out


def _enc_layer_plain(sd, prefix) -> Dict[str, Any]:
    """TransformerEncoderLayer (transformer_modules.py:450-472) → _EncLayer."""
    return {
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "self_attn": mha(sd, f"{prefix}.self_attn.self_attn"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "ff": {
            "linear1": linear(sd, f"{prefix}.feedforward.ff.0"),
            "linear2": linear(sd, f"{prefix}.feedforward.ff.3"),
        },
    }


def _dec_layer_plain(sd, prefix) -> Dict[str, Any]:
    """TransformerDecoderLayer (transformer_modules.py:475-511) → _DecLayer."""
    return {
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "self_attn": mha(sd, f"{prefix}.self_attn.self_attn"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "cross_attn": mha(sd, f"{prefix}.cross_attn.cross_attn"),
        "norm3": layernorm(sd, f"{prefix}.norm3"),
        "ff": {
            "linear1": linear(sd, f"{prefix}.feedforward.ff.0"),
            "linear2": linear(sd, f"{prefix}.feedforward.ff.3"),
        },
    }


def convert_lip_regressor(
    sd: Dict[str, Any],
    enc_layers: int = 2,
    dec_layers: int = 4,
    prefix: str = "",
) -> Dict[str, Any]:
    """Audio2LipRegressionTransformer (model/diffusion.py:37-79, checkpoint
    assets/iter-0200000.pt ``model_state_dict``) → LipRegressor params.

    ``prefix`` lets the same mapping lift the copy embedded in a face
    FiLMTransformer state_dict (``lip_model.`` there, diffusion.py:273-280)."""
    p: Dict[str, Any] = {}
    p["audio_encoder"] = {
        "feature_extractor": convert_wav2vec_extractor(
            sd, f"{prefix}audio_encoder.wav2vec_model.feature_extractor"
        ),
        "feature_aggregator": convert_wav2vec_aggregator(
            sd, f"{prefix}audio_encoder.wav2vec_model.feature_aggregator"
        ),
    }
    for i in range(enc_layers):
        p[f"enc_{i}"] = _enc_layer_plain(
            sd, f"{prefix}regression_model.transformer_encoder.{i}"
        )
    for i in range(dec_layers):
        p[f"dec_{i}"] = _dec_layer_plain(
            sd, f"{prefix}regression_model.transformer_decoder.{i}"
        )
    p["project_output"] = linear(sd, f"{prefix}project_output")
    return {"params": p}


def convert_film_denoiser(sd: Dict[str, Any], data_format: str, num_layers: int,
                          cond_encoder_layers: int = 2) -> Dict[str, Any]:
    """FiLMTransformer state_dict → FiLMDenoiser params['params'] tree."""
    p: Dict[str, Any] = {}
    p["input_projection"] = linear(sd, "input_projection")
    p["cond_projection"] = linear(sd, "cond_projection")
    p["norm_cond"] = layernorm(sd, "norm_cond")
    p["time_dense"] = linear(sd, "time_mlp.1")
    p["to_time_cond"] = linear(sd, "to_time_cond.0")
    p["to_time_tokens"] = linear(sd, "to_time_tokens.0")
    p["non_attn_norm"] = layernorm(sd, "non_attn_cond_projection.0")
    p["non_attn_d1"] = linear(sd, "non_attn_cond_projection.1")
    p["non_attn_d2"] = linear(sd, "non_attn_cond_projection.3")
    p["null_cond_embed"] = _t(sd, "null_cond_embed")
    p["null_cond_hidden"] = _t(sd, "null_cond_hidden")
    for i in range(num_layers):
        p[f"decoder_{i}"] = film_decoder_layer(
            sd, f"seqTransDecoder.stack.{i}", use_cm=(data_format == "pose")
        )
    p["final_layer"] = linear(sd, "final_layer")
    if data_format == "pose":
        p["null_pose_embed"] = _t(sd, "null_pose_embed")
        p["frame_cond_projection"] = linear(sd, "frame_cond_projection")
        p["frame_norm_cond"] = layernorm(sd, "frame_norm_cond")
        for i in range(6):
            w, b = conv1d(sd, f"post_pose_layers.{i}")
            p[f"post_conv{i}_kernel"] = w
            p[f"post_conv{i}_bias"] = b
        w, b = conv1d(sd, "final_conv")
        p["final_conv_kernel"] = w
        p["final_conv_bias"] = b
    if data_format == "face":
        for i in range(cond_encoder_layers):
            p[f"cond_encoder_{i}"] = encoder_layer_rotary(sd, f"cond_encoder.{i}")
        # the frozen lip regressor rides inside the face checkpoint
        # (diffusion.py:273-280 registers it as a submodule)
        if any(k.startswith("lip_model.") for k in sd):
            p["lip_model"] = convert_lip_regressor(sd, prefix="lip_model.")["params"]
    # frozen audio model (if bundled in the same state dict)
    if any(k.startswith("audio_model.feature_extractor") for k in sd):
        p["audio_frontend"] = {
            "feature_extractor": convert_wav2vec_extractor(sd, "audio_model.feature_extractor")
        }
    return {"params": p}


def convert_guide(
    sd: Dict[str, Any],
    num_layers: int,
    num_audio_layers: int = 2,
    null_embed_len: int = 2048,
) -> Dict[str, Any]:
    """GuideTransformer state_dict → params tree.

    The reference sizes null_cond_embed to a hardcoded audio length (798 for
    240-frame clips, 1998 for 600; model/guide.py:38,55); this framework keeps
    a ``null_embed_len`` buffer sliced at call time, so the torch rows are
    zero-padded up to it (the slice only ever reads the trained rows)."""
    p: Dict[str, Any] = {}
    p["token_embedding"] = {"embedding": _t(sd, "token_embedding.weight")}
    p["cond_projection"] = linear(sd, "cond_projection")
    p["norm_cond"] = layernorm(sd, "norm_cond")
    p["non_attn_norm"] = layernorm(sd, "non_attn_cond_projection.0")
    p["non_attn_d1"] = linear(sd, "non_attn_cond_projection.1")
    p["non_attn_d2"] = linear(sd, "non_attn_cond_projection.3")
    null = _t(sd, "null_cond_embed")
    if null.shape[1] < null_embed_len:
        null = np.pad(null, ((0, 0), (0, null_embed_len - null.shape[1]), (0, 0)))
    p["null_cond_embed"] = null
    p["null_cond_hidden"] = _t(sd, "null_cond_hidden")
    # pre_audio Sequential: per block 6 convs at indices 0,3,6,9,12,15 (+LReLU,
    # Dropout between), final 1×1 at the end (guide.py:84-118)
    pre: Dict[str, Any] = {}
    conv_idx = 0
    seq_idx = 0
    while f"pre_audio.{seq_idx}.weight" in sd or f"pre_audio.{seq_idx + 1}.weight" in sd:
        if f"pre_audio.{seq_idx}.weight" not in sd:
            seq_idx += 1
            continue
        w, b = conv1d(sd, f"pre_audio.{seq_idx}")
        total_convs = num_audio_layers * 6
        if conv_idx < total_convs:
            pre[f"conv{conv_idx}_kernel"] = w
            pre[f"conv{conv_idx}_bias"] = b
        else:
            pre["conv_out_kernel"] = w
            pre["conv_out_bias"] = b
        conv_idx += 1
        seq_idx += 3  # conv, lrelu, dropout
    p["pre_audio"] = pre
    for i in range(num_layers):
        p[f"decoder_{i}"] = film_decoder_layer(sd, f"seqTransDecoder.stack.{i}", use_cm=False)
    p["final_layer"] = linear(sd, "final_layer")
    if any(k.startswith("audio_model.feature_extractor") for k in sd):
        p["audio_frontend"] = {
            "feature_extractor": convert_wav2vec_extractor(sd, "audio_model.feature_extractor")
        }
    return {"params": p}


# --------------------------------------------------------------------- #
# ca_body codec avatar (body_dec.ckpt)
# --------------------------------------------------------------------- #


def wn_linear(sd, prefix) -> Dict[str, np.ndarray]:
    """la.LinearWN (weight_v [out,in], weight_g [out,1]) → {v, g, bias}."""
    return {
        "v": _t(sd, f"{prefix}.weight_v").T,
        "g": _t(sd, f"{prefix}.weight_g").reshape(-1),
        "bias": _t(sd, f"{prefix}.bias"),
    }


def _chw_to_hwc_perm(c: int, h: int, w: int) -> np.ndarray:
    """perm[i_hwc] = i_chw — maps torch's channel-major flat index onto the
    NHWC-major flat index used by this framework's reshape-to-spatial."""
    return np.arange(c * h * w).reshape(c, h, w).transpose(1, 2, 0).reshape(-1)


def wn_linear_spatial_out(sd, prefix, chw: Tuple[int, int, int]) -> Dict[str, np.ndarray]:
    """LinearWN whose OUTPUT is reshaped to a [C, 4, 4]-style spatial block in
    torch (e.g. PoseToShadow.fc_block, ConvDecoder.embs_fc) — permute the
    output rows so our NHWC reshape sees torch's values."""
    d = wn_linear(sd, prefix)
    perm = _chw_to_hwc_perm(*chw)
    return {"v": d["v"][:, perm], "g": d["g"][perm], "bias": d["bias"][perm]}


def wn_linear_spatial_in(
    sd, prefix, chw: Tuple[int, int, int], offset: int = 0
) -> Dict[str, np.ndarray]:
    """LinearWN whose INPUT is a flattened conv feature map (torch c-major,
    ours hwc-major) — permute the input rows (e.g. Encoder.mu/logvar,
    FaceEncoder.jointmod)."""
    d = wn_linear(sd, prefix)
    perm = _chw_to_hwc_perm(*chw)
    v = np.array(d["v"])
    n = perm.size
    v[offset : offset + n] = v[offset : offset + n][perm]
    return {**d, "v": v}


def wn_conv(sd, prefix, untied: bool) -> Dict[str, np.ndarray]:
    """la.Conv2dWN / Conv2dWNUB → {v, g, bias}.

    torch weight_v [Cout, Cin/g, kh, kw] → [kh, kw, Cin/g, Cout]; untied bias
    [Cout, H, W] → [H, W, Cout]."""
    v = _t(sd, f"{prefix}.weight_v").transpose(2, 3, 1, 0)
    g = _t(sd, f"{prefix}.weight_g").reshape(-1)
    b = _t(sd, f"{prefix}.bias")
    if untied:
        b = b.transpose(1, 2, 0)
    return {"v": v, "g": g, "bias": b}


def wn_convt(sd, prefix) -> Dict[str, np.ndarray]:
    """la.ConvTranspose2dWNUB (weight_v [Cin, Cout, kh, kw], g_dim=1) →
    {v [kh, kw, Cout, Cin], g [Cout], bias [H, W, Cout]}."""
    return {
        "v": _t(sd, f"{prefix}.weight_v").transpose(2, 3, 1, 0),
        "g": _t(sd, f"{prefix}.weight_g").reshape(-1),
        "bias": _t(sd, f"{prefix}.bias").transpose(1, 2, 0),
    }


def _conv_block(sd, prefix) -> Dict[str, Any]:
    """ConvBlock / ConvDownBlock / UpConvBlockDeep share {conv_resize
    (Conv2dWN), conv1, conv2 (Conv2dWNUB)} (ca_body/nn/blocks.py:232-420)."""
    return {
        "conv_resize": wn_conv(sd, f"{prefix}.conv_resize", untied=False),
        "conv1": wn_conv(sd, f"{prefix}.conv1", untied=True),
        "conv2": wn_conv(sd, f"{prefix}.conv2", untied=True),
    }


def convert_unet_wb(sd, prefix) -> Dict[str, Any]:
    """UNetWB (ca_body/nn/unet.py:16-97) → our UNetWB params."""
    unet: Dict[str, Any] = {}
    for i in range(1, 6):
        unet[f"down{i}"] = wn_conv(sd, f"{prefix}.down{i}.0", untied=True)
        unet[f"up{i}"] = wn_convt(sd, f"{prefix}.up{i}.0")
    unet["out"] = wn_conv(sd, f"{prefix}.out", untied=True)
    return unet


def convert_shadow_unet(sd, prefix) -> Dict[str, Any]:
    """ShadowUNet (ca_body/nn/shadow.py:25-192) → our ShadowUNet params."""
    sh: Dict[str, Any] = {}
    for i in range(4):
        sh[f"enc{i}"] = wn_conv(sd, f"{prefix}.enc_layers.{i}.0", untied=True)
        sh[f"dec{i}"] = wn_conv(sd, f"{prefix}.dec_layers.{i}.0", untied=True)
    # tied (Conv2dWN, biases=False) has a 1-D bias; untied has [C, H, W]
    untied = _t(sd, f"{prefix}.shadow_pred.bias").ndim == 3
    sh["shadow_pred"] = wn_conv(sd, f"{prefix}.shadow_pred", untied=untied)
    return sh


def convert_pose_to_shadow(sd, prefix) -> Dict[str, Any]:
    """PoseToShadow (ca_body/nn/shadow.py:418-462) → params."""
    pts: Dict[str, Any] = {
        "fc_block": wn_linear_spatial_out(sd, f"{prefix}.fc_block.0", (256, 4, 4))
    }
    for i in range(5):
        pts[f"conv{i}"] = wn_convt(sd, f"{prefix}.conv_block.{2 * i}")
    return pts


def convert_upscale_net(sd, prefix) -> Dict[str, Any]:
    """UpscaleNet → params.  Auto-detects the variant: the avatar's own
    single-conv definition (mesh_vae_drivable.py:740-770 — what body_dec.ckpt
    contains) or nn/blocks.py:757-786's two-conv one."""
    p = {
        "conv_block0": wn_conv(sd, f"{prefix}.conv_block.0", untied=True),
        "out_block": wn_conv(sd, f"{prefix}.out_block", untied=True),
    }
    if f"{prefix}.conv_block.2.weight_v" in sd:
        p["conv_block1"] = wn_conv(sd, f"{prefix}.conv_block.2", untied=True)
    return p


def convert_face_decoder(sd, prefix, n_tex_ups: int = 8) -> Dict[str, Any]:
    """FaceDecoderFrontal (ca_body/nn/face.py:18-85) → params."""
    fdec: Dict[str, Any] = {
        "encmod": wn_linear(sd, f"{prefix}.encmod.0"),
        "geommod": wn_linear(sd, f"{prefix}.geommod.0"),
        "viewmod": wn_linear(sd, f"{prefix}.viewmod.0"),
        "texmod2": wn_linear_spatial_out(sd, f"{prefix}.texmod2.0", (256, 4, 4)),
        "bias": _t(sd, f"{prefix}.bias").transpose(1, 2, 0),
    }
    for i in range(n_tex_ups):  # texmod Sequential conv indices 0,2,…
        fdec[f"texmod_up{i}"] = wn_convt(sd, f"{prefix}.texmod.{2 * i}")
    return fdec


def convert_body_avatar(sd: Dict[str, Any], n_blocks: int = 4) -> Dict[str, Any]:
    """ca_body AutoEncoder state_dict (body_dec.ckpt, loaded module-keyed by
    render_codes.py:76-87) → BodyAvatar params tree.

    Static buffers (tex_mean, cond masks, seam tables, LBS) are NOT params
    here — they ride in RendererAssets (render/assets.py).  ``n_blocks`` =
    log2(uv_size / init_uv_size) (mesh_vae_drivable.py:476-478)."""
    # accept either a raw state dict or the {"model_state_dict": ...} /
    # {"model": ...} wrappers used by ca_body's save_checkpoint
    for wrap in ("model_state_dict", "model"):
        if wrap in sd and not hasattr(sd[wrap], "detach"):
            sd = sd[wrap]
    p: Dict[str, Any] = {}

    # encoder (mesh_vae_drivable.py:376-455)
    enc: Dict[str, Any] = {"verts_conv": _conv_block(sd, "encoder.verts_conv")}
    for i in range(6):
        enc[f"joint{i}"] = _conv_block(sd, f"encoder.joint_conv_blocks.{i}")
    # mu/logvar read the flattened [128, 4, 4] conv map (c-major in torch)
    enc["mu"] = wn_linear_spatial_in(sd, "encoder.mu", (128, 4, 4))
    enc["logvar"] = wn_linear_spatial_in(sd, "encoder.logvar", (128, 4, 4))
    p["encoder"] = enc

    # face encoder (:637-719)
    fenc: Dict[str, Any] = {}
    for i in range(7):
        fenc[f"conv{i}"] = _conv_block(sd, f"encoder_face.conv_blocks.{i}")
    fenc["geommod"] = wn_linear(sd, "encoder_face.geommod.0")
    # jointmod input = concat([tex_enc (flattened [128,4,4]), geom_enc (256)])
    fenc["jointmod"] = wn_linear_spatial_in(sd, "encoder_face.jointmod.0", (128, 4, 4))
    fenc["mu"] = wn_linear(sd, "encoder_face.mu")
    fenc["logvar"] = wn_linear(sd, "encoder_face.logvar")
    p["encoder_face"] = fenc

    # frozen frontal face decoder (ca_body/nn/face.py:18-85)
    p["decoder_face"] = convert_face_decoder(sd, "decoder_face")

    # conv decoder (:456-635)
    dec: Dict[str, Any] = {
        "local_pose_conv_block": _conv_block(sd, "decoder.local_pose_conv_block"),
        "embs_fc": wn_linear_spatial_out(sd, "decoder.embs_fc.0", (128, 4, 4)),
        "face_embs_fc": wn_linear_spatial_out(sd, "decoder.face_embs_fc.0", (32, 4, 4)),
        "joint_conv_block": _conv_block(sd, "decoder.joint_conv_block"),
        "verts_conv": wn_conv(sd, "decoder.verts_conv", untied=True),
        "tex_conv": wn_conv(sd, "decoder.tex_conv", untied=True),
    }
    for i in range(4):
        dec[f"embs_conv{i}"] = _conv_block(sd, f"decoder.embs_conv_block.{i}")
    for i in range(3):
        dec[f"face_embs_conv{i}"] = _conv_block(sd, f"decoder.face_embs_conv_block.{i}")
    for b in range(n_blocks):
        dec[f"up{b}"] = _conv_block(sd, f"decoder.conv_blocks.{b}")
    p["decoder"] = dec

    # view decoder UNetWB (ca_body/nn/unet.py:16-97)
    p["decoder_view"] = {"unet": convert_unet_wb(sd, "decoder_view.unet")}

    # shadow net (ca_body/nn/shadow.py:25-192; biases=False in render_codes)
    p["shadow_net"] = convert_shadow_unet(sd, "shadow_net")

    # pose→shadow (ca_body/nn/shadow.py:418-462)
    if any(k.startswith("pose_to_shadow.") for k in sd):
        p["pose_to_shadow"] = convert_pose_to_shadow(sd, "pose_to_shadow")

    # upscale net (ca_body/nn/blocks.py:757-786)
    p["upscale_net"] = convert_upscale_net(sd, "upscale_net")
    return {"params": p}


def convert_vqvae(sd: Dict[str, Any], depth: int) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """TemporalVertexCodec state_dict → (codec params, VQState arrays).

    Encoder convs live at enc.0,2,4,6,8; decoder at dec.0,2,4,6,8
    (vqvae.py:403-414,441-453)."""
    enc: Dict[str, Any] = {}
    for i, idx in enumerate([0, 2, 4, 6, 8]):
        w, b = conv1d(sd, f"encoder.enc.{idx}")
        enc[f"conv{i}_kernel"] = w
        enc[f"conv{i}_bias"] = b
    dec: Dict[str, Any] = {}
    for i, idx in enumerate([0, 2, 4, 6, 8]):
        w, b = conv1d(sd, f"decoder.dec.{idx}")
        dec[f"conv{i}_kernel"] = w
        dec[f"conv{i}_bias"] = b
    params = {"params": {"encoder": enc, "decoder": dec}}
    vq = {
        "embed": np.stack([_t(sd, f"quantizer.layers.{d}._codebook.embed") for d in range(depth)]),
        "embed_avg": np.stack(
            [_t(sd, f"quantizer.layers.{d}._codebook.embed_avg") for d in range(depth)]
        ),
        "cluster_size": np.stack(
            [_t(sd, f"quantizer.layers.{d}._codebook.cluster_size") for d in range(depth)]
        ),
        "inited": np.asarray(True),
    }
    return params, vq
