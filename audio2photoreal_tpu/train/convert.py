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
