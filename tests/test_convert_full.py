"""FULL-MODEL torch→JAX conversion parity tests.

test_convert.py pins individual layer conversions; these tests assemble
complete torch models with the reference's exact module graphs + state-dict
key layout (model/diffusion.py:37-79 Audio2LipRegressionTransformer, fairseq
wav2vec.py ConvFeatureExtractionModel/ConvAggegator, transformer_modules.py
RegressionTransformer), randomly initialize them, convert the state_dict, and
assert full-forward parity — the path a real released checkpoint takes.
"""

import math

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from audio2photoreal_tpu.models.audio_encoder import (
    VQ_WAV2VEC_SPEC,
    ConvAggregator,
    ConvFeatureExtractor,
)
from audio2photoreal_tpu.models.lip_regressor import LipRegressor
from audio2photoreal_tpu.train import convert

torch.manual_seed(0)

AGG_LAYERS = tuple((512, k, 1) for k in range(2, 14))  # wav2vec_large aggregator


def to_np(x):
    return x.detach().cpu().numpy()


# --------------------------------------------------------------------- #
# torch mirrors with fairseq's module/state-dict layout
# --------------------------------------------------------------------- #


class TorchW2VExtractor(tnn.Module):
    """fairseq ConvFeatureExtractionModel: per layer Sequential(Conv1d no-bias,
    Dropout, Fp32GroupNorm(1, dim), ReLU); log compression at the end."""

    def __init__(self, spec=VQ_WAV2VEC_SPEC):
        super().__init__()
        self.conv_layers = tnn.ModuleList()
        d = 1
        for dim, k, s in spec:
            self.conv_layers.append(
                tnn.Sequential(
                    tnn.Conv1d(d, dim, k, stride=s, bias=False),
                    tnn.Dropout(0.0),
                    tnn.GroupNorm(1, dim),
                    tnn.ReLU(),
                )
            )
            d = dim
    def forward(self, x):  # [B, S]
        x = x.unsqueeze(1)
        for c in self.conv_layers:
            x = c(x)
        return (x.abs() + 1).log()


class TorchW2VAggregator(tnn.Module):
    """fairseq ConvAggegator (zero_pad=False → ReplicationPad1d, conv_bias=
    False, GroupNorm(1,dim), residual multiplier sqrt(residual_scale=0.5))."""

    def __init__(self, layers=AGG_LAYERS, embed=512):
        super().__init__()
        self.conv_layers = tnn.ModuleList()
        d = embed
        for dim, k, s in layers:
            self.conv_layers.append(
                tnn.Sequential(
                    tnn.ReplicationPad1d((k - 1, 0)),
                    tnn.Conv1d(d, dim, k, stride=s, bias=False),
                    tnn.Dropout(0.0),
                    tnn.GroupNorm(1, dim),
                    tnn.ReLU(),
                )
            )
            d = dim
        self.rscale = math.sqrt(0.5)

    def forward(self, x):  # [B, C, T]
        for c in self.conv_layers:
            r = x
            x = c(x)
            x = (x + r) * self.rscale
        return x


class TorchWav2VecModel(tnn.Module):
    def __init__(self):
        super().__init__()
        self.feature_extractor = TorchW2VExtractor()
        self.feature_aggregator = TorchW2VAggregator()


class TorchWav2VecEncoder(tnn.Module):
    """reference Wav2VecEncoder (audio_encoder.py:24-46) with the resampler
    factored out (applied by the caller so both sides see identical 16 kHz
    input)."""

    def __init__(self):
        super().__init__()
        self.wav2vec_model = TorchWav2VecModel()

    def forward(self, wav16):  # [B, S16]
        x = torch.cat([torch.zeros(wav16.shape[0], 320), wav16], dim=-1)
        x = self.wav2vec_model.feature_extractor(x)
        x = self.wav2vec_model.feature_aggregator(x)
        return x.permute(0, 2, 1).contiguous()


class TorchPE(tnn.Module):
    """transformer_modules.py's PositionalEncoding (:281-302) — standard
    batch-first per-position sin/cos (the one RegressionTransformer uses)."""

    def __init__(self, d, max_len=1024):
        super().__init__()
        pe = torch.zeros(max_len, d)
        position = torch.arange(0, max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2) * (-np.log(10000.0) / d))
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return x + self.pe[None, : x.shape[1], :]


def _ff(d, dff):
    return tnn.Sequential(
        tnn.Linear(d, dff), tnn.ReLU(), tnn.Dropout(0.0), tnn.Linear(dff, d), tnn.Dropout(0.0)
    )


class TorchSelfAttn(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, h, batch_first=True)

    def forward(self, x):
        return self.self_attn(x, x, x, need_weights=False)[0]


class TorchCrossAttn(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.cross_attn = tnn.MultiheadAttention(d, h, batch_first=True)

    def forward(self, x, c):
        return self.cross_attn(x, c, c, need_weights=False)[0]


class TorchEncLayer(tnn.Module):
    def __init__(self, d, h, dff):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d)
        self.self_attn = TorchSelfAttn(d, h)
        self.norm2 = tnn.LayerNorm(d)
        self.feedforward = tnn.Module()
        self.feedforward.ff = _ff(d, dff)

    def forward(self, x):
        x = x + self.self_attn(self.norm1(x))
        return x + self.feedforward.ff(self.norm2(x))


class TorchDecLayer(tnn.Module):
    def __init__(self, d, h, dff):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d)
        self.self_attn = TorchSelfAttn(d, h)
        self.norm2 = tnn.LayerNorm(d)
        self.cross_attn = TorchCrossAttn(d, h)
        self.norm3 = tnn.LayerNorm(d)
        self.feedforward = tnn.Module()
        self.feedforward.ff = _ff(d, dff)

    def forward(self, x, c):
        x = x + self.self_attn(self.norm1(x))
        x = x + self.cross_attn(self.norm2(x), c)
        return x + self.feedforward.ff(self.norm3(x))


class TorchRegressionTransformer(tnn.Module):
    def __init__(self, enc=2, dec=4, d=512, h=4, dff=1024):
        super().__init__()
        self.cond_positional_encoding = TorchPE(d)
        self.target_positional_encoding = TorchPE(d)
        self.transformer_encoder = tnn.ModuleList(
            [TorchEncLayer(d, h, dff) for _ in range(enc)]
        )
        self.transformer_decoder = tnn.ModuleList(
            [TorchDecLayer(d, h, dff) for _ in range(dec)]
        )

    def forward(self, x, cond):
        x = self.target_positional_encoding(x)
        cond = self.cond_positional_encoding(cond)
        for e in self.transformer_encoder:
            cond = e(cond)
        for dcl in self.transformer_decoder:
            x = dcl(x, cond)
        return x


class TorchLipRegressor(tnn.Module):
    """Audio2LipRegressionTransformer (model/diffusion.py:37-79), resampler
    factored out."""

    def __init__(self, n_vertices=338):
        super().__init__()
        self.n_vertices = n_vertices
        self.audio_encoder = TorchWav2VecEncoder()
        self.regression_model = TorchRegressionTransformer()
        self.project_output = tnn.Linear(512, n_vertices * 3)

    def forward(self, wav16, T):
        B = wav16.shape[0]
        cond = self.audio_encoder(wav16)
        x = torch.zeros(B, T, 512)
        x = self.regression_model(x, cond)
        x = self.project_output(x)
        return x.view(B, T, self.n_vertices, 3)


# --------------------------------------------------------------------- #
# tests
# --------------------------------------------------------------------- #


def test_wav2vec_aggregator_matches_torch():
    layers = ((8, 2, 1), (8, 3, 1), (8, 4, 1))
    agg_t = TorchW2VAggregator(layers, embed=8).eval()
    x = torch.randn(2, 8, 11)
    with torch.no_grad():
        out_t = agg_t(x)
    sd = {f"feature_aggregator.{k}": v for k, v in agg_t.state_dict().items()}
    params = {"params": convert.convert_wav2vec_aggregator(sd)}
    agg_j = ConvAggregator(layers=layers)
    out_j = agg_j.apply(params, jnp.asarray(to_np(x).transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 2, 1), to_np(out_t), atol=2e-5
    )


def test_lip_regressor_full_model_matches_torch():
    """Full Audio2LipRegressionTransformer forward parity at the real model
    size (512-d, 5-layer extractor, 12-layer aggregator, 2+4 transformer),
    including the reference's per-batch-row positional-encoding quirk."""
    model_t = TorchLipRegressor().eval()
    B, T = 2, 4  # 4 frames → 2133 16 kHz samples
    wav16 = torch.randn(B, T * 1600 // 3) * 0.1
    with torch.no_grad():
        out_t = model_t(wav16, T)

    params = convert.convert_lip_regressor(model_t.state_dict())
    model_j = LipRegressor()

    # drive the JAX model below its public surface so both sides consume the
    # identical 16 kHz wav (the public __call__ resamples 48 kHz internally
    # with a polyphase filter that differs from torchaudio by design)
    from audio2photoreal_tpu.ops.embeddings import absolute_pos_encoding

    import flax.linen as fnn_top

    class _Lip16k(LipRegressor):
        @fnn_top.compact
        def __call__(self, wav16, T):
            from audio2photoreal_tpu.models.audio_encoder import (
                ConvAggregator as _Agg,
                ConvFeatureExtractor as _Ext,
            )
            import flax.linen as fnn

            class _Enc(fnn.Module):
                @fnn.compact
                def __call__(self, w):
                    w = jnp.pad(w, ((0, 0), (320, 0)))
                    z = _Ext(name="feature_extractor")(w)
                    return _Agg(name="feature_aggregator")(z)

            cond = _Enc(name="audio_encoder")(wav16)
            mem = cond + absolute_pos_encoding(cond.shape[1], self.dim)[None]
            from audio2photoreal_tpu.models.lip_regressor import _DecLayer, _EncLayer

            for i in range(self.enc_layers):
                mem = _EncLayer(self.dim, self.heads, self.ff_size, name=f"enc_{i}")(mem)
            x = jnp.broadcast_to(
                absolute_pos_encoding(T, self.dim)[None], (wav16.shape[0], T, self.dim)
            )
            for i in range(self.dec_layers):
                x = _DecLayer(self.dim, self.heads, self.ff_size, name=f"dec_{i}")(x, mem)
            import flax.linen as nn2

            out = nn2.Dense(self.n_vertices * 3, name="project_output")(x)
            return out.reshape(wav16.shape[0], T, self.n_vertices, 3)

    out_j = _Lip16k().apply(params, jnp.asarray(to_np(wav16)), T)
    np.testing.assert_allclose(np.asarray(out_j), to_np(out_t), atol=5e-4, rtol=1e-3)
