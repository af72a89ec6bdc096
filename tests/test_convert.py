"""torch→JAX converter numerics tests.

Builds small torch modules with the reference's layer semantics
(torch.nn.MultiheadAttention / LayerNorm / Conv1d, pre-norm FiLM wiring per
model/modules/transformer_modules.py:127-268), converts their state_dicts,
and checks the flax modules reproduce the torch outputs to float32 tolerance.
This pins the conversion path that real released checkpoints will take.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from audio2photoreal_tpu.models.blocks import (
    FiLMDecoderLayer,
    MultiHeadAttention,
    mish,
)
from audio2photoreal_tpu.models.vqvae import TemporalVertexCodec, VQState, rvq_encode, rvq_decode
from audio2photoreal_tpu.core.config import VQConfig
from audio2photoreal_tpu.ops.rotary import apply_rotary, make_rotary_table
from audio2photoreal_tpu.train import convert

torch.manual_seed(0)


def to_np(x):
    return x.detach().cpu().numpy()


def test_mha_matches_torch():
    D, H, B, T = 16, 4, 2, 6
    m = tnn.MultiheadAttention(D, H, batch_first=True)
    x = torch.randn(B, T, D)
    mem = torch.randn(B, 9, D)
    out_t, _ = m(x, mem, mem, need_weights=False)

    sd = {f"attn.{k}": v for k, v in m.state_dict().items()}
    params = {"params": convert.mha(sd, "attn")}
    flax_mha = MultiHeadAttention(D, H)
    out_j = flax_mha.apply(params, jnp.asarray(to_np(x)), jnp.asarray(to_np(mem)), jnp.asarray(to_np(mem)))
    np.testing.assert_allclose(np.asarray(out_j), to_np(out_t), atol=1e-5)


class TorchFiLMLayer(tnn.Module):
    """Minimal mirror of the reference FiLMTransformerDecoderLayer semantics
    (pre-norm; FiLM((Mish→Linear)(t)) gating each sublayer output; rotary on
    Q=K before the projections)."""

    def __init__(self, d, h, ff, use_cm=False):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.multihead_attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)
        self.norm3 = tnn.LayerNorm(d)
        self.film1 = self._film(d)
        self.film2 = self._film(d)
        self.film3 = self._film(d)
        self.use_cm = use_cm
        if use_cm:
            self.multihead_attn2 = tnn.MultiheadAttention(d, h, batch_first=True)
            self.norm2a = tnn.LayerNorm(d)
            self.film2a = self._film(d)

    @staticmethod
    def _film(d):
        return tnn.Sequential()  # placeholder, replaced below

    def forward(self, x, mem, t, rot, mem2=None):
        def film_apply(filmmod, h):
            s_s = filmmod(t).unsqueeze(1)
            scale, shift = s_s.chunk(2, dim=-1)
            return (scale + 1) * h + shift

        h = self.norm1(x)
        qk = rot(h)
        a, _ = self.self_attn(qk, qk, h, need_weights=False)
        x = x + film_apply(self.film1_mod, a)
        h = self.norm2(x)
        a, _ = self.multihead_attn(rot(h), rot(mem), mem, need_weights=False)
        x = x + film_apply(self.film2_mod, a)
        if self.use_cm:
            h = self.norm2a(x)
            a, _ = self.multihead_attn2(rot(h), rot(mem2), mem2, need_weights=False)
            x = x + film_apply(self.film2a_mod, a)
        h = self.norm3(x)
        a = self.linear2(torch.nn.functional.gelu(self.linear1(h)))
        x = x + film_apply(self.film3_mod, a)
        return x


def _attach_films(layer, d):
    for name in ["film1", "film2", "film3"] + (["film2a"] if layer.use_cm else []):
        mod = tnn.Sequential(tnn.Mish(), tnn.Linear(d, 2 * d))
        setattr(layer, name + "_mod", mod)
    return layer


def _film_sd(layer, use_cm):
    """Rename mirror params into reference naming for the converter."""
    sd = {}
    for tname in ["self_attn", "norm1", "norm2", "norm3", "linear1", "linear2"]:
        for k, v in getattr(layer, tname).state_dict().items():
            sd[f"L.{tname}.{k}"] = v
    for k, v in layer.multihead_attn.state_dict().items():
        sd[f"L.multihead_attn.{k}"] = v
    for fname in ["film1", "film2", "film3"] + (["film2a"] if use_cm else []):
        for k, v in getattr(layer, fname + "_mod").state_dict().items():
            sd[f"L.{fname}.block.{k}"] = v
    if use_cm:
        for k, v in layer.multihead_attn2.state_dict().items():
            sd[f"L.multihead_attn2.{k}"] = v
        for k, v in layer.norm2a.state_dict().items():
            sd[f"L.norm2a.{k}"] = v
    return sd


@pytest.mark.parametrize("use_cm", [False, True])
def test_film_decoder_layer_matches_torch(use_cm):
    D, H, FF, B, T, M = 16, 4, 32, 2, 5, 7
    layer = _attach_films(TorchFiLMLayer(D, H, FF, use_cm), D)
    x = torch.randn(B, T, D)
    mem = torch.randn(B, M, D)
    mem2 = torch.randn(B, 3, D) if use_cm else None
    t = torch.randn(B, D)

    table = make_rotary_table(D, 64)

    def rot_torch(h):
        return torch.as_tensor(
            np.asarray(apply_rotary(jnp.asarray(to_np(h)), table)), dtype=h.dtype
        )

    with torch.no_grad():
        out_t = layer(x, mem, t, rot_torch, mem2)

    sd = _film_sd(layer, use_cm)
    params = {"params": convert.film_decoder_layer(sd, "L", use_cm)}
    fl = FiLMDecoderLayer(D, H, FF, dropout=0.0, use_cm=use_cm)
    out_j = fl.apply(
        params,
        jnp.asarray(to_np(x)),
        jnp.asarray(to_np(mem)),
        jnp.asarray(to_np(t)),
        memory2=jnp.asarray(to_np(mem2)) if use_cm else None,
        rotary=table,
    )
    np.testing.assert_allclose(np.asarray(out_j), to_np(out_t), atol=2e-5)


def test_vq_codec_conv_stack_matches_torch():
    """Causal conv encoder/decoder parity: torch single-left-pad valid convs
    (vqvae.py:403-414) vs the JAX _CausalConvStack."""
    L, NF = 8, 10
    enc_t = tnn.Sequential(
        tnn.Conv1d(NF, L, 1), tnn.LeakyReLU(0.2),
        tnn.Conv1d(L, L, 2, dilation=1), tnn.LeakyReLU(0.2),
        tnn.Conv1d(L, L, 2, dilation=2), tnn.LeakyReLU(0.2),
        tnn.Conv1d(L, L, 2, dilation=3), tnn.LeakyReLU(0.2),
        tnn.Conv1d(L, L, 2, dilation=1),
    )
    x = torch.randn(2, NF, 12)
    with torch.no_grad():
        xp = torch.nn.functional.pad(x, (7, 0))
        out_t = enc_t(xp)

    sd = {}
    for i, idx in enumerate([0, 2, 4, 6, 8]):
        for k, v in enc_t[idx].state_dict().items():
            sd[f"encoder.enc.{idx}.{k}"] = v
        for k, v in enc_t[idx].state_dict().items():
            sd[f"decoder.dec.{idx}.{k}"] = v  # reuse shapes mismatch is fine for enc test
    cfg = VQConfig(nfeats=NF, emb_width=L, code_dim=8, depth=2)
    # decoder shapes differ; convert only the encoder side manually
    enc_params = {}
    for i, idx in enumerate([0, 2, 4, 6, 8]):
        w, b = convert.conv1d(sd, f"encoder.enc.{idx}")
        enc_params[f"conv{i}_kernel"] = w
        enc_params[f"conv{i}_bias"] = b

    from audio2photoreal_tpu.models.vqvae import _CausalConvStack

    stack = _CausalConvStack(
        specs=((NF, L, 1, 1), (L, L, 2, 1), (L, L, 2, 2), (L, L, 2, 3), (L, L, 2, 1)),
        receptive_field=8,
    )
    out_j = stack.apply({"params": enc_params}, jnp.asarray(to_np(x).transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 2, 1), to_np(out_t), atol=1e-5
    )


def test_rvq_encode_decode_matches_numpy():
    """Residual quantization against a hand-rolled numpy reference."""
    rng = np.random.RandomState(0)
    cfg = VQConfig(nfeats=4, emb_width=6, code_dim=5, depth=3)
    embed = rng.randn(3, 5, 6).astype(np.float32)
    state = VQState(
        embed=jnp.asarray(embed),
        embed_avg=jnp.asarray(embed),
        cluster_size=jnp.ones((3, 5)),
        inited=jnp.asarray(True),
    )
    x = rng.randn(7, 6).astype(np.float32)
    codes = np.asarray(rvq_encode(jnp.asarray(x), state, cfg))
    # numpy reference
    residual = x.copy()
    for d in range(3):
        d2 = ((residual[:, None] - embed[d][None]) ** 2).sum(-1)
        ref_codes = d2.argmin(1)
        np.testing.assert_array_equal(codes[:, d], ref_codes)
        residual = residual - embed[d][ref_codes]
    # decode sums the code vectors
    dec = np.asarray(rvq_decode(jnp.asarray(codes), state, cfg))
    ref = sum(embed[d][codes[:, d]] for d in range(3))
    np.testing.assert_allclose(dec, ref, atol=1e-6)


def test_convert_wav2vec_extractor_keys():
    """Converter accepts the fairseq key layout and produces aligned shapes."""
    sd = {}
    cin = 1
    spec = [(512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2)]
    for i, (c, k, s) in enumerate(spec):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = torch.randn(c, cin, k)
        sd[f"feature_extractor.conv_layers.{i}.2.weight"] = torch.randn(c)
        sd[f"feature_extractor.conv_layers.{i}.2.bias"] = torch.randn(c)
        cin = c
    p = convert.convert_wav2vec_extractor(sd)
    assert p["conv0_kernel"].shape == (10, 1, 512)
    assert p["conv4_kernel"].shape == (4, 512, 512)
    assert p["norm0"]["scale"].shape == (512,)
