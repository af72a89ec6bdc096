"""SAMPLER-LOOP parity vs the LIVE torch reference (VERDICT r2 missing #2/#4).

test_convert_fullmodel proves ONE forward matches; these tests run the
reference's COMPLETE inference loops — `SpacedDiffusion.ddim_sample_loop`
under `ClassifierFreeSampleModel` (reference:
diffusion/gaussian_diffusion.py:815-936, diffusion/respace.py:86-145,
model/cfg_sampler.py:17-33) and the autoregressive
`GuideTransformer.generate` decode (reference: model/guide.py:174-222) —
against this framework's single-compile `lax.scan` equivalents on the SAME
converted tiny model and the SAME x_T / audio.  This pins the eta-0 DDIM
update, the final pred-xstart return (:862), the respacing timestep map, the
CFG-scale composition, and the shifted-nucleus token selection end to end
(everything the per-module tests cannot reach)."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# importing this installs the fairseq/torchaudio stubs shared by all
# full-model parity tests (same frozen wav2vec stand-in on both sides)
import tests.test_convert_fullmodel as fullmodel  # noqa: E402,F401


def to_np(x):
    return x.detach().cpu().numpy()


class _PoseArgs:
    add_frame_cond = 1
    data_format = "pose"
    max_seq_length = 600


@pytest.mark.slow
def test_ddim_cfg_loop_matches_reference(monkeypatch):
    """Full DDIM-10 (from a 100-step cosine base) CFG sampling loop, pose.

    reference call chain exercised: ClassifierFreeSampleModel.forward
    (2 forwards + scale combine) → SpacedDiffusion._WrappedModel timestep
    remap → GaussianDiffusion.ddim_sample(_loop) with eta=0,
    clip_denoised=False (the generate.py:88-97 operating point) → final
    return is pred_xstart (gaussian_diffusion.py:862)."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    import diffusion.gaussian_diffusion as gd
    from diffusion.respace import SpacedDiffusion, space_timesteps
    from model.cfg_sampler import ClassifierFreeSampleModel
    from model.diffusion import FiLMTransformer as RefFiLM

    from audio2photoreal_tpu.core.config import DenoiserConfig
    from audio2photoreal_tpu.diffusion import sampling
    from audio2photoreal_tpu.diffusion.respace import maybe_respaced
    from audio2photoreal_tpu.models.cfg import cfg_model_fn
    from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
    from audio2photoreal_tpu.train.convert import convert_film_denoiser

    torch.manual_seed(3)
    L, H, FF, NL = 64, 4, 96, 2
    ref = RefFiLM(
        _PoseArgs(), nfeats=104, latent_dim=L, ff_size=FF, num_layers=NL,
        num_heads=H, dropout=0.0, split_type="test", device="cpu",
    ).eval()

    B, T = 2, 12
    K = 1
    rng = np.random.RandomState(7)
    audio = rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1
    kf = rng.randn(B, K, 104).astype(np.float32)
    xT = rng.randn(B, 104, 1, T).astype(np.float32)
    scale = 2.0

    # ---- torch reference loop --------------------------------------
    base_steps, respacing = 100, "ddim10"
    betas = gd.get_named_beta_schedule("cosine", base_steps, 1.0)
    diff_t = SpacedDiffusion(
        use_timesteps=space_timesteps(base_steps, respacing),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=0.0,
        data_format="pose",
        model_path=None,
    )
    cfg_t = ClassifierFreeSampleModel(ref)
    y = {
        "audio": torch.as_tensor(audio),
        "keyframes": torch.as_tensor(kf),
        "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
        "scale": torch.full((B,), scale),
    }
    with torch.no_grad():
        out_t = diff_t.ddim_sample_loop(
            cfg_t,
            (B, 104, 1, T),
            clip_denoised=False,
            model_kwargs={"y": y},
            noise=torch.as_tensor(xT),
            eta=0.0,
        )
    out_t = to_np(out_t)[:, :, 0, :].transpose(0, 2, 1)  # [B, T, C]

    # ---- JAX scan loop ----------------------------------------------
    params = convert_film_denoiser(ref.state_dict(), "pose", NL)
    cfg = DenoiserConfig(
        data_format="pose", nfeats=104, latent_dim=L, ff_size=FF,
        num_layers=NL, num_heads=H, max_seq_length=600, dropout=0.0,
    )
    model = FiLMDenoiser(cfg)
    sched = maybe_respaced("cosine", base_steps, respacing)
    np.testing.assert_array_equal(
        np.asarray(sched.timestep_map), np.asarray(diff_t.timestep_map)
    )

    cond = model.apply(
        params,
        jnp.asarray(audio),
        jnp.asarray(kf),
        jnp.ones((B, K)),
        method=FiLMDenoiser.encode_conditioning,
    )

    def apply_denoise(p, x, t, c, keep):
        return model.apply(p, x, t, c, keep, method=FiLMDenoiser.denoise)

    model_fn = cfg_model_fn(apply_denoise, params, cond, scale)
    xT_j = jnp.asarray(xT[:, :, 0, :].transpose(0, 2, 1))  # [B, T, C]
    res = jax.jit(
        lambda x, k: sampling.ddim_sample_loop(sched, "xstart", model_fn, x, k)
    )(xT_j, jax.random.PRNGKey(0))
    # eta=0 → the rng key never reaches the trajectory; pred_xstart is the
    # loop's return value on both sides
    np.testing.assert_allclose(
        np.asarray(res.pred_xstart), out_t, atol=1e-3, rtol=1e-3
    )


@pytest.mark.slow
def test_plms_cfg_loop_matches_reference(monkeypatch):
    """Full PLMS (order-2 default) CFG sampling loop, pose — the last
    untested sampler family (VERDICT r3 next #7).

    reference call chain: plms_sample_loop_progressive →
    plms_sample with the Pseudo-Improved-Euler first step (a second model
    eval at (mean_pred, t-1), gaussian_diffusion.py:992-1005), the
    Adams-Bashforth-2 steady state (:1008-1034), and the t==0 pred_xstart
    collapse (:1038-1039); loop returns final['sample'] (:1070-1074)."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    import diffusion.gaussian_diffusion as gd
    from diffusion.respace import SpacedDiffusion, space_timesteps
    from model.cfg_sampler import ClassifierFreeSampleModel
    from model.diffusion import FiLMTransformer as RefFiLM

    from audio2photoreal_tpu.core.config import DenoiserConfig
    from audio2photoreal_tpu.diffusion import sampling
    from audio2photoreal_tpu.diffusion.respace import maybe_respaced
    from audio2photoreal_tpu.models.cfg import cfg_model_fn
    from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
    from audio2photoreal_tpu.train.convert import convert_film_denoiser

    torch.manual_seed(3)
    L, H, FF, NL = 64, 4, 96, 2
    ref = RefFiLM(
        _PoseArgs(), nfeats=104, latent_dim=L, ff_size=FF, num_layers=NL,
        num_heads=H, dropout=0.0, split_type="test", device="cpu",
    ).eval()

    B, T = 2, 12
    K = 1
    rng = np.random.RandomState(17)
    audio = rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1
    kf = rng.randn(B, K, 104).astype(np.float32)
    xT = rng.randn(B, 104, 1, T).astype(np.float32)
    scale = 2.0

    base_steps, respacing = 100, "10"  # plms respacing is plain stride
    betas = gd.get_named_beta_schedule("cosine", base_steps, 1.0)
    diff_t = SpacedDiffusion(
        use_timesteps=space_timesteps(base_steps, respacing),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=0.0,
        data_format="pose",
        model_path=None,
    )
    cfg_t = ClassifierFreeSampleModel(ref)
    y = {
        "audio": torch.as_tensor(audio),
        "keyframes": torch.as_tensor(kf),
        "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
        "scale": torch.full((B,), scale),
    }
    with torch.no_grad():
        out_t = diff_t.plms_sample_loop(
            cfg_t,
            (B, 104, 1, T),
            clip_denoised=False,
            model_kwargs={"y": y},
            noise=torch.as_tensor(xT),
            order=2,
        )
    out_t = to_np(out_t)[:, :, 0, :].transpose(0, 2, 1)  # [B, T, C]

    params = convert_film_denoiser(ref.state_dict(), "pose", NL)
    cfg = DenoiserConfig(
        data_format="pose", nfeats=104, latent_dim=L, ff_size=FF,
        num_layers=NL, num_heads=H, max_seq_length=600, dropout=0.0,
    )
    model = FiLMDenoiser(cfg)
    sched = maybe_respaced("cosine", base_steps, respacing)
    np.testing.assert_array_equal(
        np.asarray(sched.timestep_map), np.asarray(diff_t.timestep_map)
    )

    cond = model.apply(
        params,
        jnp.asarray(audio),
        jnp.asarray(kf),
        jnp.ones((B, K)),
        method=FiLMDenoiser.encode_conditioning,
    )

    def apply_denoise(p, x, t, c, keep):
        return model.apply(p, x, t, c, keep, method=FiLMDenoiser.denoise)

    model_fn = cfg_model_fn(apply_denoise, params, cond, scale)
    xT_j = jnp.asarray(xT[:, :, 0, :].transpose(0, 2, 1))  # [B, T, C]
    res = jax.jit(
        lambda x: sampling.plms_sample_loop(sched, "xstart", model_fn, x, order=2)
    )(xT_j)
    # PLMS is fully deterministic; the loop's return value is final['sample']
    np.testing.assert_allclose(np.asarray(res.sample), out_t, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_guide_argmax_decode_matches_reference():
    """Autoregressive decode parity (VERDICT r2 missing #4): with top_p→0 the
    reference's shifted-nucleus construction (guide.py:203-218) degenerates to
    deterministic argmax, so the full decode loop — audio prenet, start-token
    shift, per-step last-position logits, token feedback — can be compared
    exactly, token for token."""
    from model.guide import GuideTransformer as RefGuide

    from audio2photoreal_tpu.core.config import GuideConfig
    from audio2photoreal_tpu.models.guide import GuideTransformer
    from audio2photoreal_tpu.train.convert import convert_guide

    torch.manual_seed(11)
    TOK, NL, D = 32, 2, 64
    ref = RefGuide(
        tokens=TOK, num_heads=4, num_layers=NL, dim=D, ff_size=96,
        dropout=0.0, emb_len=798, num_audio_layers=2,
    ).eval()

    B, T = 1, 18
    rng = np.random.RandomState(5)
    audio = rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1
    seq_len, layers = 4, 2  # 8 tokens

    with torch.no_grad():
        tok_t = ref.generate(
            torch.as_tensor(audio), seq_len, layers,
            n_sequences=B, top_p=1e-6,
        )
    tok_t = to_np(tok_t)

    params = convert_guide(ref.state_dict(), num_layers=NL, num_audio_layers=2)
    gcfg = GuideConfig(
        tokens=TOK, latent_dim=D, ff_size=96, num_layers=NL, num_heads=4,
        dropout=0.0, dtype="float32",
    )
    model = GuideTransformer(gcfg)
    for use_cache in (False, True):
        tok_j = model.apply(
            params,
            jnp.asarray(audio),
            seq_len * layers,
            jax.random.PRNGKey(0),
            top_p=1e-6,
            use_cache=use_cache,
            method=GuideTransformer.generate,
        )
        np.testing.assert_array_equal(
            np.asarray(tok_j), tok_t,
            err_msg=f"use_cache={use_cache}",
        )
