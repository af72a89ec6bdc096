"""Ancestral-path math + top-p selection-law parity vs the LIVE torch
reference (VERDICT r4 missing #1/#2).

The reference's full ancestral `p_sample_loop` is unrunnable (NameError at
gaussian_diffusion.py:476), but every piece of math under it IS runnable:
`q_posterior_mean_variance` (:235), `p_mean_variance` FIXED_SMALL (:259-313)
and `training_losses` (:1195-1255).  These tests pin each against this
framework's functional equivalents on the SAME converted tiny pose model,
SAME x0/xt/t/noise.  The third test pins the nucleus (top-p) selection LAW —
the shifted-cumsum mask construction of model/guide.py:203-218 — on fixed
logits across several top_p values by capturing the reference's own
renormalized distribution as it flows into `Categorical`, instead of only
exercising the argmax degenerate point (test_sampler_parity:248)."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# installs the fairseq/torchaudio stubs shared by all full-model parity tests
import tests.test_convert_fullmodel as fullmodel  # noqa: E402,F401


def to_np(x):
    return x.detach().cpu().numpy()


class _PoseArgs:
    add_frame_cond = 1
    data_format = "pose"
    max_seq_length = 600


def _make_ref_pair(seed=3):
    """Tiny reference pose FiLMTransformer + converted JAX twin (the
    test_sampler_parity fixture, shared by both ancestral tests)."""
    from model.diffusion import FiLMTransformer as RefFiLM

    from audio2photoreal_tpu.core.config import DenoiserConfig
    from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
    from audio2photoreal_tpu.train.convert import convert_film_denoiser

    torch.manual_seed(seed)
    L, H, FF, NL = 64, 4, 96, 2
    ref = RefFiLM(
        _PoseArgs(), nfeats=104, latent_dim=L, ff_size=FF, num_layers=NL,
        num_heads=H, dropout=0.0, split_type="test", device="cpu",
    ).eval()
    params = convert_film_denoiser(ref.state_dict(), "pose", NL)
    cfg = DenoiserConfig(
        data_format="pose", nfeats=104, latent_dim=L, ff_size=FF,
        num_layers=NL, num_heads=H, max_seq_length=600, dropout=0.0,
    )
    return ref, FiLMDenoiser(cfg), params


def _make_ref_diffusion(lambda_vel=0.0):
    """Reference GaussianDiffusion at the FIXED_SMALL/START_X operating point
    (utils/model_util.py:108-114), full 100-step cosine base (identity
    timestep map, asserted by callers)."""
    import diffusion.gaussian_diffusion as gd
    from diffusion.respace import SpacedDiffusion, space_timesteps

    base_steps = 100
    betas = gd.get_named_beta_schedule("cosine", base_steps, 1.0)
    return SpacedDiffusion(
        use_timesteps=space_timesteps(base_steps, "100"),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=lambda_vel,
        data_format="pose",
        model_path=None,
    )


@pytest.mark.slow
def test_ancestral_moments_match_reference(monkeypatch):
    """q_posterior_mean_variance + FIXED_SMALL p_mean_variance parity
    (reference: diffusion/gaussian_diffusion.py:235-313) — the mean/variance/
    log-variance/pred_xstart quadruple every ancestral step consumes, computed
    through the CFG-wrapped converted tiny model on the same xt/t batch
    (t includes 0 and T-1 to cover the clipped-logvar endpoints)."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from model.cfg_sampler import ClassifierFreeSampleModel

    from audio2photoreal_tpu.diffusion import gaussian
    from audio2photoreal_tpu.diffusion.respace import maybe_respaced
    from audio2photoreal_tpu.models.cfg import cfg_model_fn
    from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser

    ref, model, params = _make_ref_pair()
    diff_t = _make_ref_diffusion()
    sched = maybe_respaced("cosine", 100, "100")
    np.testing.assert_array_equal(
        np.asarray(sched.timestep_map), np.asarray(diff_t.timestep_map)
    )

    B, T, K = 4, 12, 1
    rng = np.random.RandomState(11)
    x0 = rng.randn(B, 104, 1, T).astype(np.float32)
    xt = rng.randn(B, 104, 1, T).astype(np.float32)
    t_np = np.array([0, 1, 57, 99], np.int64)
    t_t = torch.as_tensor(t_np)
    t_j = jnp.asarray(t_np.astype(np.int32))

    def tpose(a):  # [B,C,1,T] -> [B,T,C]
        return a[:, :, 0, :].transpose(0, 2, 1)

    # ---- pure posterior math ----------------------------------------
    mean_t, var_t, logvar_t = diff_t.q_posterior_mean_variance(
        torch.as_tensor(x0), torch.as_tensor(xt), t_t
    )
    mean_j, var_j, logvar_j = gaussian.q_posterior_mean_variance(
        sched, jnp.asarray(tpose(x0)), jnp.asarray(tpose(xt)), t_j
    )
    np.testing.assert_allclose(np.asarray(mean_j), tpose(to_np(mean_t)),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(var_j), mean_j.shape),
        tpose(to_np(var_t)), atol=1e-7, rtol=1e-6)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(logvar_j), mean_j.shape),
        tpose(to_np(logvar_t)), atol=1e-6, rtol=1e-6)

    # ---- p_mean_variance through the converted model ----------------
    audio = rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1
    kf = rng.randn(B, K, 104).astype(np.float32)
    scale = 2.0
    cfg_t = ClassifierFreeSampleModel(ref)
    y = {
        "audio": torch.as_tensor(audio),
        "keyframes": torch.as_tensor(kf),
        "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
        "scale": torch.full((B,), scale),
    }
    with torch.no_grad():
        out_t = diff_t.p_mean_variance(
            cfg_t, torch.as_tensor(xt), t_t,
            clip_denoised=False, model_kwargs={"y": y},
        )

    cond = model.apply(
        params, jnp.asarray(audio), jnp.asarray(kf), jnp.ones((B, K)),
        method=FiLMDenoiser.encode_conditioning,
    )

    def apply_denoise(p, x, t, c, keep):
        return model.apply(p, x, t, c, keep, method=FiLMDenoiser.denoise)

    model_fn = cfg_model_fn(apply_denoise, params, cond, scale)
    xt_j = jnp.asarray(tpose(xt))
    model_out = model_fn(xt_j, t_j)
    pmv = gaussian.p_mean_variance(
        sched, "xstart", "fixed_small", model_out, xt_j, t_j, clip=None
    )
    np.testing.assert_allclose(np.asarray(pmv.pred_xstart),
                               tpose(to_np(out_t["pred_xstart"])),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pmv.mean),
                               tpose(to_np(out_t["mean"])),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(pmv.variance), pmv.mean.shape),
        tpose(to_np(out_t["variance"])), atol=1e-7, rtol=1e-6)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(pmv.log_variance), pmv.mean.shape),
        tpose(to_np(out_t["log_variance"])), atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_training_losses_match_reference(monkeypatch):
    """One masked `training_losses` call vs live torch
    (reference: diffusion/gaussian_diffusion.py:1195-1255): same x0/t/noise,
    non-trivial missing mask, lambda_vel=2.0 — pins q_sample, the START_X
    target, masked_l2's mask×missing numerator AND denominator, the
    velocity term's VALIDITY-only mask, the composed loss, and the no-grad
    vb diagnostic (KL branch + the t==0 decoder-NLL branch).

    Conditioning dropout is forced to keep-all on both sides: the reference
    hardcodes cond_drop_prob=0.2 with i.i.d. torch draws (model/diffusion.py:
    366-371), which no cross-framework RNG can reproduce — prob_mask_like is
    patched to all-True and the JAX model runs with cond_drop_prob=0."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    import model.diffusion as ref_diffusion_mod

    from audio2photoreal_tpu.diffusion import gaussian, losses
    from audio2photoreal_tpu.diffusion.respace import maybe_respaced
    from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser

    monkeypatch.setattr(
        ref_diffusion_mod, "prob_mask_like",
        lambda shape, prob, device: torch.ones(shape, dtype=torch.bool,
                                               device=device),
    )

    ref, model, params = _make_ref_pair(seed=5)
    lambda_vel = 2.0
    diff_t = _make_ref_diffusion(lambda_vel=lambda_vel)
    sched = maybe_respaced("cosine", 100, "100")

    B, T, K = 4, 12, 1
    rng = np.random.RandomState(23)
    x0 = rng.randn(B, 104, 1, T).astype(np.float32)
    noise = rng.randn(B, 104, 1, T).astype(np.float32)
    audio = rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1
    kf = rng.randn(B, K, 104).astype(np.float32)
    t_np = np.array([0, 3, 57, 99], np.int64)
    # validity all-true (keyframe zeroing stays off on both sides);
    # missing non-trivial — it must gate rot_mse but NOT vel_mse
    missing = (rng.rand(B, T, 1) > 0.3).astype(np.float32)

    y = {
        "audio": torch.as_tensor(audio),
        "keyframes": torch.as_tensor(kf),
        "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
        "missing": torch.as_tensor(missing),
    }
    with torch.no_grad():
        terms_t = diff_t.training_losses(
            ref, torch.as_tensor(x0), torch.as_tensor(t_np),
            model_kwargs={"y": y}, noise=torch.as_tensor(noise),
        )

    def tpose(a):  # [B,C,1,T] -> [B,T,C]
        return a[:, :, 0, :].transpose(0, 2, 1)

    t_j = jnp.asarray(t_np.astype(np.int32))
    x0_j = jnp.asarray(tpose(x0))
    xt_j = gaussian.q_sample(sched, x0_j, t_j, jnp.asarray(tpose(noise)))
    cond = model.apply(
        params, jnp.asarray(audio), jnp.asarray(kf), jnp.ones((B, K)),
        method=FiLMDenoiser.encode_conditioning,
    )
    model_out = model.apply(
        params, xt_j, t_j, cond, jnp.ones((B,)),
        method=FiLMDenoiser.denoise,
    )
    valid = jnp.ones((B, T, 1), jnp.float32)
    terms_j = losses.training_losses(
        sched, "xstart", model_out, x0_j, xt_j, t_j,
        mask=valid * jnp.asarray(missing),
        lambda_vel=lambda_vel, var_type="fixed_small", with_vb=True,
        vel_mask=valid,
    )

    np.testing.assert_allclose(np.asarray(terms_j["mse"]),
                               to_np(terms_t["rot_mse"]), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(terms_j["vel_mse"]),
                               to_np(terms_t["vel_mse"]), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(terms_j["loss"]),
                               to_np(terms_t["loss"]), atol=1e-4, rtol=1e-4)
    # vb's t==0 branch divides by exp(0.5·posterior_log_variance_clipped),
    # which at t=0 amplifies the ~1e-5 cross-framework model-forward delta
    # ~1000x into the NLL — 3e-3 relative is the honest bound there
    np.testing.assert_allclose(np.asarray(terms_j["vb"]),
                               to_np(terms_t["vb"]), atol=1e-4, rtol=3e-3)


def test_topp_mask_matches_reference(monkeypatch):
    """The nucleus construction LAW on fixed logits, top_p ∈ {0.3, 0.7, 0.9}
    (reference: model/guide.py:203-218).  The reference lines run LIVE inside
    `GuideTransformer.generate` with its transformer forward stubbed to emit
    preset logits; `torch.sort` and `Categorical` are wrapped to capture the
    sort permutation and the renormalized kept distribution the moment the
    reference samples from it.  Scattered back to vocab space, the kept-token
    masks must match exactly and the renormalized distributions to 1e-6 —
    including the shift-right that ALWAYS keeps the argmax even when its
    probability alone exceeds top_p."""
    from model.guide import GuideTransformer as RefGuide

    from audio2photoreal_tpu.models.guide import nucleus_probs

    torch.manual_seed(7)
    TOK, NL, D = 32, 2, 64
    ref = RefGuide(
        tokens=TOK, num_heads=4, num_layers=NL, dim=D, ff_size=96,
        dropout=0.0, emb_len=798, num_audio_layers=2,
    ).eval()

    B, seq_len, layers = 2, 3, 2
    steps = seq_len * layers
    rng = np.random.RandomState(41)
    # mix of flat and peaked rows so different top_p values cut differently;
    # one row is a near-delta to exercise the always-keep-argmax shift
    fixed = rng.randn(steps, B, TOK).astype(np.float32) * 2.0
    fixed[0, 0] = 0.0
    fixed[0, 0, 5] = 12.0  # argmax prob ≈ 1 > any top_p

    state = {"i": 0, "sorted": [], "probs": []}

    def fake_forward(input_tokens, condition):
        out = torch.zeros(input_tokens.shape[0], input_tokens.shape[1], TOK)
        out[:, -1, :] = torch.as_tensor(fixed[state["i"]])
        state["i"] += 1
        return out

    real_sort = torch.sort

    def capture_sort(*a, **k):
        vals, idx = real_sort(*a, **k)
        state["sorted"].append((to_np(vals), to_np(idx)))
        return vals, idx

    class CaptureCat:
        def __init__(self, probs):
            state["probs"].append(to_np(probs))
            self._B = probs.shape[0]

        def sample(self):
            return torch.zeros(self._B, dtype=torch.int64)

    monkeypatch.setattr(ref, "forward", fake_forward)
    monkeypatch.setattr(torch, "sort", capture_sort)
    import model.guide as ref_guide_mod

    monkeypatch.setattr(ref_guide_mod, "Categorical", CaptureCat)

    dummy_audio = torch.zeros(B, 16, 2)
    for top_p in (0.3, 0.7, 0.9):
        state.update(i=0, sorted=[], probs=[])
        with torch.no_grad():
            ref.generate(dummy_audio, seq_len, layers,
                         n_sequences=B, top_p=top_p)
        assert len(state["probs"]) == steps == len(state["sorted"])

        for step in range(steps):
            _, idx_t = state["sorted"][step]
            kept_t = state["probs"][step]  # renormalized, sorted order
            # scatter the reference's kept distribution to vocab space
            vocab_t = np.zeros((B, TOK), np.float64)
            np.put_along_axis(vocab_t, idx_t, kept_t.astype(np.float64), -1)

            sorted_idx, keep, kept = nucleus_probs(
                jnp.asarray(fixed[step]), top_p
            )
            vocab_j = np.zeros((B, TOK), np.float64)
            np.put_along_axis(vocab_j, np.asarray(sorted_idx),
                              np.where(np.asarray(keep),
                                       np.asarray(kept, np.float64), 0.0), -1)

            np.testing.assert_array_equal(
                vocab_j > 0, vocab_t > 0,
                err_msg=f"keep mask, top_p={top_p} step={step}",
            )
            np.testing.assert_allclose(
                vocab_j, vocab_t, atol=1e-6,
                err_msg=f"renormalized probs, top_p={top_p} step={step}",
            )
