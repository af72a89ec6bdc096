"""Face-pipeline integration: train step + CFG sampling with lip conditioning.

Covers the face variant of the denoiser (reference: model/diffusion.py:154-171
— cond pre-encoder + lip-vertex conditioning through the frozen regressor)
end-to-end at tiny scale on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.core.config import DataConfig, DenoiserConfig, DiffusionConfig, TrainConfig
from audio2photoreal_tpu.data.dataset import SocialDataset, load_local_data
from audio2photoreal_tpu.data.fixtures import make_synthetic_person
from audio2photoreal_tpu.data.stats import DataStats
from audio2photoreal_tpu.diffusion import sampling
from audio2photoreal_tpu.diffusion.respace import maybe_respaced
from audio2photoreal_tpu.diffusion.schedules import make_schedule
from audio2photoreal_tpu.models.cfg import cfg_model_fn
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.train.loops import make_diffusion_train_step
from audio2photoreal_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def face_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("faced"))
    make_synthetic_person(root, "SYNTH01", num_scenes=8, frames_per_scene=32)
    scenes = load_local_data(root, "SYNTH01")
    stats = DataStats.load(f"{root}/SYNTH01/data_stats.npz")
    dc = DataConfig(person="SYNTH01", data_format="face", max_seq_length=24, min_seq_length=24, batch_size=2)
    ds = SocialDataset(scenes, stats, dc, "train")
    batch = ds.sample_batch(np.random.RandomState(0), 2)
    mcfg = DenoiserConfig(
        data_format="face", nfeats=256, latent_dim=16, ff_size=32,
        num_layers=1, num_heads=2, max_seq_length=24, cond_encoder_layers=1,
    )
    model = FiLMDenoiser(mcfg)
    x = jnp.asarray(batch["motion"])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        x, jnp.zeros((2,), jnp.int32), jnp.asarray(batch["audio"]),
    )
    return model, params, batch, mcfg


def test_face_train_step_decreases_loss(face_setup):
    model, params, batch, mcfg = face_setup
    dcfg = DiffusionConfig()
    sched = make_schedule(dcfg.schedule, dcfg.steps)
    state = create_train_state(params, TrainConfig(lr=1e-3))
    step = jax.jit(make_diffusion_train_step(model, sched, dcfg))
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for i in range(3):
        state, m = step(state, b, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))


def test_face_cfg_sampling(face_setup):
    model, params, batch, mcfg = face_setup
    sched = maybe_respaced("cosine", 1000, "ddim5")
    audio = jnp.asarray(batch["audio"])
    cond = model.apply(params, audio, method=FiLMDenoiser.encode_conditioning)
    assert cond.pose_tokens is None

    def apply_fn(p, x, t, c, keep):
        return model.apply(p, x, t, c, keep, method=FiLMDenoiser.denoise)

    # reference face guidance is 10.0 (demo/demo.py:133)
    mf = cfg_model_fn(apply_fn, params, cond, guidance_scale=10.0)
    xT = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 256))
    res = sampling.ddim_sample_loop(sched, "xstart", mf, xT, jax.random.PRNGKey(3))
    assert res.pred_xstart.shape == (2, 24, 256)
    assert bool(jnp.all(jnp.isfinite(res.pred_xstart)))


def test_lip_conditioning_changes_output(face_setup):
    """Different channel-0 audio → different lip features → different cond."""
    model, params, batch, mcfg = face_setup
    a1 = jnp.asarray(batch["audio"])
    a2 = a1.at[..., 0].multiply(-1.0)
    c1 = model.apply(params, a1, method=FiLMDenoiser.encode_conditioning)
    c2 = model.apply(params, a2, method=FiLMDenoiser.encode_conditioning)
    assert not np.allclose(np.asarray(c1.cond_tokens), np.asarray(c2.cond_tokens), atol=1e-5)
