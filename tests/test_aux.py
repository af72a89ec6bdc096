"""Auxiliary subsystem tests: calibration modules, timestep resampler, EMA,
profiling utils, kv-logger."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.core.config import TrainConfig
from audio2photoreal_tpu.diffusion import tsample
from audio2photoreal_tpu.render.calibration import (
    CalV3,
    CalV5,
    CameraPixelBias,
    LearnableBlur,
    gaussian_blur,
)
from audio2photoreal_tpu.train.logging import KVLogger
from audio2photoreal_tpu.train.state import create_train_state, update_ema
from audio2photoreal_tpu.utils.profiling import Timer, aot_compile


def test_gaussian_blur_preserves_interior_mean():
    img = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32))
    out = gaussian_blur(img, 5, 1.0)
    assert out.shape == img.shape
    # zero-padded borders darken; the interior mean must be preserved
    assert float(jnp.abs(out[:, 4:-4, 4:-4].mean() - img[:, 4:-4, 4:-4].mean())) < 0.03
    # constant image stays constant in the interior
    const = jnp.ones((1, 16, 16, 1))
    np.testing.assert_allclose(
        np.asarray(gaussian_blur(const, 5, 1.0)[0, 4:-4, 4:-4, 0]), 1.0, atol=1e-5
    )


def test_calibration_modules_shapes():
    img = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32))
    cam = jnp.array([0, 2])
    for M in (CalV3(4), CalV5(4)):
        p = M.init(jax.random.PRNGKey(0), img, cam)
        out = M.apply(p, img, cam)
        assert out.shape == img.shape
    blur = LearnableBlur(4)
    p = blur.init(jax.random.PRNGKey(1), img, cam)
    out = blur.apply(p, img, cam)
    assert out.shape == img.shape
    # identity init → softmax uniform → mix of blurs, still finite
    assert bool(jnp.all(jnp.isfinite(out)))
    pb = CameraPixelBias(4, 16, 16, ds_rate=4)
    p = pb.init(jax.random.PRNGKey(2), cam)
    # single-channel broadcast bias, matching the reference's per-camera bias map
    assert pb.apply(p, cam).shape == (2, 16, 16, 1)


def test_loss_second_moment_resampler_warms_up():
    state = tsample.LossSecondMomentState.init(10, history_per_term=3)
    w0 = tsample.loss_second_moment_weights(state)
    np.testing.assert_allclose(np.asarray(w0), 0.1, atol=1e-6)  # uniform before warm
    # feed losses: timestep 0 always high loss, others low
    key = jax.random.PRNGKey(0)
    for i in range(30):  # every timestep needs ≥3 hits to warm the buffer
        t = jnp.array([0, (i % 9) + 1])
        losses = jnp.array([10.0, 0.1])
        state = tsample.loss_second_moment_update(state, t, losses)
    w = tsample.loss_second_moment_weights(state)
    assert float(w[0]) > float(w[5])  # high-loss timestep sampled more


def test_uniform_sampler_bounds():
    t, w = tsample.uniform_sample(jax.random.PRNGKey(0), 100, 64)
    assert t.shape == (64,) and int(t.min()) >= 0 and int(t.max()) < 100
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_ema_update_moves_toward_params():
    params = {"w": jnp.ones((3,))}
    st = create_train_state(params, TrainConfig(lr=1e-2, ema_decay=0.5))
    st = st.replace(params={"w": jnp.full((3,), 2.0)})
    st = update_ema(st, 0.5)
    np.testing.assert_allclose(np.asarray(st.ema_params["w"]), 1.5)


def test_timer_and_logger(tmp_path, capsys):
    t = Timer()
    assert t.tick() > 0
    lg = KVLogger(str(tmp_path))
    lg.logkv_mean("a", 1.0)
    lg.logkv_mean("a", 3.0)
    lg.dump(step=5)
    out = capsys.readouterr().out
    assert "a 2" in out
    lg.close()
    assert (tmp_path / "log.jsonl").exists()


def test_train_platform_strategy(tmp_path):
    """TrainPlatform strategy surface (reference train_platforms.py:10-56)."""
    from dataclasses import dataclass

    from audio2photoreal_tpu.train.logging import (
        NoPlatform,
        TensorboardPlatform,
        create_platform,
    )

    NoPlatform().report_scalar("x", 1.0, 0)  # no-op by contract
    assert isinstance(create_platform("NoPlatform", None), NoPlatform)
    with pytest.raises(ValueError):
        create_platform("ClearmlPlatform", None)

    tp = TensorboardPlatform(str(tmp_path))
    tp.report_scalar("loss", 0.5, iteration=3, group_name="train")
    tp.report_scalar("loss", 0.25, iteration=4)

    @dataclass
    class A:
        lr: float = 1e-4

    tp.report_args(A(), name="args")
    tp.close()
    assert (tmp_path / "args.json").exists()
    assert (tmp_path / "log.jsonl").exists()


def test_aot_compile_runs():
    c = aot_compile("add", lambda x: x + 1, jnp.zeros((4,)), verbose=False)
    np.testing.assert_allclose(np.asarray(c(jnp.zeros((4,)))), 1.0)
