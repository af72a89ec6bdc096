"""End-to-end app pipeline as a repeatable test: train all three model
families through their CLIs' entry functions on the synthetic person, then
generate with guide keyframing and score with the eval metrics.

This is the pytest form of the reference's only integration story
(train → sample.generate → utils/eval, SURVEY §4).
"""

import os

import numpy as np
import pytest

from audio2photoreal_tpu.core.config import (
    DataConfig,
    DenoiserConfig,
    DiffusionConfig,
    GuideConfig,
    TrainConfig,
    VQConfig,
)
from audio2photoreal_tpu.data.fixtures import make_synthetic_person


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    make_synthetic_person(root, "SYNTH01", num_scenes=8, frames_per_scene=96)
    return root


@pytest.fixture(scope="module")
def trained(pipeline_dirs):
    from audio2photoreal_tpu.apps import train_diffusion, train_guide, train_vq

    root = pipeline_dirs
    dc = DataConfig(person="SYNTH01", data_format="pose", max_seq_length=60,
                    min_seq_length=60, batch_size=4)

    vcfg = VQConfig(nfeats=104, emb_width=8, code_dim=16, depth=2, kmeans_iters=2)
    train_vq.train(root, f"{root}/vq", vcfg, dc,
                   TrainConfig(save_dir=f"{root}/vq", lr=1e-3, num_steps=3,
                               save_interval=3, log_interval=10))

    gcfg = GuideConfig(latent_dim=16, ff_size=32, num_layers=1, num_heads=2)
    train_guide.train(root, f"{root}/guide", f"{root}/vq", gcfg, dc,
                      TrainConfig(save_dir=f"{root}/guide", lr=2e-4, num_steps=2,
                                  save_interval=2, log_interval=10))

    mcfg = DenoiserConfig(data_format="pose", nfeats=104, latent_dim=16, ff_size=32,
                          num_layers=1, num_heads=2, max_seq_length=60)
    train_diffusion.train(root, f"{root}/diff", mcfg, DiffusionConfig(), dc,
                          TrainConfig(save_dir=f"{root}/diff", lr=1e-4, num_steps=2,
                                      save_interval=2, log_interval=10))
    return root


def test_generate_results_layout(trained):
    from audio2photoreal_tpu.apps import generate

    root = trained
    out = generate.generate(
        f"{root}/diff", root, num_samples=2, guidance_param=2.0,
        timestep_respacing="ddim3", guide_path=f"{root}/guide",
        vq_path=f"{root}/vq",
    )
    r = np.load(out, allow_pickle=True).item()
    # reference results.npy layout: motion [B, C, 1, T] (sample/generate.py:146-152)
    assert set(r.keys()) >= {"motion", "gt", "audio", "lengths"}
    assert r["motion"].shape[1:3] == (104, 1)
    assert r["gt"].shape == r["motion"].shape
    assert np.isfinite(r["motion"]).all()

    from audio2photoreal_tpu.apps.eval_metrics import evaluate_results

    pred = r["motion"][:, :, 0, :][None]
    gt = r["gt"][:, :, 0, :][None]
    m = evaluate_results(pred, gt)
    assert set(m) == {"cross_var", "var_g", "var_k", "fid_g", "fid_k"}
    assert np.isfinite(m["fid_g"])


def test_training_resume(trained):
    """Checkpoint-resume contract: restarting the diffusion trainer picks up
    from the saved step (training_loop.py:89-107 role)."""
    from audio2photoreal_tpu.apps import train_diffusion

    root = trained
    dc = DataConfig(person="SYNTH01", data_format="pose", max_seq_length=60,
                    min_seq_length=60, batch_size=4)
    mcfg = DenoiserConfig(data_format="pose", nfeats=104, latent_dim=16, ff_size=32,
                          num_layers=1, num_heads=2, max_seq_length=60)
    # continue to step 4 — resume must load step 2, run 2 more
    state = train_diffusion.train(
        root, f"{root}/diff", mcfg, DiffusionConfig(), dc,
        TrainConfig(save_dir=f"{root}/diff", lr=1e-4, num_steps=4,
                    save_interval=4, log_interval=10),
    )
    assert int(state.step) == 4
