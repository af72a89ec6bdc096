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


@pytest.fixture(scope="module")
def results_path(trained):
    from audio2photoreal_tpu.apps import generate

    root = trained
    return generate.generate(
        f"{root}/diff", root, num_samples=2, guidance_param=2.0,
        timestep_respacing="ddim3", guide_path=f"{root}/guide",
        vq_path=f"{root}/vq",
    )


def test_generate_results_layout(results_path):
    r = np.load(results_path, allow_pickle=True).item()
    # reference results.npy layout: motions [B, C, 1, T] (sample/generate.py:146-152)
    assert set(r.keys()) >= {"motions", "gt", "audio", "lengths"}
    assert r["motions"].shape[1:3] == (104, 1)
    assert r["gt"].shape == r["motions"].shape
    assert np.isfinite(r["motions"]).all()

    from audio2photoreal_tpu.apps.eval_metrics import evaluate_results

    pred = r["motions"][:, :, 0, :][None]
    gt = r["gt"][:, :, 0, :][None]
    m = evaluate_results(pred, gt)
    assert set(m) == {"cross_var", "var_g", "var_k", "fid_g", "fid_k"}
    assert np.isfinite(m["fid_g"])


def test_generate_plot_renders_two_cam_video(trained, results_path, tmp_path):
    """--plot photoreal path (reference sample/generate.py:155-207): pose
    results + face-codes results + ca_body renderer bundle → per-sample video
    with frames from BOTH cameras side-by-side, plus a GT pane video."""
    import jax

    from audio2photoreal_tpu.apps.generate import _render_pred
    from audio2photoreal_tpu.apps.render_pipeline import Camera
    from audio2photoreal_tpu.render.assets import (
        make_synthetic_assets,
        save_renderer_bundle,
    )
    from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

    results = np.load(results_path, allow_pickle=True).item()
    B = results["motions"].shape[0]
    T = results["motions"].shape[-1]

    # fabricate the face-model results.npy (same audio — the cross-check
    # at sample/generate.py:187-189 must pass)
    face_res = {
        "motions": np.random.RandomState(0).randn(B, 256, 1, T).astype(np.float32),
        "gt": np.random.RandomState(1).randn(B, 256, 1, T).astype(np.float32),
        "audio": results["audio"],
    }
    face_path = str(tmp_path / "face_results.npy")
    np.save(face_path, face_res)

    # synthetic ca_body renderer bundle with a 2-camera rig
    rcfg = RendererConfig(
        uv_size=64, init_uv_size=16, upscale_size=128, n_embs=32, n_face_embs=256,
        n_pose_enc_channels=8, n_embs_enc_channels=8, n_init_channels=16,
        n_min_channels=4, shadow_size=32, view_unet_ftrs=4, encoder_in_size=64,
        face_tex_size=64, n_face_verts=64, image_height=48, image_width=32,
    )
    assets = make_synthetic_assets(rcfg)
    model = BodyAvatar(rcfg, assets)
    motion0 = np.zeros((1, 104), np.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        motion0, np.zeros((1, 3), np.float32),
        geom=assets.lbs.pose(None, motion0),
        face_embs=np.zeros((1, 256), np.float32),
    )
    cams = {
        "cam0": Camera(
            campos=np.array([0.0, -3.0, 1.0], np.float32),
            K=np.array([[40.0, 0, 16], [0, 40.0, 24], [0, 0, 1]], np.float32),
            Rt=np.array([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], np.float32),
        ),
        "cam1": Camera(
            campos=np.array([0.0, 3.0, 1.0], np.float32),
            K=np.array([[40.0, 0, 16], [0, 40.0, 24], [0, 0, 1]], np.float32),
            Rt=np.array([[-1, 0, 0, 0], [0, 0, -1, 1], [0, -1, 0, 3]], np.float32),
        ),
    }
    bundle = str(tmp_path / "renderer")
    save_renderer_bundle(bundle, rcfg, params, cams)

    out_dir = str(tmp_path / "plots")
    os.makedirs(out_dir, exist_ok=True)
    _render_pred(
        results,
        face_codes_path=face_path,
        renderer_path=bundle,
        out_dir=out_dir,
        num_samples=1,
        num_repetitions=1,
        render_gt=True,
    )
    # ffmpeg absent → .npz frame dumps; present → .mp4
    outs = sorted(os.listdir(out_dir))
    assert any("sample00_rep00_pred" in f for f in outs), outs
    assert any("sample00_rep00_gt" in f for f in outs), outs
    npzs = [f for f in outs if f.endswith(".npz")]
    if npzs:
        fr = np.load(os.path.join(out_dir, npzs[0]))["frames"]
        # two cameras side-by-side → width doubled
        assert fr.shape[2] == 2 * 32 and fr.shape[1] == 48
        assert fr.dtype == np.uint8


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


def test_guide_training_resume(trained):
    """Guide self-resume: iteration + model + optimizer survive a restart
    (reference train_guide.py:54-62,281-293 --resume_trans role)."""
    from audio2photoreal_tpu.apps import train_guide

    root = trained
    dc = DataConfig(person="SYNTH01", data_format="pose", max_seq_length=60,
                    min_seq_length=60, batch_size=4)
    gcfg = GuideConfig(latent_dim=16, ff_size=32, num_layers=1, num_heads=2)
    # the module fixture trained to step 2; continue to 4 — resume must load
    # step 2 and run exactly 2 more
    state = train_guide.train(
        root, f"{root}/guide", f"{root}/vq", gcfg, dc,
        TrainConfig(save_dir=f"{root}/guide", lr=2e-4, num_steps=4,
                    save_interval=4, log_interval=10),
    )
    assert int(state.step) == 4
    # the full-state payload still serves sample-time consumers
    # (generate.BodyPoseGenerator reads state/params from either layout)
    from audio2photoreal_tpu.train import checkpoints

    restored = checkpoints.restore(f"{root}/guide/ckpt", None)
    assert "state" in restored and "opt_state" in restored["state"]


def test_vq_training_resume(trained):
    """VQ self-resume: net + optimizer + codebook EMA state survive a restart
    (reference train_vq.py:157-165); load_tokenizer still reads the payload."""
    from audio2photoreal_tpu.apps import train_vq
    from audio2photoreal_tpu.apps.train_guide import load_tokenizer

    root = trained
    dc = DataConfig(person="SYNTH01", data_format="pose", max_seq_length=60,
                    min_seq_length=60, batch_size=4)
    vcfg = VQConfig(nfeats=104, emb_width=8, code_dim=16, depth=2, kmeans_iters=2)
    state, vq = train_vq.train(
        root, f"{root}/vq", vcfg, dc,
        TrainConfig(save_dir=f"{root}/vq", lr=1e-3, num_steps=5,
                    save_interval=5, log_interval=10),
    )
    assert int(state.step) == 5
    assert bool(vq.inited)  # codebook state restored, not re-kmeans'd
    codec, params, vq2, _ = load_tokenizer(f"{root}/vq")
    assert np.allclose(np.asarray(vq2.embed), np.asarray(vq.embed))
