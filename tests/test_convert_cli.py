"""End-to-end test of the checkpoint-conversion CLI.

Fabricates a reference-layout ``checkpoints/`` tree (README.md:178-198) with
REAL reference torch modules (FiLMTransformer / GuideTransformer /
TemporalVertexCodec, random-init, fairseq+torchaudio stubbed), runs
``apps/convert_checkpoint.convert_person`` over it, and asserts the converted
dirs load through this framework's own loaders with forward parity — the
"download → convert → run" path a switching user takes."""

import dataclasses
import json
import os
import sys

import numpy as np
import pytest
import torch
import jax

import jax.numpy as jnp

# installs the fairseq/torchaudio stubs + /root/reference on sys.path
import tests.test_convert_fullmodel as fm  # noqa: F401

from audio2photoreal_tpu.apps.convert_checkpoint import convert_person
from audio2photoreal_tpu.core.config import load_config
from audio2photoreal_tpu.train import checkpoints


def _write_args(d, **kw):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "args.json"), "w") as f:
        json.dump(kw, f)


def to_np(x):
    return x.detach().cpu().numpy()


@pytest.fixture(scope="module")
def fake_tree(tmp_path_factory):
    """checkpoints/ tree with pose diffusion + vq + guide, reference-shaped."""
    torch.manual_seed(0)
    root = str(tmp_path_factory.mktemp("checkpoints"))
    from model.diffusion import FiLMTransformer
    from model.guide import GuideTransformer as RefGuide
    from model.vqvae import TemporalVertexCodec as RefVQ

    class _Args:
        add_frame_cond = 1
        data_format = "pose"
        max_seq_length = 600

    # pose denoiser at the reference's derived operating point for pose
    # (utils/model_util.py:49-56: latent 256, ff 1024) but only 2 layers
    pose = FiLMTransformer(
        _Args(), nfeats=104, latent_dim=256, ff_size=1024, num_layers=2,
        num_heads=4, dropout=0.0, split_type="test", device="cpu",
    ).eval()
    dd = os.path.join(root, "diffusion", "c1_pose")
    _write_args(
        dd, data_format="pose", layers=2, heads=4, max_seq_length=600,
        noise_schedule="cosine", sigma_small=True, lambda_vel=2.0,
        add_frame_cond=1, data_root="dataset/PXB184", not_rotary=False,
    )
    torch.save(pose.state_dict(), os.path.join(dd, "model000000001.pt"))

    vq = RefVQ(n_vertices=104, latent_dim=16, categories=32, residual_depth=2)
    vd = os.path.join(root, "vq", "c1_vq")
    _write_args(
        vd, nb_joints=104, output_emb_width=16, code_dim=32, depth=2,
        data_format="pose", max_seq_length=600, add_frame_cond=1,
        data_root="dataset/PXB184",
    )
    torch.save({"net": vq.state_dict()}, os.path.join(vd, "net_iter000001.pth"))

    guide = RefGuide(
        tokens=32, num_heads=4, num_layers=2, dim=64, ff_size=1024,
        dropout=0.0, emb_len=1998, num_audio_layers=2,
    ).eval()
    gd = os.path.join(root, "guide", "c1_pose")
    _write_args(
        gd, layers=2, dim=64, num_audio_layers=2, max_seq_length=600,
        resume_pth=os.path.join(vd, "net_iter000001.pth"),
        data_format="pose", add_frame_cond=1, data_root="dataset/PXB184",
    )
    os.makedirs(os.path.join(gd, "checkpoints"), exist_ok=True)
    torch.save(
        {"model_state_dict": guide.state_dict()},
        os.path.join(gd, "checkpoints", "iter-0000001.pt"),
    )
    return root, pose, vq, guide


@pytest.mark.slow
def test_convert_person_roundtrip(fake_tree, tmp_path, monkeypatch):
    # encode_keyframes hardcodes .cuda() (diffusion.py:321) — run it on CPU
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    root, pose, vq, guide = fake_tree
    out = convert_person(root, "PXB184", str(tmp_path / "converted"))
    assert set(out) == {"c1_pose", "c1_vq", "guide_c1_pose"}

    # ---- VQ: config + params + vq state restore; decode parity ----
    vcfgs = load_config(out["c1_vq"])
    vcfg = vcfgs["vq"]
    assert (vcfg.code_dim, vcfg.depth, vcfg.emb_width, vcfg.nfeats) == (32, 2, 16, 104)
    restored = checkpoints.restore(os.path.join(out["c1_vq"], "ckpt"), None)
    from audio2photoreal_tpu.models.vqvae import TemporalVertexCodec, VQState

    codec = TemporalVertexCodec(vcfg)
    vstate = VQState(
        embed=jnp.asarray(restored["vq"]["embed"]),
        embed_avg=jnp.asarray(restored["vq"]["embed_avg"]),
        cluster_size=jnp.asarray(restored["vq"]["cluster_size"]),
        inited=jnp.asarray(True),
    )
    codes = np.random.RandomState(0).randint(0, 32, (2, 3, 2))
    out_j = codec.apply(
        restored["params"], jnp.asarray(codes), vstate,
        method=TemporalVertexCodec.decode,
    )
    with torch.no_grad():
        out_t = vq.decode(torch.as_tensor(codes))  # [B,T,depth] → [B,T,nfeats]
    np.testing.assert_allclose(np.asarray(out_j), to_np(out_t), atol=2e-4, rtol=1e-3)

    # ---- guide: config derived from the VQ it resumed from; logits parity ----
    gcfgs = load_config(out["guide_c1_pose"])
    gcfg = gcfgs["guide"]
    assert (gcfg.tokens, gcfg.latent_dim, gcfg.num_layers, gcfg.vq_depth) == (32, 64, 2, 2)
    g = checkpoints.restore(os.path.join(out["guide_c1_pose"], "ckpt"), None)
    from audio2photoreal_tpu.models.guide import GuideTransformer

    B, T = 2, 18
    audio = torch.randn(B, T * 1600, 2) * 0.1
    tokens = torch.randint(0, 33, (B, 5))
    with torch.no_grad():
        logits_t = guide(tokens, audio, cond_drop_prob=0.0)
    gmodel = GuideTransformer(dataclasses.replace(gcfg, dropout=0.0, dtype="float32"))
    logits_j = gmodel.apply(
        g["params"], jnp.asarray(to_np(tokens).astype(np.int32)),
        jnp.asarray(to_np(audio)), cond_drop_prob=0.0, deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), to_np(logits_t), atol=2e-4, rtol=1e-3
    )

    # ---- diffusion: config + forward parity through the converted dir ----
    pcfgs = load_config(out["c1_pose"])
    mcfg, dcfg = pcfgs["denoiser"], pcfgs["diffusion"]
    assert (mcfg.data_format, mcfg.nfeats, mcfg.latent_dim, mcfg.num_layers) == (
        "pose", 104, 256, 2)
    assert dcfg.var_type == "fixed_small" and dcfg.lambda_vel == 2.0
    d = checkpoints.restore(os.path.join(out["c1_pose"], "ckpt"), None)
    from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser

    B, T = 2, 12
    x = torch.randn(B, T, 104)
    t = torch.tensor([37, 512])
    audio = torch.randn(B, T * 1600, 2) * 0.1
    kf = torch.randn(B, 1, 104)
    with torch.no_grad():
        out_t = pose(
            x, t,
            {"audio": audio, "keyframes": kf.clone(),
             "mask": torch.ones(B, 1, 1, T, dtype=torch.bool)},
            cond_drop_prob=0.0,
        )
    model = FiLMDenoiser(dataclasses.replace(mcfg, dropout=0.0))
    out_j = model.apply(
        d["params"], jnp.asarray(to_np(x)),
        jnp.asarray(to_np(t).astype(np.int32)), jnp.asarray(to_np(audio)),
        jnp.asarray(to_np(kf)), jnp.ones((B, 1)),
        cond_drop_prob=0.0, deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out_j), to_np(out_t), atol=5e-4, rtol=1e-3)


def test_convert_person_empty_tree_raises(tmp_path):
    root = tmp_path / "empty"
    for sub in ("diffusion/c1_pose", "vq/c1_vq", "guide/c1_pose/checkpoints"):
        os.makedirs(root / sub, exist_ok=True)
    with pytest.raises(FileNotFoundError):
        convert_person(str(root), "PXB184", str(tmp_path / "out"))


@pytest.mark.slow
def test_convert_person_partial_tree_vq_only(fake_tree, tmp_path):
    """A tree holding only the VQ family converts just that family — the
    per-family glob loop must not require the others to exist."""
    import shutil

    root, _, _, _ = fake_tree
    part = tmp_path / "partial"
    shutil.copytree(os.path.join(root, "vq"), part / "vq")
    out = convert_person(str(part), "PXB184", str(tmp_path / "out"))
    assert set(out) == {"c1_vq"}
    vcfg = load_config(out["c1_vq"])["vq"]
    assert vcfg.depth == 2 and vcfg.nfeats == 104


@pytest.mark.slow
def test_convert_person_picks_latest_checkpoint(fake_tree, tmp_path):
    """Two model*.pt snapshots → the numerically-last one is converted
    (reference keeps all snapshots; generate loads the newest)."""
    import shutil

    root, pose, _, _ = fake_tree
    tree = tmp_path / "tree"
    shutil.copytree(os.path.join(root, "diffusion"), tree / "diffusion")
    dd = tree / "diffusion" / "c1_pose"
    # an OLDER snapshot with zeroed weights; the newer real one must win
    zeroed = {k: torch.zeros_like(v) for k, v in pose.state_dict().items()}
    torch.save(zeroed, dd / "model000000000.pt")
    out = convert_person(str(tree), "PXB184", str(tmp_path / "out"))
    d = checkpoints.restore(os.path.join(out["c1_pose"], "ckpt"), None)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(d["params"])]
    assert any(np.abs(x).sum() > 0 for x in leaves)
