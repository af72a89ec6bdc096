"""Data-layer tests on the synthetic person fixture."""

import numpy as np
import pytest

from audio2photoreal_tpu.core.config import DataConfig
from audio2photoreal_tpu.data.dataset import SocialDataset, load_local_data, split_scenes
from audio2photoreal_tpu.data.fixtures import make_synthetic_person
from audio2photoreal_tpu.data.stats import DataStats


@pytest.fixture(scope="module")
def person_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_person(str(root), "SYNTH01", num_scenes=8, frames_per_scene=64)
    return str(root)


def _cfg(fmt="pose"):
    return DataConfig(
        person="SYNTH01",
        data_format=fmt,
        max_seq_length=48,
        min_seq_length=32,
        batch_size=2,
    )


def test_load_local_data_contract(person_dir):
    scenes = load_local_data(person_dir, "SYNTH01")
    assert len(scenes) == 8
    sc = scenes[0]
    assert sc.pose.shape == (64, 104)
    assert sc.face.shape == (64, 256)
    assert sc.audio.shape == (64 * 1600, 2)
    assert sc.missing.dtype == bool


def test_splits(person_dir):
    scenes = load_local_data(person_dir, "SYNTH01")
    tr = split_scenes(scenes, "train")
    va = split_scenes(scenes, "val")
    te = split_scenes(scenes, "test")
    assert len(tr) == 2 and len(va) == 2 and len(te) == 4
    names = {s.name for s in tr} | {s.name for s in va} | {s.name for s in te}
    assert len(names) == 8  # disjoint


def test_pose_batch_shapes_and_masks(person_dir):
    scenes = load_local_data(person_dir, "SYNTH01")
    stats = DataStats.load(f"{person_dir}/SYNTH01/data_stats.npz")
    ds = SocialDataset(scenes, stats, _cfg("pose"), "train")
    batch = ds.sample_batch(np.random.RandomState(0), 2)
    assert batch["motion"].shape == (2, 48, 104)
    assert batch["mask"].shape == (2, 48)
    assert batch["audio"].shape == (2, 48 * 1600, 2)
    assert batch["keyframes"].shape == (2, 2, 104)
    for b in range(2):
        L = int(batch["lengths"][b])
        assert batch["mask"][b, :L].sum() == L
        assert batch["mask"][b, L:].sum() == 0
        # padding is zero
        assert np.all(batch["motion"][b, L:] == 0)


def test_face_batch_zeroes_missing(person_dir):
    scenes = load_local_data(person_dir, "SYNTH01")
    stats = DataStats.load(f"{person_dir}/SYNTH01/data_stats.npz")
    ds = SocialDataset(scenes, stats, _cfg("face"), "train")
    batch = ds.sample_batch(np.random.RandomState(0), 4)
    assert batch["motion"].shape == (4, 48, 256)
    # masked (missing) frames must carry zero motion
    masked = batch["mask"] == 0
    assert np.all(batch["motion"][masked] == 0)


def test_znorm_roundtrip(person_dir):
    stats = DataStats.load(f"{person_dir}/SYNTH01/data_stats.npz")
    x = np.random.RandomState(0).randn(10, 104).astype(np.float32)
    np.testing.assert_allclose(stats.inv_pose(stats.norm_pose(x)), x, rtol=1e-4, atol=1e-5)
    c = np.random.RandomState(1).randn(10, 256).astype(np.float32)
    np.testing.assert_allclose(stats.inv_code(stats.norm_code(c)), c, rtol=1e-4, atol=1e-5)


def test_test_split_chunking(person_dir):
    scenes = load_local_data(person_dir, "SYNTH01")
    stats = DataStats.load(f"{person_dir}/SYNTH01/data_stats.npz")
    ds = SocialDataset(scenes, stats, _cfg("pose"), "test")
    assert len(ds) == 4  # 64 frames → one 48-frame chunk per scene
    ex = ds.get_chunk(0)
    assert int(ex["lengths"]) == 48
