"""Debug-viz helpers (reference image.py:421-977) + TrainPlatform registry."""

import numpy as np
import pytest


def test_tensor2rgb_normalization():
    from audio2photoreal_tpu.render.viz import tensor2rgb

    x = np.linspace(-1, 1, 64).reshape(8, 8)
    u8 = tensor2rgb(x)
    assert u8.dtype == np.uint8 and u8.min() == 0 and u8.max() == 255
    # explicit range clips
    u8b = tensor2rgb(x, x_min=0.0, x_max=1.0)
    assert u8b[0, 0] == 0 and u8b[-1, -1] == 255


def test_jet_lut_endpoints():
    from audio2photoreal_tpu.render.viz import get_color_map, tensor2rgbjet

    lut = get_color_map()
    assert lut.shape == (256, 3)
    # classic jet: low = blue-ish, mid = green-ish, high = red-ish
    assert lut[0, 2] > 100 and lut[0, 0] == 0
    assert lut[128, 1] > 200
    assert lut[255, 0] > 100 and lut[255, 2] == 0
    img = tensor2rgbjet(np.linspace(0, 1, 16).reshape(4, 4), x_min=0, x_max=1)
    assert img.shape == (4, 4, 3)


def test_tensor2image_modes_and_label():
    from audio2photoreal_tpu.render.viz import tensor2image

    x = np.random.RandomState(0).rand(3, 32, 48).astype(np.float32)
    rgb = tensor2image(x)
    assert rgb.shape == (32, 48, 3) and rgb.dtype == np.uint8
    jet = tensor2image(x[:1], mode="jet", label="tex")
    assert jet.shape == (32, 48, 3)
    gray = tensor2image(x[0])  # [H, W] path
    assert gray.shape == (32, 48, 3)
    with pytest.raises(ValueError):
        tensor2image(np.zeros((5, 8, 8)))


def test_kpts2heatmap_peaks_at_keypoint():
    from audio2photoreal_tpu.render.viz import kpts2heatmap

    kpts = np.array([[[5.0, 9.0], [2.0, 3.0]]])  # (x, y)
    hm = kpts2heatmap(kpts, (16, 12), sigma=2)
    assert hm.shape == (1, 2, 16, 12)
    assert hm[0, 0].argmax() == 9 * 12 + 5  # peak at (y=9, x=5)
    assert hm[0, 1].argmax() == 3 * 12 + 2
    np.testing.assert_allclose(hm.max(), 1.0)


def test_make_image_grid_tensor_and_dict():
    from audio2photoreal_tpu.render.viz import make_image_grid

    imgs = np.random.RandomState(1).rand(5, 3, 16, 16) * 255
    grid = make_image_grid(imgs)
    assert grid.dtype == np.uint8 and grid.shape[0] % 16 == 0 and grid.shape[1] % 16 == 0
    assert grid.shape[0] * grid.shape[1] >= 5 * 16 * 16

    d = {"rgb": imgs, "depth": np.random.RandomState(2).rand(5, 1, 8, 8) * 255}
    grid2 = make_image_grid(d, draw_labels=True)
    assert grid2.ndim == 3 and grid2.shape[-1] == 3
    with pytest.raises(ValueError):
        make_image_grid(imgs, grid_size=(1, 2))


def test_make_image_grid_batched_columns_are_keys():
    """Reference layout (image.py:743-825): one column per key, one row per
    batch sample; resize-to-cap never drops samples."""
    from audio2photoreal_tpu.render.viz import make_image_grid_batched

    d = {
        "a": np.random.RandomState(3).rand(4, 3, 8, 8),
        "b": np.random.RandomState(4).rand(4, 1, 8, 8),
    }
    grid = make_image_grid_batched(d, draw_labels=False, input_is_in_0_1=True)
    assert grid.shape == (32, 16, 3)
    # mixed sizes resize to the common (capped) height; all 4 samples kept
    d["c"] = np.random.RandomState(5).rand(4, 3, 16, 16)
    grid = make_image_grid_batched(
        d, draw_labels=False, input_is_in_0_1=True, max_row_height=8
    )
    assert grid.shape == (32, 24, 3)


def test_feature2rgb_shape():
    from audio2photoreal_tpu.render.viz import feature2rgb

    x = np.random.RandomState(5).rand(7, 12, 10)
    out = feature2rgb(x, scale=2)
    assert out.shape == (24, 20, 3) and out.dtype == np.uint8


def test_clearml_platform_registered_lazy():
    from audio2photoreal_tpu.train.logging import create_platform

    # registry knows it; construction fails only because the SDK is absent,
    # exactly the reference's lazy-import behavior (train_platforms.py:24-31)
    with pytest.raises(ModuleNotFoundError):
        create_platform("ClearmlPlatform", "/tmp/x/y")
    with pytest.raises(ValueError):
        create_platform("NopePlatform", None)
