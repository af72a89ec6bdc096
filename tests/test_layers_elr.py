"""ELR layer family vs the REAL reference modules (reference imported at
test time only, never vendored — same pattern as test_convert_avatar)."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from visualize.ca_body.nn.layers import (  # noqa: E402
    Conv2dELR as RefConv2dELR,
    Downsample as RefDownsample,
    LinearELR as RefLinearELR,
    gaussian_kernel as ref_gaussian_kernel,
)

from audio2photoreal_tpu.render.layers_elr import (  # noqa: E402
    Conv2dELR,
    LinearELR,
    blur_downsample,
    concat_pyramid,
    gaussian_kernel,
)

torch.manual_seed(0)


def to_np(x):
    return x.detach().cpu().numpy()


def test_gaussian_kernel_matches_reference():
    for k in (3, 5, 7):
        np.testing.assert_allclose(gaussian_kernel(k), ref_gaussian_kernel(k), atol=1e-6)


def test_linear_elr_matches_reference():
    ref = RefLinearELR(12, 7, gain=1.3, lr_mul=0.5).eval()
    with torch.no_grad():
        ref.weight.normal_()
        ref.bias.normal_()
    x = torch.randn(4, 12)
    with torch.no_grad():
        out_t = ref(x)
    params = {
        "params": {"weight": to_np(ref.weight).T, "bias": to_np(ref.bias)}
    }
    out_j = LinearELR(7, gain=1.3, lr_mul=0.5).apply(params, jnp.asarray(to_np(x)))
    np.testing.assert_allclose(np.asarray(out_j), to_np(out_t), atol=1e-5)


def test_conv2d_elr_forward_untied_matches_reference():
    ref = RefConv2dELR(6, 8, 3, padding=1, untied=True, height=10, width=10,
                       lr_mul=0.7).eval()
    with torch.no_grad():
        ref.weight.normal_()
        ref.bias.normal_()
    x = torch.randn(2, 6, 10, 10)
    with torch.no_grad():
        out_t = ref(x)
    params = {
        "params": {
            "weight": to_np(ref.weight).transpose(2, 3, 1, 0),
            "bias": to_np(ref.bias).transpose(1, 2, 0),
        }
    }
    out_j = Conv2dELR(
        8, 3, padding=1, untied=True, height=10, width=10, lr_mul=0.7,
    ).apply(params, jnp.asarray(to_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out_j), to_np(out_t).transpose(0, 2, 3, 1), atol=2e-5
    )


def test_conv2d_elr_fuse_box_filter_matches_reference():
    ref = RefConv2dELR(6, 8, 3, padding=1, fuse_box_filter=True).eval()
    with torch.no_grad():
        ref.weight.normal_()
        ref.bias.normal_()
    x = torch.randn(2, 6, 10, 10)
    with torch.no_grad():
        out_t = ref(x)  # fused 4×4 kernel → 9×9 output
    params = {
        "params": {
            "weight": to_np(ref.weight).transpose(2, 3, 1, 0),
            "bias": to_np(ref.bias),
        }
    }
    out_j = Conv2dELR(8, 3, padding=1, fuse_box_filter=True).apply(
        params, jnp.asarray(to_np(x).transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out_j), to_np(out_t).transpose(0, 2, 3, 1), atol=2e-5
    )


def test_conv2d_elr_transpose_matches_reference():
    ref = RefConv2dELR(6, 8, 4, stride=2, padding=1, transpose=True).eval()
    with torch.no_grad():
        ref.weight.normal_()
        ref.bias.normal_()
    x = torch.randn(2, 6, 8, 8)
    with torch.no_grad():
        out_t = ref(x)  # [2, 8, 16, 16]
    params = {
        "params": {
            "weight": to_np(ref.weight).transpose(2, 3, 1, 0),
            "bias": to_np(ref.bias),
        }
    }
    out_j = Conv2dELR(8, 4, stride=2, padding=1, transpose=True).apply(
        params, jnp.asarray(to_np(x).transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out_j), to_np(out_t).transpose(0, 2, 3, 1), atol=2e-5
    )


def test_blur_downsample_matches_reference():
    ref = RefDownsample(filt_size=3, stride=2, channels=5).eval()
    x = torch.randn(2, 5, 12, 12)
    with torch.no_grad():
        out_t = ref(x)
    out_j = blur_downsample(jnp.asarray(to_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out_j), to_np(out_t).transpose(0, 2, 3, 1), atol=1e-5
    )


def test_concat_pyramid_runs_and_shapes():
    """Shape/semantics smoke test matching the reference's usage: a
    TRANSPOSED (upsampling) branch whose input starts at the pyramid's
    smallest level (layers.py:833-855 — pyramid[0] is the most-blurred)."""
    import flax.linen as nn

    class Branch(nn.Module):
        @nn.compact
        def __call__(self, x, y):
            convs = [
                Conv2dELR(8, 4, stride=2, padding=1, transpose=True, name="c0"),
                lambda h: nn.leaky_relu(h, negative_slope=0.2),
                Conv2dELR(8, 4, stride=2, padding=1, transpose=True, name="c1"),
            ]
            return concat_pyramid(convs, x, y, every_other=True, transposed=True)

    b = Branch()
    x = jnp.zeros((1, 4, 4, 4))
    y = jnp.zeros((1, 16, 16, 2))
    import jax

    params = b.init(jax.random.PRNGKey(0), x, y)
    out = b.apply(params, x, y)
    assert out.shape == (1, 16, 16, 8)
