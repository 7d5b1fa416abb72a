"""Resize ops vs torch F.interpolate (both align_corners modes + nearest)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from adaptersis_tpu.ops.resize import center_pad, resize_bilinear, resize_nearest


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("size", [(8, 8), (17, 13), (64, 64), (5, 9)])
def test_bilinear_matches_torch(align, size):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 11, 7, 3), dtype=np.float32)
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
                      mode="bilinear", align_corners=align)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("size", [(8, 8), (21, 14)])
def test_nearest_matches_torch(size):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 9, 6, 2), dtype=np.float32)
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(resize_nearest(jnp.asarray(x), size))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("size", [(11, 13), (21, 7), (11, 7)])
def test_bilinear_single_axis_and_noop(size):
    """Sizes that leave one (or both) axes unchanged take the per-axis
    fallback; they must still match torch exactly."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 11, 7, 3), dtype=np.float32)
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
                      mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_center_pad_matches_torch():
    x = np.arange(2 * 3 * 4 * 1, dtype=np.float32).reshape(2, 3, 4, 1)
    want = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), [1, 2, 2, 2]).permute(0, 2, 3, 1).numpy()
    got = np.asarray(center_pad(jnp.asarray(x), (7, 7)))
    np.testing.assert_allclose(got, want)
