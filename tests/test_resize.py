"""Resize ops must bit-match torch F.interpolate conventions."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pemp_tpu.ops import resize_bilinear_align_corners, resize_nearest
from pemp_tpu.ops.resize import resize_bilinear_align_corners_np


CASES = [
    ((2, 51, 51, 3), (401, 401)),     # logits upsample (stride-8 -> input)
    ((1, 51, 51, 2), (375, 500)),     # variable-size eval GT
    ((2, 401, 401, 2), (51, 51)),     # mask downsample
    ((1, 7, 9, 4), (7, 9)),           # identity
    ((1, 5, 5, 1), (1, 1)),           # collapse
]


@pytest.mark.parametrize("in_shape,out_hw", CASES)
def test_bilinear_align_corners_matches_torch(in_shape, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(*in_shape).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    # torch expects NCHW
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, out_hw, mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    # XLA CPU vs torch differ by f32 rounding on a handful of pixels
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("in_shape,out_hw", CASES)
def test_nearest_matches_torch(in_shape, out_hw):
    rng = np.random.RandomState(1)
    x = rng.randn(*in_shape).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, out_hw, mode="nearest")
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_numpy_twin_matches_jax():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 51, 51, 2).astype(np.float32)
    got = resize_bilinear_align_corners_np(x, (375, 500))
    want = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (375, 500)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
