"""On-device EDT vs scipy, and boundary extraction vs the torch conv recipe."""

import numpy as np
import torch
import torch.nn.functional as F
from scipy.ndimage import distance_transform_edt

import jax.numpy as jnp

from pemp_tpu.ops import (
    euclidean_distance_transform,
    boundary_map,
    edt_boundary_weight,
)


def test_edt_matches_scipy():
    rng = np.random.RandomState(0)
    feat = rng.rand(2, 37, 53) < 0.02
    feat[0, 5, 7] = True  # guarantee at least one feature pixel
    feat[1, 20, 30] = True
    got = np.asarray(euclidean_distance_transform(jnp.asarray(feat)))
    for b in range(feat.shape[0]):
        want = distance_transform_edt(~feat[b])
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_edt_no_feature_gives_huge_distance():
    feat = np.zeros((1, 16, 16), bool)
    got = np.asarray(euclidean_distance_transform(jnp.asarray(feat)))
    assert np.all(got > 1e5)


def test_boundary_map_matches_torch_convs():
    rng = np.random.RandomState(1)
    target = (rng.rand(3, 33, 41) > 0.5).astype(np.int32)
    got = np.asarray(boundary_map(jnp.asarray(target)))

    # reference recipe (core/losses.py:35-40)
    mask = torch.from_numpy((target == 1).astype(np.float32))[:, None]
    kernel = torch.ones(1, 1, 3, 3)
    s = F.conv2d(mask, kernel, padding=1)
    dilated = torch.clamp(s, 0, 1) - mask
    erosion = mask - torch.clamp(s - 8, 0, 1)
    want = np.around((dilated + erosion).squeeze(1).numpy()).astype(bool)
    np.testing.assert_array_equal(got, want)


def test_edt_boundary_weight_matches_reference_pipeline():
    rng = np.random.RandomState(2)
    target = np.zeros((1, 41, 41), np.int32)
    target[0, 10:25, 12:30] = 1
    sigma = 5.0
    got = np.asarray(edt_boundary_weight(jnp.asarray(target), sigma))

    mask = torch.from_numpy((target == 1).astype(np.float32))[:, None]
    kernel = torch.ones(1, 1, 3, 3)
    s = F.conv2d(mask, kernel, padding=1)
    boundary = (torch.clamp(s, 0, 1) - mask + mask
                - torch.clamp(s - 8, 0, 1)).squeeze(1).numpy()
    bool_b = np.around(boundary).astype(bool)
    edt = np.stack([distance_transform_edt(~b) for b in bool_b])
    want = np.exp(-edt / sigma ** 2) + 1
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
