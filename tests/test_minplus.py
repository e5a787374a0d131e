"""Pallas min-plus matmul / EDT kernel vs the jnp ground truth
(interpreter mode on CPU). The EDT phases are integer-valued f32, so the
kernel must match EXACTLY wherever any feature pixel exists."""

import numpy as np
import pytest

import jax.numpy as jnp

from pemp_tpu.ops.edt import boundary_map, euclidean_distance_transform
from pemp_tpu.ops.pallas.minplus import edt2_pallas, minplus_matmul


@pytest.mark.parametrize("m,k,n", [(40, 37, 53), (128, 8, 128), (33, 401, 65)])
def test_minplus_matmul_exact(m, k, n):
    rng = np.random.RandomState(0)
    a = rng.randint(0, 2 ** 20, (m, k)).astype(np.float32)
    b = rng.randint(0, 2 ** 20, (k, n)).astype(np.float32)
    want = (a[:, :, None] + b[None, :, :]).min(axis=1)
    got = np.asarray(minplus_matmul(jnp.asarray(a), jnp.asarray(b),
                                    interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape", [(2, 37, 53), (1, 64, 64)])
def test_edt2_pallas_matches_jnp_ground_truth(shape):
    rng = np.random.RandomState(1)
    feat = rng.rand(*shape) < 0.02
    feat[:, 5, 7] = True                     # at least one feature pixel
    d_jnp = np.asarray(euclidean_distance_transform(
        jnp.asarray(feat), use_pallas=False))
    d2_pal = np.asarray(edt2_pallas(jnp.asarray(feat), interpret=True))
    np.testing.assert_array_equal(np.sqrt(d2_pal), d_jnp)


def test_edt2_pallas_empty_map_huge():
    feat = np.zeros((1, 16, 16), bool)
    d2 = np.asarray(edt2_pallas(jnp.asarray(feat), interpret=True))
    assert np.all(np.sqrt(d2) > 1e5)


def test_edt2_pallas_on_real_boundaries():
    """End-to-end shape: boundary extraction -> pallas EDT vs jnp EDT
    on a realistic blob label map."""
    rng = np.random.RandomState(2)
    target = np.zeros((2, 41, 41), np.int32)
    target[0, 10:25, 12:30] = 1
    target[1, 3:9, 4:7] = 1
    target[1, 20:30, 25:33] = 1
    feat = boundary_map(jnp.asarray(target))
    d_jnp = np.asarray(euclidean_distance_transform(feat, use_pallas=False))
    d2_pal = np.asarray(edt2_pallas(feat, interpret=True))
    np.testing.assert_array_equal(np.sqrt(d2_pal), d_jnp)
