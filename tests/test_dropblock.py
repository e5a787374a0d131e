"""DropBlock semantics: identity at eval, block structure + rescale at train."""

import numpy as np

import jax
import jax.numpy as jnp

from pemp_tpu.ops import dropblock_2d


def test_eval_is_identity():
    x = jnp.ones((2, 16, 16, 4))
    out = dropblock_2d(jax.random.PRNGKey(0), x, 0.5, 4, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = dropblock_2d(jax.random.PRNGKey(0), x, 0.0, 4, deterministic=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_drop_shared_across_channels_and_rescaled():
    x = jnp.ones((4, 32, 32, 8))
    out = np.asarray(dropblock_2d(jax.random.PRNGKey(1), x, 0.3, 4))
    # zeros must be shared across the channel axis
    zero_mask = out == 0
    assert zero_mask.any(), "expected some dropped pixels at drop_prob=0.3"
    assert (zero_mask.all(axis=-1) == zero_mask.any(axis=-1)).all()
    # kept values are all rescaled by the same factor = numel / kept
    kept = out[~zero_mask]
    factor = kept.flat[0]
    np.testing.assert_allclose(kept, factor, rtol=1e-5)
    n_total = np.prod(zero_mask.shape[:-1])
    n_kept = n_total - zero_mask.all(axis=-1).sum()
    np.testing.assert_allclose(factor, n_total / n_kept, rtol=1e-5)


def test_expected_drop_fraction():
    # with gamma = p / bs^2 and block growth, dropped fraction ~ p (loosely)
    x = jnp.ones((8, 64, 64, 1))
    out = np.asarray(dropblock_2d(jax.random.PRNGKey(2), x, 0.2, 4))
    frac = (out == 0).mean()
    assert 0.05 < frac < 0.5, frac
