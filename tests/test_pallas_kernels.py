"""Pallas kernels vs jnp ground truth (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pemp_tpu.ops.prototypes import (
    meta_prototype_assign, prototype_predictions,
)
from pemp_tpu.ops.pallas.mpm import (
    meta_prototype_assign_pallas, prototype_match_pallas,
)


@pytest.mark.parametrize("n,c,p,s", [(100, 128, 3, 1), (64, 256, 3, 2),
                                     (50, 128, 1, 1)])
def test_assign_kernel_matches_reference(n, c, p, s):
    rng = np.random.RandomState(0)
    b = 2
    sup = rng.randn(b, s, n, c).astype(np.float32)
    fg = (rng.rand(b, s, n) > 0.6).astype(np.float32)
    bg = 1.0 - fg
    ctr = rng.rand(c, 2 * p).astype(np.float32)

    f1, b1 = meta_prototype_assign(
        jnp.asarray(sup), jnp.asarray(fg), jnp.asarray(bg),
        jnp.asarray(ctr), p)
    f2, b2 = meta_prototype_assign_pallas(
        jnp.asarray(sup), jnp.asarray(fg), jnp.asarray(bg),
        jnp.asarray(ctr), p, interpret=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n,c,p", [(100, 128, 3), (64, 256, 1)])
def test_match_kernel_matches_reference(n, c, p):
    rng = np.random.RandomState(1)
    b = 2
    qry = rng.randn(b, 1, n, c).astype(np.float32)
    fg = rng.randn(b, p, c).astype(np.float32)
    bg = rng.randn(b, p, c).astype(np.float32)

    l1, i1 = prototype_predictions(
        jnp.asarray(qry), jnp.asarray(fg), jnp.asarray(bg), 20.0,
        return_indices=True)
    l2, i2 = prototype_match_pallas(
        jnp.asarray(qry), jnp.asarray(fg), jnp.asarray(bg), 20.0,
        return_indices=True, interpret=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_assign_kernel_well_separated_classes_no_overflow():
    """Regression: when one class's distances exceed the other's max by
    more than exp's f32 range (~88), the per-class softmax must not
    overflow (inf * 0 = NaN). Features sit near the bg centers and far
    from the fg centers."""
    rng = np.random.RandomState(0)
    b, s, n, c, p = 1, 1, 40, 64, 3
    sup = rng.randn(b, s, n, c).astype(np.float32) * 0.1
    fg = (rng.rand(b, s, n) > 0.5).astype(np.float32)
    bg = 1.0 - fg
    ctr = np.zeros((c, 2 * p), np.float32)
    ctr[:, :p] = 10.0       # fg centers far away: ||f - ctr||^2 ~ 6400
    ctr[:, p:] = 0.0        # bg centers close

    f1, b1 = meta_prototype_assign(
        jnp.asarray(sup), jnp.asarray(fg), jnp.asarray(bg),
        jnp.asarray(ctr), p)
    f2, b2 = meta_prototype_assign_pallas(
        jnp.asarray(sup), jnp.asarray(fg), jnp.asarray(bg),
        jnp.asarray(ctr), p, interpret=True)
    assert np.isfinite(np.asarray(f2)).all()
    assert np.isfinite(np.asarray(b2)).all()
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-4, atol=1e-5)


def test_kernels_bf16_wire_bitmatch_f32_upcast():
    """bf16 features stay bf16 on the HBM wire (the kernels upcast in
    VMEM) — the result must be BIT-identical to upcasting to f32 first,
    because bf16->f32 conversion is exact. Guards the model-level change
    that dropped the eager f32up before the reshape/split."""
    rng = np.random.RandomState(7)
    b, s, n, c, p = 2, 1, 100, 128, 3
    sup16 = jnp.asarray(rng.randn(b, s, n, c), jnp.bfloat16)
    fg = jnp.asarray((rng.rand(b, s, n) > 0.6).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))

    f16, b16 = meta_prototype_assign_pallas(sup16, fg, bg, ctr, p,
                                            interpret=True)
    f32, b32 = meta_prototype_assign_pallas(sup16.astype(jnp.float32),
                                            fg, bg, ctr, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(f16), np.asarray(f32))
    np.testing.assert_array_equal(np.asarray(b16), np.asarray(b32))

    qry16 = jnp.asarray(rng.randn(b, 1, n, c), jnp.bfloat16)
    l16, i16 = prototype_match_pallas(qry16, f16, b16, 20.0,
                                      return_indices=True, interpret=True)
    l32, i32 = prototype_match_pallas(qry16.astype(jnp.float32), f16, b16,
                                      20.0, return_indices=True,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(l16), np.asarray(l32))
    np.testing.assert_array_equal(np.asarray(i16), np.asarray(i32))


@pytest.mark.parametrize("s,q,dtype", [(1, 1, "float32"), (2, 1, "bfloat16"),
                                       (1, 2, "float32")])
def test_packed_chain_bitmatches_unpacked_kernels(s, q, dtype):
    """mpm_chain_packed_pallas (support/query split via index_maps off one
    staged buffer) must be BIT-identical to running the two kernels on
    the split views."""
    from pemp_tpu.ops.pallas.mpm import mpm_chain_packed_pallas

    rng = np.random.RandomState(31)
    b, n, c, p = 2, 100, 128, 3
    fts = jnp.asarray(rng.randn(b, s + q, n, c), getattr(jnp, dtype))
    fg = jnp.asarray((rng.rand(b, s, n) > 0.6).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))

    lp, ip, fp, bp = mpm_chain_packed_pallas(
        fts, fg, bg, ctr, p, 20.0, return_residuals=True, interpret=True)

    f1, b1 = meta_prototype_assign_pallas(fts[:, :s], fg, bg, ctr, p,
                                          interpret=True)
    l1, i1 = prototype_match_pallas(fts[:, s:], f1, b1, 20.0,
                                    return_indices=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(bp), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(i1))
