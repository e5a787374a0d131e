"""Dtype helpers shared by ops and models."""

import jax.numpy as jnp


def f32up(x):
    """Cast to at least float32 without ever downcasting: bf16/f16 -> f32
    (the TPU compute-path promotion the models rely on), f32 -> f32, and
    f64 stays f64 (so float64 parity tests — tests/test_train_parity.py —
    can drive the full model at double precision under jax x64)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))
