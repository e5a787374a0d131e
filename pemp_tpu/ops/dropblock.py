"""DropBlock2D regularization (train-only structured dropout).

Matches the semantics of the third-party ``dropblock`` pip package used by
the reference purifier heads (reference: networks/pemp_stage1.py:76-80,
networks/backbones.py:324-357):

- bernoulli seed mask with ``gamma = drop_prob / block_size**2``, sampled
  per-sample over the spatial map and shared across channels;
- blocks grown with a stride-1 max-pool of kernel ``block_size`` and
  padding ``block_size // 2`` (one row/col cropped for even block sizes);
- output rescaled by ``numel / kept`` over the whole mask batch.

Implemented NHWC with ``lax.reduce_window`` so XLA lowers it to a single
fused VPU pass on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def dropblock_2d(rng: jax.Array, x: jnp.ndarray, drop_prob: float,
                 block_size: int, deterministic: bool = False) -> jnp.ndarray:
    """Apply DropBlock to ``x`` of shape [N, H, W, C].

    ``deterministic=True`` (eval) is the identity, as is ``drop_prob == 0``.
    """
    if deterministic or drop_prob == 0.0:
        return x

    n, h, w, _ = x.shape
    gamma = drop_prob / (block_size ** 2)
    seed = (jax.random.uniform(rng, (n, h, w)) < gamma).astype(jnp.float32)

    pad = block_size // 2
    grown = lax.reduce_window(
        seed, -jnp.inf, lax.max,
        window_dimensions=(1, block_size, block_size),
        window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)),
    )
    if block_size % 2 == 0:
        grown = grown[:, :-1, :-1]
    block_mask = 1.0 - grown                                     # [N, H, W]

    kept = jnp.sum(block_mask)
    scale = block_mask.size / jnp.maximum(kept, 1.0)
    return (x * block_mask[..., None] * scale).astype(x.dtype)
