"""On-device exact Euclidean distance transform for the ``cedt`` loss.

The reference loss ``CELossDT`` (reference: core/losses.py:17-43) extracts
the fg boundary with 3x3 dilation/erosion convolutions and then round-trips
the boundary to the CPU to run ``scipy.ndimage.distance_transform_edt``
*per training step*. On TPU that host round-trip would serialize the step,
so the EDT runs on-device here with the classic two-phase exact algorithm:

1. per-column vertical distances via forward/backward ``lax.scan``
   (O(H), vectorized over batch and width);
2. per-row min-plus envelope ``edt^2[i,j] = min_j' (g[i,j']^2 + (j-j')^2)``
   evaluated as a chunked broadcast-min reduce — a few hundred MFLOPs of
   pure VPU work, exact (bit-matches scipy up to f32 rounding).

Pixels with no feature anywhere get a huge distance, which makes the
boundary weight decay to exactly 1 (the reference behaves the same way in
the limit).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_INF = 1.0e6        # larger than any realistic pixel distance; _INF**2 fits f32
_ROW_CHUNK = 64     # rows per min-plus chunk (memory/VMEM knob)


def _vertical_pass(feature: jnp.ndarray) -> jnp.ndarray:
    """Per-column distance (in rows) to the nearest feature pixel.

    feature: [B, H, W] bool
    returns: [B, H, W] f32
    """
    d0 = jnp.where(feature, 0.0, _INF).astype(jnp.float32)     # [B,H,W]
    d_rows = jnp.moveaxis(d0, 1, 0)                            # [H,B,W]

    def fwd(carry, row):
        new = jnp.minimum(row, carry + 1.0)
        return new, new

    init = jnp.full(d_rows.shape[1:], _INF, jnp.float32)
    _, down = lax.scan(fwd, init, d_rows)
    _, up = lax.scan(fwd, init, d_rows, reverse=True)
    return jnp.moveaxis(jnp.minimum(down, up), 0, 1)           # [B,H,W]


def euclidean_distance_transform(feature: jnp.ndarray) -> jnp.ndarray:
    """Exact EDT: distance from each pixel to the nearest True pixel.

    feature: [B, H, W] bool. Returns [B, H, W] f32 distances (``~1e6``
    where no feature pixel exists at all).
    """
    b, h, w = feature.shape
    g = _vertical_pass(feature)
    g2 = (g * g).reshape(b * h, w)                             # [BH, W]

    cols = jnp.arange(w, dtype=jnp.float32)
    d2 = (cols[:, None] - cols[None, :]) ** 2                  # [W, W] static

    rows = b * h
    chunk = min(_ROW_CHUNK, rows)
    pad = (-rows) % chunk
    if pad:
        g2 = jnp.concatenate(
            [g2, jnp.full((pad, w), _INF * _INF, jnp.float32)], axis=0)
    g2 = g2.reshape(-1, chunk, w)

    def min_plus(chunk_rows):                                  # [chunk, W]
        # [chunk, Wout, Win] broadcast; XLA tiles the reduce over Win.
        return jnp.min(chunk_rows[:, None, :] + d2[None, :, :], axis=-1)

    edt2 = lax.map(min_plus, g2).reshape(-1, w)[:rows]
    return jnp.sqrt(edt2).reshape(b, h, w)


def boundary_map(target: jnp.ndarray) -> jnp.ndarray:
    """Foreground boundary via 3x3 dilation/erosion of the fg mask.

    Matches the reference construction (core/losses.py:35-40): with
    ``m = (target == 1)`` and ``s = zero-padded 3x3 box sum of m``,
    ``boundary = (clamp(s,0,1) - m) + (m - clamp(s - 8, 0, 1))``.

    target: [B, H, W] integer labels. Returns [B, H, W] bool.
    """
    m = (target == 1).astype(jnp.float32)
    s = lax.reduce_window(
        m, 0.0, lax.add,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    dilated = jnp.clip(s, 0.0, 1.0) - m
    erosion = m - jnp.clip(s - 8.0, 0.0, 1.0)
    return jnp.round(dilated + erosion) >= 1.0


def edt_boundary_weight(target: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Per-pixel CE weight ``exp(-EDT(boundary)/sigma^2) + 1``
    (reference: core/losses.py:30)."""
    edt = euclidean_distance_transform(boundary_map(target))
    return jnp.exp(-edt / (sigma ** 2)) + 1.0
