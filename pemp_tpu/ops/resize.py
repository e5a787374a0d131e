"""Exact PyTorch-semantics image resizing as XLA-friendly gathers.

The reference relies on ``F.interpolate(mode='bilinear', align_corners=True)``
for logits upsampling (reference: networks/pemp_stage1.py:157-162,
networks/baseline.py:100,117) and ``mode='nearest'`` for mask downsampling
(networks/pemp_stage1.py:147). ``jax.image.resize`` implements neither
convention, so both are built here from first principles as separable
gathers with statically computed indices/weights — XLA fuses these into
cheap vectorized ops, and shapes stay static under ``jit``.

Conventions (matching torch):
- bilinear align_corners=True: ``src = dst * (in - 1) / (out - 1)``
  (src = 0 when out == 1).
- nearest: ``src = floor(dst * in / out)``.

All functions operate on the last-but-N spatial axes of channels-last
arrays ``[..., H, W, C]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pemp_tpu.ops.dtypes import f32up
import numpy as np


def _nearest_coords(in_size: int, out_size: int):
    src = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return jnp.asarray(np.clip(src.astype(np.int64), 0, in_size - 1))


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out, in] interpolation matrix (2 nonzeros per row)."""
    if out_size == 1:
        src = np.zeros((1,), np.float64)
    else:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    mat = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    mat[rows, i0] += 1.0 - w1
    mat[rows, i1] += w1
    return mat


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw, spatial_axes=(-3, -2)):
    """Bilinear resize with torch ``align_corners=True`` semantics.

    Implemented as two small dense matmuls (``W_h @ x @ W_w^T``) rather
    than gathers: on TPU the gather formulation's BACKWARD lowers to
    scatters, which are pathologically slow — the matmul form keeps both
    directions on the MXU (its transpose is just the transposed matmul).

    Parameters
    ----------
    x: [..., H, W, C] (or any layout — give ``spatial_axes``)
    out_hw: (out_h, out_w) static ints
    """
    ah, aw = [a % x.ndim for a in spatial_axes]
    in_h, in_w = x.shape[ah], x.shape[aw]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = f32up(x)

    hi = jax.lax.Precision.HIGHEST
    if in_h != out_h:
        wh = jnp.asarray(_interp_matrix(in_h, out_h))        # [out_h, in_h]
        xf = jnp.moveaxis(
            jnp.tensordot(wh, jnp.moveaxis(xf, ah, 0), axes=((1,), (0,)),
                          precision=hi), 0, ah)
    if in_w != out_w:
        ww = jnp.asarray(_interp_matrix(in_w, out_w))        # [out_w, in_w]
        xf = jnp.moveaxis(
            jnp.tensordot(ww, jnp.moveaxis(xf, aw, 0), axes=((1,), (0,)),
                          precision=hi), 0, aw)
    return xf.astype(dtype)


def resize_nearest(x: jnp.ndarray, out_hw, spatial_axes=(-3, -2)):
    """Nearest-neighbor resize with torch ``mode='nearest'`` semantics."""
    ah, aw = [a % x.ndim for a in spatial_axes]
    in_h, in_w = x.shape[ah], x.shape[aw]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if (in_h, in_w) == (out_h, out_w):
        return x
    x = jnp.take(x, _nearest_coords(in_h, out_h), axis=ah)
    x = jnp.take(x, _nearest_coords(in_w, out_w), axis=aw)
    return x


def resize_bilinear_align_corners_np(x: np.ndarray, out_hw, spatial_axes=(-3, -2)):
    """Numpy twin of :func:`resize_bilinear_align_corners` for the host-side
    variable-shape eval path (query GT stays at its original resolution —
    reference: data_kits/pascal_voc.py:229 — so the final logits resize
    happens off the jit path, per episode)."""
    ah, aw = [a % x.ndim for a in spatial_axes]
    in_h, in_w = x.shape[ah], x.shape[aw]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if (in_h, in_w) == (out_h, out_w):
        return x
    xf = x.astype(np.float32)

    def coords(in_size, out_size):
        if out_size == 1:
            src = np.zeros((1,), np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
        i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        w1 = (src - i0).astype(np.float32)
        return i0, i1, 1.0 - w1, w1

    i0, i1, w0, w1 = coords(in_h, out_h)
    shape = [1] * x.ndim
    shape[ah] = out_h
    xf = (np.take(xf, i0, axis=ah) * w0.reshape(shape)
          + np.take(xf, i1, axis=ah) * w1.reshape(shape))
    j0, j1, v0, v1 = coords(in_w, out_w)
    shape = [1] * x.ndim
    shape[aw] = out_w
    xf = (np.take(xf, j0, axis=aw) * v0.reshape(shape)
          + np.take(xf, j1, axis=aw) * v1.reshape(shape))
    return xf
