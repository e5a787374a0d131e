"""Shared model plumbing: purifier heads, mask downsampling, output resize."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pemp_tpu.models.layers import (
    ASPP, ASPPV2, Conv, DropBlock, Dropout2d, Dtype,
)
from pemp_tpu.ops.resize import resize_bilinear_align_corners, resize_nearest

RESNET_LAYERS = {"resnet50": (3, 4, 6), "resnet101": (3, 4, 23)}


class PurifierV2(nn.Module):
    """Stage-1 purifier: 1x1 conv -> DropBlock -> 3x3 conv -> DropBlock ->
    ASPPV2 (reference: networks/pemp_stage1.py:73-80)."""
    out_channels: int = 512
    drop_rate: float = 0.1
    block_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.relu(Conv(256, (1, 1), dtype=self.dtype, name="conv1")(x))
        x = DropBlock(self.drop_rate, self.block_size, name="db1")(x, train)
        x = nn.relu(Conv(256, (3, 3), padding=1, dtype=self.dtype,
                         name="conv2")(x))
        x = DropBlock(self.drop_rate, self.block_size, name="db2")(x, train)
        return ASPPV2(256, 256, self.out_channels, self.drop_rate,
                      self.block_size, dtype=self.dtype, name="aspp")(x, train)


class PurifierV1(nn.Module):
    """Stage-2 purifier with channel dropout + ASPP
    (reference: networks/pemp_stage2.py:65-72)."""
    out_channels: int = 512
    drop_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.relu(Conv(256, (1, 1), dtype=self.dtype, name="conv1")(x))
        x = Dropout2d(self.drop_rate, name="drop1")(x, train)
        x = nn.relu(Conv(256, (3, 3), padding=1, dtype=self.dtype,
                         name="conv2")(x))
        x = Dropout2d(self.drop_rate, name="drop2")(x, train)
        return ASPP(256, 256, self.out_channels, self.drop_rate,
                    dtype=self.dtype, name="aspp")(x, train)


def downsample_masks(sup_mask: jnp.ndarray, hw: Tuple[int, int]):
    """Nearest-downsample [B,S,H,W,2] support masks to feature resolution,
    returning flattened fg/bg [B,S,n] (reference: pemp_stage1.py:147-148)."""
    b, s, H, W, _ = sup_mask.shape
    m = resize_nearest(sup_mask.reshape(b * s, H, W, 2), hw)
    m = m.reshape(b, s, hw[0] * hw[1], 2)
    return m[..., 0], m[..., 1]


def output_resize(logits: jnp.ndarray, out_hw: Optional[Tuple[int, int]]):
    """Upsample [B,Q,h,w,2] logits bilinearly (align_corners) to ``out_hw``;
    ``None`` keeps feature resolution (host resizes for variable-size GT)."""
    if out_hw is None:
        return logits
    b, q, h, w, c = logits.shape
    out = resize_bilinear_align_corners(
        logits.reshape(b * q, h, w, c), out_hw)
    return out.reshape(b, q, out_hw[0], out_hw[1], c)
