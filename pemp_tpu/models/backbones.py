"""Flax backbones: dilated ResNet-50/101, VGG16, and the episode
Communication-Module (CM) variants.

Structural counterpart of the reference ``networks/backbones.py`` with a
TPU-native realization: NHWC layout, explicit torch-convention padding so
converted torchvision weights line up, stride-8 output via dilation
(layer3 stride 1 dilation 2, optional layer4 dilation 4 — reference
:97-101), and frozen-BN-by-optimizer-mask.

The CM variants implement the PEMP stage-2 "communication modules": at a
stage boundary, prior-masked mean+max pooled features of all S+Q images of
an episode are averaged across the episode, projected to n=2 channels and
broadcast-concatenated to every image (reference :208-247, :469-499).
The episode pooling couples all images of an episode, which is why the
sharding rules keep whole episodes device-local (SURVEY.md section 2.4).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pemp_tpu.models.layers import (
    BatchNorm, Conv, Dtype, kaiming_normal_relu, max_pool_torch,
)


class BottleNeck(nn.Module):
    """ResNet bottleneck with stride on the first 1x1 conv (reference
    :42-77 — caffe-style, matching the torchvision v1 checkpoint keys)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dilation
        y = Conv(self.planes, (1, 1), stride=self.stride, use_bias=False,
                 dtype=self.dtype, name="conv1")(x)
        y = nn.relu(BatchNorm(dtype=self.dtype, name="bn1")(y, train))
        y = Conv(self.planes, (3, 3), padding=d, dilation=d, use_bias=False,
                 dtype=self.dtype, name="conv2")(y)
        y = nn.relu(BatchNorm(dtype=self.dtype, name="bn2")(y, train))
        y = Conv(self.planes * 4, (1, 1), use_bias=False,
                 dtype=self.dtype, name="conv3")(y)
        y = BatchNorm(dtype=self.dtype, name="bn3")(y, train)

        residual = x
        if self.use_downsample:
            residual = Conv(self.planes * 4, (1, 1), stride=self.stride,
                            use_bias=False, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = BatchNorm(dtype=self.dtype,
                                 name="downsample_bn")(residual, train)
        return nn.relu(y + residual)


def _stage_plan(layers: Sequence[int]):
    """(planes, stride, dilation) per stage, mirroring reference
    ``ResNet._make_layer`` calls at :97-101."""
    plan = [(64, 1, 1), (128, 2, 1), (256, 1, 2)]
    if len(layers) > 3:
        plan.append((512, 1, 4))
    return plan


class ResNet(nn.Module):
    """Dilated ResNet (output stride 8). ``layers=(3,4,6)`` is the 3-stage
    ResNet-50 trunk; ``(3,4,23)`` ResNet-101 (reference :80-157)."""
    layers: Tuple[int, ...] = (3, 4, 6)
    ret_features: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        x = Conv(64, (7, 7), stride=2, padding=3, use_bias=False,
                 dtype=self.dtype, name="conv1")(x)
        x = nn.relu(BatchNorm(dtype=self.dtype, name="bn1")(x, train))
        x = max_pool_torch(x, 3, 2, 1, ceil_mode=True)

        feats = []
        inplanes = 64
        for si, (planes, stride, dilation) in enumerate(_stage_plan(self.layers), 1):
            blocks = self.layers[si - 1]
            for bi in range(blocks):
                use_ds = bi == 0 and (
                    stride != 1 or inplanes != planes * 4 or dilation in (2, 4))
                x = BottleNeck(planes, stride if bi == 0 else 1, dilation,
                               use_downsample=use_ds, dtype=self.dtype,
                               name=f"layer{si}_{bi}")(x, train)
                inplanes = planes * 4
            feats.append(x)
        if self.ret_features:
            return feats
        return x


class CommModule(nn.Module):
    """Episode communication: prior-masked mean+max pooled features of all
    S+Q episode images -> episode mean -> linear -> n channels broadcast to
    every pixel (reference ResNetCM.comm :208-222)."""
    n: int = 2
    spq: int = 1      # S + Q images per episode
    mask_stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        # x: [B*spq, h, w, c]; mask: [B*spq, H, W, 1] at the previous scale
        mask = max_pool_torch(mask, 3, self.mask_stride, 1)
        nimg, h, w, c = x.shape
        b = nimg // self.spq
        masked = (x * mask).reshape(nimg, h * w, c)
        mean = jnp.mean(masked, axis=1).reshape(b, self.spq, c).mean(axis=1)
        mx = jnp.max(masked, axis=1).reshape(b, self.spq, c).mean(axis=1)
        feat = jnp.concatenate([mean, mx], axis=-1)                # [B, 2c]
        from pemp_tpu.models.layers import torch_bias_init, \
            torch_conv_default_init
        feat = nn.Dense(self.n, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=torch_conv_default_init(),
                        bias_init=torch_bias_init(feat.shape[-1]),
                        name="linear")(feat)                       # [B, n]
        feat = jnp.broadcast_to(feat[:, None, None, None, :],
                                (b, self.spq, h, w, self.n))
        return feat.reshape(nimg, h, w, self.n), mask


class ResNetCM(nn.Module):
    """3-stage ResNet with communication modules between stages
    (reference :160-247). Input is ``(x, prior)`` where prior is the
    4th-channel mask, also used as the CM pooling mask."""
    layers: Tuple[int, ...] = (3, 4, 6)
    spq: int = 2
    n: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xm, train: bool):
        x, mask = xm
        x = x.astype(self.dtype)
        mask = mask.astype(self.dtype)
        mask = max_pool_torch(mask, 3, 2, 1)

        x = Conv(64, (7, 7), stride=2, padding=3, use_bias=False,
                 dtype=self.dtype, name="conv1")(x)
        x = nn.relu(BatchNorm(dtype=self.dtype, name="bn1")(x, train))
        x = max_pool_torch(x, 3, 2, 1, ceil_mode=True)

        ci, mask = CommModule(self.n, self.spq, 2, dtype=self.dtype,
                              name="cm1")(x, mask)
        x = jnp.concatenate([x, ci], axis=-1)
        x = self._stage(x, 1, 64, self.layers[0], 1, 1, train)

        ci, mask = CommModule(self.n, self.spq, 1, dtype=self.dtype,
                              name="cm2")(x, mask)
        x = jnp.concatenate([x, ci], axis=-1)
        x = self._stage(x, 2, 128, self.layers[1], 2, 1, train)

        ci, mask = CommModule(self.n, self.spq, 2, dtype=self.dtype,
                              name="cm3")(x, mask)
        x = jnp.concatenate([x, ci], axis=-1)
        x = self._stage(x, 3, 256, self.layers[2], 1, 2, train)
        return x

    def _stage(self, x, si, planes, blocks, stride, dilation, train):
        # first block consumes the +n CM channels (reference :190-206)
        for bi in range(blocks):
            use_ds = bi == 0   # inplanes+n never equals planes*4
            x = BottleNeck(planes, stride if bi == 0 else 1, dilation,
                           use_downsample=use_ds, dtype=self.dtype,
                           name=f"layer{si}_{bi}")(x, train)
        return x


_VGG_PLAN = [
    # (convs, out_c, pool_stride, dilation)
    (2, 64, 2, 1),
    (2, 128, 2, 1),
    (3, 256, 2, 1),
    (3, 512, 1, 1),     # pool4 stride 1 (reference :392)
    (3, 512, 0, 2),     # conv5 dilated, no pool (reference :394-396)
]


class VGG16(nn.Module):
    """Dilated VGG16 trunk, output stride 8 (reference :372-421)."""
    last_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        del train
        x = x.astype(self.dtype)
        idx = 0
        for convs, out_c, pool_stride, dil in _VGG_PLAN:
            for _ in range(convs):
                x = Conv(out_c, (3, 3), padding=dil, dilation=dil,
                         dtype=self.dtype, kernel_init=kaiming_normal_relu(),
                         name=f"conv{idx}")(x)
                idx += 1
                last = idx == 13
                if not last or self.last_relu:
                    x = nn.relu(x)
            if pool_stride:
                x = max_pool_torch(x, 3, pool_stride, 1)
        return x


class VGG16CM(nn.Module):
    """VGG16 with communication modules after each of the 4 blocks
    (reference :424-500). Fixes the reference's ``init_weights`` latent
    ``self.cm`` bug (backbones.py:518) by construction — CM channels are
    always zero-padded in the converted pretrained weights."""
    spq: int = 2
    n: int = 2
    last_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xm, train: bool):
        del train
        x, mask = xm
        x = x.astype(self.dtype)
        mask = mask.astype(self.dtype)
        idx = 0
        # blocks 1-4 each followed by a CM (strides 2,2,2,1)
        for blk, (convs, out_c, pool_stride, dil) in enumerate(_VGG_PLAN[:4], 1):
            for _ in range(convs):
                x = nn.relu(Conv(out_c, (3, 3), padding=dil, dilation=dil,
                                 dtype=self.dtype,
                                 kernel_init=kaiming_normal_relu(),
                                 name=f"conv{idx}")(x))
                idx += 1
            x = max_pool_torch(x, 3, pool_stride, 1)
            cm_stride = 2 if blk < 4 else 1
            ci, mask = CommModule(self.n, self.spq, cm_stride,
                                  dtype=self.dtype, name=f"cm{blk}")(x, mask)
            x = jnp.concatenate([x, ci], axis=-1)
        # block 5: dilated convs, no pool
        convs, out_c, _, dil = _VGG_PLAN[4]
        for ci_ in range(convs):
            x = Conv(out_c, (3, 3), padding=dil, dilation=dil,
                     dtype=self.dtype, kernel_init=kaiming_normal_relu(),
                     name=f"conv{idx}")(x)
            idx += 1
            if ci_ < convs - 1 or self.last_relu:
                x = nn.relu(x)
        return x
