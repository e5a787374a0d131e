"""Baseline few-shot segmenter: masked-average prototypes + cosine matching.

Behavioral counterpart of reference ``networks/baseline.py``:
- shared encoder over the concatenated support+query images,
- support features upsampled (bilinear, align_corners) to mask resolution
  before masked-average pooling (reference :100-110),
- fg/bg prototypes -> dense cosine similarity x dist_scalar, class order
  [bg, fg] (reference :144-149),
- logits bilinearly upsampled to ``out_hw``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


from pemp_tpu.models import backbones
from pemp_tpu.models.common import RESNET_LAYERS, output_resize
from pemp_tpu.models.layers import Conv, Dtype
from pemp_tpu.ops.prototypes import (
    masked_average_pooling_adjoint, prototype_predictions,
)


@dataclass
class NetConfig:
    """Scope ``net`` (reference: networks/baseline.py:19-24)."""
    dist_scalar: float = 20.0
    init_channels: int = 3
    backbone: str = "vgg16"        # vgg16 | resnet50
    out_channels: int = 512


class Baseline(nn.Module):
    backbone: str = "vgg16"
    out_channels: int = 512
    dist_scalar: float = 20.0
    dtype: Dtype = jnp.float32

    # param paths matching these regexes are excluded from optimization
    # (frozen backbone BN, reference backbones.py:56-62 freeze_bn=True)
    FROZEN = {"vgg16": [], "resnet50": [r"backbone/.*bn"]}

    @nn.compact
    def __call__(self, sup_img, sup_mask, qry_img,
                 out_hw: Optional[Tuple[int, int]] = "input",
                 train: bool = False):
        b, s, H, W, _ = sup_img.shape
        q = qry_img.shape[1]
        if out_hw == "input":
            out_hw = (H, W)

        imgs = jnp.concatenate([sup_img, qry_img], axis=1)
        imgs = imgs.reshape(b * (s + q), H, W, 3)
        if self.backbone == "vgg16":
            fts = backbones.VGG16(last_relu=False, dtype=self.dtype,
                                  name="backbone")(imgs, train)
        elif self.backbone == "resnet50":
            fts = backbones.ResNet(RESNET_LAYERS["resnet50"],
                                   dtype=self.dtype,
                                   name="backbone")(imgs, train)
            fts = Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="projection")(fts)
        else:
            raise ValueError(
                f"Not supported backbone '{self.backbone}'. [vgg16, resnet50]")

        # model-dtype features through the split; pooling and cosine ops
        # upcast internally (ops/prototypes.py), so the eager f32up only
        # cost an extra HBM pass of the largest activation on TPU
        h, w = fts.shape[1:3]
        c = fts.shape[-1]
        fts = fts.reshape(b, s + q, h, w, c)
        sup_fts = fts[:, :s]                                 # [b,s,h,w,c]
        qry_fts = fts[:, s:].reshape(b, q, h * w, c)

        # the reference upsamples support features to mask size before
        # pooling (ref :100); the adjoint form pools the original
        # features against the down-projected mask — same math, no
        # [B,S,H,W,c] tensor (tests/test_prototypes.py)
        fg_vecs = masked_average_pooling_adjoint(sup_fts, sup_mask[..., 0])
        bg_vecs = masked_average_pooling_adjoint(sup_fts, sup_mask[..., 1])
        fg_proto = jnp.mean(fg_vecs, axis=1)
        bg_proto = jnp.mean(bg_vecs, axis=1)

        logits = prototype_predictions(qry_fts, fg_proto, bg_proto,
                                       self.dist_scalar)
        logits = logits.reshape(b, q, h, w, 2)
        return output_resize(logits, out_hw)
