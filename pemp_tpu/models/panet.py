"""PANet: baseline prototypes + prototype alignment regularization.

Behavioral counterpart of reference ``networks/panet.py``: the forward
pass is the Baseline (support features upsampled to mask size before
pooling, reference :99-109), plus ``alignLoss`` (:158-194): query
predictions produce query prototypes which must segment the support
images; the CE against the support fg masks is returned as an auxiliary
loss.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pemp_tpu.core.losses import cross_entropy_no_ignore

from pemp_tpu.models import backbones
from pemp_tpu.models.common import RESNET_LAYERS, output_resize
from pemp_tpu.models.layers import Conv, Dtype
from pemp_tpu.ops.prototypes import (
    masked_average_pooling, masked_average_pooling_adjoint,
    prototype_predictions,
)


@dataclass
class NetConfig:
    """Scope ``net`` (reference: networks/panet.py:19-24)."""
    dist_scalar: float = 20.0
    init_channels: int = 3
    backbone: str = "vgg16"
    out_channels: int = 512


class PANet(nn.Module):
    backbone: str = "vgg16"
    out_channels: int = 512
    dist_scalar: float = 20.0
    dtype: Dtype = jnp.float32

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

        # model-dtype features through the split; pooling/cosine upcast
        # internally (ops/prototypes.py) — see pemp_stage1.py
        h, w = fts.shape[1:3]
        c = fts.shape[-1]
        fts = fts.reshape(b, s + q, h, w, c)
        sup_fts = fts[:, :s]                                 # [b,s,h,w,c]
        qry_fts = fts[:, s:].reshape(b, q, h * w, c)

        # adjoint form of the reference's upsample-then-pool (:100-110):
        # identical math without the [B,S,H,W,c] tensor
        fg_proto = jnp.mean(
            masked_average_pooling_adjoint(sup_fts, sup_mask[..., 0]), axis=1)
        bg_proto = jnp.mean(
            masked_average_pooling_adjoint(sup_fts, sup_mask[..., 1]), axis=1)

        pred = prototype_predictions(qry_fts, fg_proto, bg_proto,
                                     self.dist_scalar)       # [b,q,n,2]
        output = output_resize(pred.reshape(b, q, h, w, 2), out_hw)

        align_loss = self._align_loss(
            qry_fts, pred, sup_fts.reshape(b, s, h * w, c),
            sup_mask[..., 0], (h, w))
        return output, align_loss

    def _align_loss(self, qry_fts, pred, sup_fts, sup_mask_fg, hw):
        """Prototype alignment branch (reference :158-194)."""
        b, q, n, c = qry_fts.shape
        s = sup_fts.shape[1]
        H, W = sup_mask_fg.shape[-2:]
        h, w = hw

        pred_cls = jnp.argmax(pred, axis=-1)                 # [b,q,n]
        qry_fg = (pred_cls == 1).astype(jnp.float32)
        qry_bg = (pred_cls == 0).astype(jnp.float32)
        fg_proto = jnp.mean(masked_average_pooling(qry_fts, qry_fg), axis=1)
        bg_proto = jnp.mean(masked_average_pooling(qry_fts, qry_bg), axis=1)

        sup_pred = prototype_predictions(sup_fts, fg_proto, bg_proto,
                                         self.dist_scalar)   # [b,s,n,2]
        sup_logits = output_resize(sup_pred.reshape(b, s, h, w, 2), (H, W))

        # plain mean CE (reference uses F.cross_entropy without ignore);
        # cross_entropy_no_ignore's one-hot form avoids the TPU
        # scalar-unit gather a full-res take_along_axis lowers to
        labels = sup_mask_fg.astype(jnp.int32)               # [b,s,H,W]
        return cross_entropy_no_ignore(sup_logits, labels)
