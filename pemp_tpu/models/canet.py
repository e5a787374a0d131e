"""CaNet: dense comparison + iterative refinement with history masks.

Behavioral counterpart of reference ``networks/canet.py``:
- frozen 3-stage ResNet-50; features = concat(layer2, layer3) -> layer5
  (reference :163-171),
- support prototype (masked average at feature res) tiled over the query
  and concatenated -> layer55 (:177-181),
- residual refinement head conditioned on the previous prediction
  (``history_mask``) + ASPP (:187-209),
- returns 1/8-resolution logits when ``out_hw=None`` (reference ``out_shape
  =False`` path, :156); the entry layer resizes and writes the softmax back
  into the episode-keyed history store.

The reference mutates ``dataset.history_mask_list`` from the training loop
(a fork-safety hazard flagged in SURVEY.md section 5.2); this rebuild keeps
the history in an explicit host-side store keyed by (class, sample index)
— see pemp_tpu/data/history.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


from pemp_tpu.models import backbones
from pemp_tpu.models.common import RESNET_LAYERS, output_resize
from pemp_tpu.models.layers import (
    Conv, Dropout2d, Dtype, avg_pool_full,
)
from pemp_tpu.ops.prototypes import masked_average_pooling
from pemp_tpu.ops.resize import resize_nearest


@dataclass
class NetConfig:
    """Scope ``net`` (reference: networks/canet.py:16-22)."""
    init_channels: int = 3
    drop_rate: float = 0.5
    history: bool = True
    freeze_backbone: bool = True


def canet_normal_init():
    """Reference head init: normal(0, 0.01) (canet.py:211-214)."""
    return nn.initializers.normal(stddev=0.01)


class ConvReluDrop(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    padding: int = 0
    dilation: int = 1
    drop_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.features, self.kernel, padding=self.padding,
                 dilation=self.dilation, dtype=self.dtype,
                 kernel_init=canet_normal_init(), name="conv")(x)
        x = nn.relu(x)
        return Dropout2d(self.drop_rate, name="drop")(x, train)


class ResidualBlock(nn.Module):
    """relu -> conv3x3 -> relu -> conv3x3 (reference :103-120)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = Conv(256, (3, 3), padding=1, dtype=self.dtype,
                 kernel_init=canet_normal_init(), name="conv1")(y)
        y = nn.relu(y)
        return Conv(256, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=canet_normal_init(), name="conv2")(y)


class CaNet(nn.Module):
    drop_rate: float = 0.5
    use_history: bool = True
    dtype: Dtype = jnp.float32
    num_classes: int = 2

    # freeze_backbone=True freezes the whole trunk (reference :219-231)
    FROZEN = {True: [r"^backbone/"], False: [r"backbone/.*bn"]}

    @nn.compact
    def __call__(self, sup_img, sup_mask, qry_img, history_mask,
                 out_hw: Optional[Tuple[int, int]] = "input",
                 train: bool = False):
        """history_mask: [B, Q, h8, w8, 2] previous softmax predictions at
        1/8 resolution (zeros initially, reference pascal_voc.py:324)."""
        b, s, H, W, _ = sup_img.shape
        q = qry_img.shape[1]
        if out_hw == "input":
            out_hw = (H, W)

        imgs = jnp.concatenate([sup_img, qry_img], axis=1)
        imgs = imgs.reshape(b * (s + q), H, W, 3)
        f1, f2, f3 = backbones.ResNet(RESNET_LAYERS["resnet50"],
                                      ret_features=True, dtype=self.dtype,
                                      name="backbone")(imgs, train)
        del f1

        # no eager upcast: layer5 (dtype=self.dtype) would cast straight
        # back, so f32up here only materialized a [2B,h,w,1536] f32 copy
        # (bf16->f32->bf16 is an exact round trip)
        feat = jnp.concatenate([f2, f3], axis=-1)
        feat = ConvReluDrop(256, (3, 3), padding=2, dilation=2,
                            drop_rate=self.drop_rate, dtype=self.dtype,
                            name="layer5")(feat, train)
        h, w = feat.shape[1:3]
        c = feat.shape[-1]
        feat = feat.reshape(b, s + q, h, w, c)
        sup_fts = feat[:, :s].reshape(b, s, h * w, c)
        qry_fts = feat[:, s:].reshape(b * q, h, w, c)

        # support prototype from nearest-downsampled fg mask (ref :175-178)
        m = resize_nearest(sup_mask[..., :1].reshape(b * s, H, W, 1), (h, w))
        m = m.reshape(b, s, h * w)
        z = jnp.mean(masked_average_pooling(sup_fts, m), axis=1)   # [b,c]
        z = jnp.broadcast_to(z[:, None, None, None, :],
                             (b, q, h, w, c)).reshape(b * q, h, w, c)

        out = jnp.concatenate([qry_fts, z], axis=-1)
        out = ConvReluDrop(256, (3, 3), padding=2, dilation=2,
                           drop_rate=self.drop_rate, dtype=self.dtype,
                           name="layer55")(out, train)

        out = self._res_aspp(out, history_mask.reshape(b * q, h, w, 2), train)
        logits = Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      kernel_init=canet_normal_init(), name="layer7")(out)
        logits = logits.reshape(b, q, h, w, self.num_classes)
        return output_resize(logits, out_hw)

    def _res_aspp(self, out, history_mask, train):
        """Residual blocks + ASPP (reference :187-209)."""
        h, w = out.shape[1:3]
        inp = (jnp.concatenate([out, history_mask], axis=-1)
               if self.use_history else out)
        out = out + ResidualBlock(dtype=self.dtype, name="residual_1")(inp)
        out = out + ResidualBlock(dtype=self.dtype, name="residual_2")(out)
        out = out + ResidualBlock(dtype=self.dtype, name="residual_3")(out)

        g = ConvReluDrop(256, (1, 1), drop_rate=self.drop_rate,
                         dtype=self.dtype, name="aspp_0")(
            avg_pool_full(out), train)
        g = jnp.broadcast_to(g, (out.shape[0], h, w, 256))
        cat = jnp.concatenate([
            g,
            ConvReluDrop(256, (1, 1), drop_rate=self.drop_rate,
                         dtype=self.dtype, name="aspp_1")(out, train),
            ConvReluDrop(256, (3, 3), padding=6, dilation=6,
                         drop_rate=self.drop_rate, dtype=self.dtype,
                         name="aspp_2")(out, train),
            ConvReluDrop(256, (3, 3), padding=12, dilation=12,
                         drop_rate=self.drop_rate, dtype=self.dtype,
                         name="aspp_3")(out, train),
            ConvReluDrop(256, (3, 3), padding=18, dilation=18,
                         drop_rate=self.drop_rate, dtype=self.dtype,
                         name="aspp_4")(out, train),
        ], axis=-1)
        return ConvReluDrop(256, (1, 1), drop_rate=self.drop_rate,
                            dtype=self.dtype, name="layer6")(cat, train)
