"""PEMP stage 2: prior-enhanced refinement with communication modules.

Behavioral counterpart of reference ``networks/pemp_stage2.py``:
- 4-channel input = RGB + prior, where the prior is the GT fg mask for
  support images and the (frozen) stage-1 argmax prediction for queries
  (reference :130-138); the prior also feeds the CM pooling branch,
- encoder = ResNetCM / VGG16CM (episode-communicating) followed by a
  Dropout/ASPP purifier for ResNets (reference :57-73),
- the same meta-prototype module with its own centers (``protos2``).

The stage-1 -> stage-2 cascade itself lives in the entry layer: stage 1 is
applied with frozen params, its argmax becomes ``qry_prior``
(reference entry/pemp_stage2.py:73-84).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pemp_tpu.ops.dtypes import f32up

from pemp_tpu.models import backbones
from pemp_tpu.models.common import (
    RESNET_LAYERS, PurifierV1, downsample_masks, output_resize,
)
from pemp_tpu.models.layers import Dtype
from pemp_tpu.models.pemp_stage1 import mpm_predict_packed, response_map
from pemp_tpu.ops.resize import resize_nearest


class PEMPStage2(nn.Module):
    backbone: str = "resnet50"      # backbone2 in the config surface
    out_channels: int = 512
    protos: int = 3                 # protos2
    drop_rate: float = 0.5          # drop_rate2
    dist_scalar: float = 20.0
    spq: int = 2                    # shot + query images per episode
    dtype: Dtype = jnp.float32
    use_pallas: bool = False        # fused TPU kernels (train via custom VJP)
    pallas_mesh: Optional[object] = None    # data mesh: kernels shard_map

    FROZEN = {"vgg16": [], "resnet50": [r"backbone/.*bn"],
              "resnet101": [r"backbone/.*bn"]}

    @nn.compact
    def __call__(self, sup_img, sup_mask, qry_img, qry_prior,
                 out_hw: Optional[Tuple[int, int]] = "input",
                 ret_ind: bool = False, train: bool = False):
        """qry_prior: [B, Q, H, W] or [B, Q, H, W, 1] f32 stage-1 fg mask."""
        b, s, H, W, _ = sup_img.shape
        q = qry_img.shape[1]
        if out_hw == "input":
            out_hw = (H, W)
        if qry_prior.ndim == 4:
            qry_prior = qry_prior[..., None]

        imgs = jnp.concatenate([sup_img, qry_img], axis=1)
        imgs = imgs.reshape(b * (s + q), H, W, 3)
        sup_prior = sup_mask[..., :1]                       # [B,S,H,W,1] fg
        prior = jnp.concatenate([sup_prior, f32up(qry_prior)],
                                axis=1).reshape(b * (s + q), H, W, 1)
        inputs = jnp.concatenate([imgs, prior], axis=-1)    # [B(S+Q),H,W,4]

        if self.backbone == "vgg16":
            fts = backbones.VGG16CM(spq=self.spq, last_relu=False,
                                    dtype=self.dtype,
                                    name="backbone")((inputs, prior), train)
        elif self.backbone in RESNET_LAYERS:
            fts = backbones.ResNetCM(RESNET_LAYERS[self.backbone],
                                     spq=self.spq, dtype=self.dtype,
                                     name="backbone")((inputs, prior), train)
            fts = PurifierV1(self.out_channels, self.drop_rate,
                             dtype=self.dtype, name="purifier")(fts, train)
        else:
            raise ValueError(
                f"Not supported backbone '{self.backbone}'. "
                "[vgg16, resnet50, resnet101]")

        # model-dtype features through the split; the prototype ops and
        # Pallas kernels upcast at their own boundary (see pemp_stage1.py)
        h, w = fts.shape[1:3]
        c = fts.shape[-1]
        fts = fts.reshape(b, s + q, h * w, c)
        sup_fg, sup_bg = downsample_masks(sup_mask, (h, w))

        if self.protos > 0:
            ctr = self.param("ctr", nn.initializers.uniform(scale=1.0),
                             (c, self.protos * 2))
        else:
            ctr = None
        out = mpm_predict_packed(fts, s, sup_fg, sup_bg, ctr,
                                 self.protos, self.dist_scalar,
                                 ret_ind=ret_ind,
                                 use_pallas=self.use_pallas,
                                 mesh=self.pallas_mesh)

        if ret_ind:
            logits, indices = out
            logits = logits.reshape(b, q, h, w, 2)
            resp = response_map(logits, indices.reshape(b, q, h, w, 2),
                                self.protos)
            if out_hw is not None:
                resp = resize_nearest(
                    resp.reshape(b * q, h, w, 1).astype(jnp.float32), out_hw)
                resp = resp.reshape(b, q, *out_hw).astype(jnp.int32)
            return output_resize(logits, out_hw), resp
        logits = out.reshape(b, q, h, w, 2)
        return output_resize(logits, out_hw)
