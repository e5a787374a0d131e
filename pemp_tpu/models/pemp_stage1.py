"""PEMP stage 1: meta-prototype few-shot segmenter.

Behavioral counterpart of reference ``networks/pemp_stage1.py``:
- encoder: dilated VGG16, or 3-stage frozen-BN ResNet-50/101 + purifier
  (1x1 conv, DropBlock, 3x3 conv, DropBlock, ASPPV2 -> 512ch),
- meta-prototype module ``mpm``: learned centers ``ctr`` in R^{c x 2p}
  (U[0,1) init like ``torch.rand``, reference :105), soft assignment of
  support pixels, adaptive prototypes, max-over-p cosine predictions
  (reference :165-230),
- optional response map of the argmax prototype index (bg 0..p-1 /
  fg p..2p-1 offset by +p -> reference convention bg 0-2 / fg 3-5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


from pemp_tpu.models import backbones
from pemp_tpu.models.common import (
    RESNET_LAYERS, PurifierV2, downsample_masks, output_resize,
)
from pemp_tpu.models.layers import Dtype
from pemp_tpu.ops.prototypes import (
    masked_average_pooling, meta_prototype_assign, prototype_predictions,
)
from pemp_tpu.ops.resize import resize_nearest


@dataclass
class NetConfig:
    """Scope ``net`` (reference: networks/pemp_stage1.py:21-29 and
    pemp_stage2.py:14-19; the stage-2 keys live here so both stages share
    the scope like the reference ingredient does)."""
    dist_scalar: float = 20.0
    init_channels: int = 3
    out_channels: int = 512
    backbone: str = "resnet50"      # vgg16 | resnet50 | resnet101
    protos: int = 3
    drop_rate: float = 0.1
    block_size: int = 4
    # stage-2 extras
    backbone2: str = "resnet50"
    protos2: int = 3
    drop_rate2: float = 0.5
    cm: bool = True


def mpm_predict(sup_fts, qry_fts, sup_fg, sup_bg, ctr, protos, dist_scalar,
                ret_ind=False, use_pallas=False, mesh=None):
    """Meta-prototype module + prediction (reference :165-230).

    sup_fts [B,S,n,c], qry_fts [B,Q,n,c], masks [B,S,n]; ``ctr`` may be
    None (protos == 0 falls back to plain masked-average prototypes,
    reference :223-228).

    ``use_pallas=True`` runs the fused TPU kernels
    (pemp_tpu/ops/pallas/mpm.py, bit-matching the jnp path). The
    ``ret_ind=False`` path goes through the custom-VJP wrappers
    (ops/pallas/mpm_vjp.py) so the kernels also serve the training
    step under autodiff, shard_mapped over ``mesh`` when one is active;
    ``ret_ind=True`` (visualize) stays on the raw forward kernels
    (single-device only — under a mesh it falls back to jnp).
    """
    if ctr is not None:
        if use_pallas:
            if ret_ind and (mesh is None or mesh.size <= 1):
                from pemp_tpu.ops.pallas.mpm import (
                    meta_prototype_assign_pallas, prototype_match_pallas)
                fg_proto, bg_proto = meta_prototype_assign_pallas(
                    sup_fts, sup_fg, sup_bg, ctr, protos)
                return prototype_match_pallas(qry_fts, fg_proto, bg_proto,
                                              dist_scalar,
                                              return_indices=True)
            if not ret_ind:
                from pemp_tpu.ops.pallas.mpm_vjp import mpm_fused_chain
                return mpm_fused_chain(sup_fts, sup_fg, sup_bg, qry_fts,
                                       ctr, protos, dist_scalar, mesh=mesh)
        fg_proto, bg_proto = meta_prototype_assign(
            sup_fts, sup_fg, sup_bg, ctr, protos)
        return prototype_predictions(qry_fts, fg_proto, bg_proto,
                                     dist_scalar, return_indices=ret_ind)
    fg_proto = jnp.mean(masked_average_pooling(sup_fts, sup_fg), axis=1)
    bg_proto = jnp.mean(masked_average_pooling(sup_fts, sup_bg), axis=1)
    logits = prototype_predictions(qry_fts, fg_proto, bg_proto, dist_scalar)
    if ret_ind:
        return logits, jnp.zeros(logits.shape, jnp.int32)
    return logits


def mpm_predict_packed(fts, s, sup_fg, sup_bg, ctr, protos, dist_scalar,
                       ret_ind=False, use_pallas=False, mesh=None):
    """``mpm_predict`` on the PACKED features [B,S+Q,n,c] (the purifier
    output straight after its reshape). On the fused-kernel training/eval
    path the support/query split happens inside the kernels' index_maps
    (ops/pallas/mpm.py mpm_chain_packed_pallas) so the largest activation
    is staged to HBM exactly once; every other path splits here and
    delegates to ``mpm_predict``."""
    if (ctr is not None and use_pallas and not ret_ind):
        from pemp_tpu.ops.pallas.mpm_vjp import mpm_fused_chain_packed
        return mpm_fused_chain_packed(fts, sup_fg, sup_bg, ctr, protos,
                                      dist_scalar, mesh=mesh)
    return mpm_predict(fts[:, :s], fts[:, s:], sup_fg, sup_bg, ctr,
                       protos, dist_scalar, ret_ind=ret_ind,
                       use_pallas=use_pallas, mesh=mesh)


def response_map(logits, indices, protos):
    """argmax-prototype response map: bg index where bg wins, fg index + p
    where fg wins (reference :217-222 with p=3 giving bg 0-2 / fg 3-5)."""
    fg_wins = jnp.argmax(logits, axis=-1) == 1
    return jnp.where(fg_wins, indices[..., 1] + protos, indices[..., 0])


class PEMPStage1(nn.Module):
    backbone: str = "resnet50"
    out_channels: int = 512
    protos: int = 3
    drop_rate: float = 0.1
    block_size: int = 4
    dist_scalar: float = 20.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False    # fused TPU kernels (train via custom VJP)
    pallas_mesh: Optional[object] = None    # data mesh: kernels shard_map

    FROZEN = {"vgg16": [], "resnet50": [r"backbone/.*bn"],
              "resnet101": [r"backbone/.*bn"]}

    @nn.compact
    def __call__(self, sup_img, sup_mask, qry_img,
                 out_hw: Optional[Tuple[int, int]] = "input",
                 ret_ind: bool = False, train: bool = False):
        b, s, H, W, _ = sup_img.shape
        q = qry_img.shape[1]
        if out_hw == "input":
            out_hw = (H, W)

        imgs = jnp.concatenate([sup_img, qry_img], axis=1)
        imgs = imgs.reshape(b * (s + q), H, W, 3)
        if self.backbone == "vgg16":
            fts = backbones.VGG16(last_relu=False, dtype=self.dtype,
                                  name="backbone")(imgs, train)
        elif self.backbone in RESNET_LAYERS:
            fts = backbones.ResNet(RESNET_LAYERS[self.backbone],
                                   dtype=self.dtype,
                                   name="backbone")(imgs, train)
            fts = PurifierV2(self.out_channels, self.drop_rate,
                             self.block_size, dtype=self.dtype,
                             name="purifier")(fts, train)
        else:
            raise ValueError(
                f"Not supported backbone '{self.backbone}'. "
                "[vgg16, resnet50, resnet101]")

        # fts stays in model dtype (bf16 on TPU) through the reshape/split:
        # the prototype ops (ops/prototypes.py) and the Pallas kernels both
        # upcast to f32 at their own boundary (bf16->f32 is exact), and an
        # eager f32up here costs full-tensor HBM passes of the largest
        # activation in the model (trace: tools/profile_eval.py).
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
