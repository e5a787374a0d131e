"""PFENet: training-free prior + feature enrichment pyramid.

Behavioral counterpart of reference ``networks/pfenet.py`` +
``networks/pfe_resent.py``:
- deep-base ResNet-50 v2 trunk (3x 3x3-conv stem, torchvision-style
  bottlenecks with stride on conv2; layer3 dilation 2 / layer4 dilation 4,
  strides 1 — reference pfenet.py:64-77),
- the trunk runs gradient-free even in train mode (reference :169-174,
  :186-194): gradients are stopped and its params are masked out of the
  optimizer,
- training-free prior: max-over-support-pixels cosine correlation between
  masked support layer-4 and query layer-4 features, min-max normalized
  (reference :201-231),
- feature enrichment pyramid over bins (60, 30, 15, 8) with inter-scale
  alpha convs and per-scale auxiliary heads (reference :242-265); the aux
  CE (ignore 255) is averaged over scales at train time (reference
  :276-284, computed in pemp_tpu/core/losses.py:pfenet_aux_loss).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from pemp_tpu.ops.dtypes import f32up

from pemp_tpu.models.layers import (
    BatchNorm, Conv, Dropout2d, Dtype, max_pool_torch,
)
from pemp_tpu.ops.prototypes import masked_average_pooling
from pemp_tpu.ops.resize import resize_bilinear_align_corners

_HI = lax.Precision.HIGHEST


@dataclass
class NetConfig:
    """PFENet has no reference net ingredient; kept for CLI uniformity."""
    init_channels: int = 3
    backbone: str = "resnet50v2"


class BottleNeckV2(nn.Module):
    """torchvision-style bottleneck: stride/dilation on conv2
    (reference pfe_resent.py Bottleneck)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dilation
        y = Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                 name="conv1")(x)
        y = nn.relu(BatchNorm(dtype=self.dtype, name="bn1")(y, train))
        y = Conv(self.planes, (3, 3), stride=self.stride, padding=d,
                 dilation=d, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(BatchNorm(dtype=self.dtype, name="bn2")(y, train))
        y = Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                 name="conv3")(y)
        y = BatchNorm(dtype=self.dtype, name="bn3")(y, train)

        residual = x
        if self.use_downsample:
            residual = Conv(self.planes * 4, (1, 1), stride=self.stride,
                            use_bias=False, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = BatchNorm(dtype=self.dtype,
                                 name="downsample_bn")(residual, train)
        return nn.relu(y + residual)


_V2_STAGES = [
    # (planes, blocks, stride, dilation): PFENet surgery makes layer3/4
    # stride 1 with dilation 2/4 (reference pfenet.py:68-77)
    (64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 1, 2), (512, 3, 1, 4),
]


class ResNet50V2Trunk(nn.Module):
    """Deep-base ResNet-50 v2 returning (l1, l2, l3, l4) features.
    ``setup``-style so PFENet can re-run ``layer4`` alone on masked
    support features with shared weights (reference pfenet.py:193)."""
    dtype: Dtype = jnp.float32

    def setup(self):
        self.stem_convs = [
            Conv(c, (3, 3), stride=s, padding=1, use_bias=False,
                 dtype=self.dtype)
            for c, s in [(64, 2), (64, 1), (128, 1)]]
        self.stem_bns = [BatchNorm(dtype=self.dtype) for _ in range(3)]

        stages = []
        inplanes = 128
        for planes, blocks, stride, dil in _V2_STAGES:
            stage = []
            for bi in range(blocks):
                use_ds = bi == 0 and (stride != 1 or inplanes != planes * 4
                                      or dil in (2, 4))
                stage.append(BottleNeckV2(
                    planes, stride if bi == 0 else 1, dil,
                    use_downsample=use_ds, dtype=self.dtype))
                inplanes = planes * 4
            stages.append(stage)
        self.layer1, self.layer2, self.layer3, self.layer4 = stages

    def __call__(self, x, train: bool, stages: int = 4):
        x = x.astype(self.dtype)
        for conv, bn in zip(self.stem_convs, self.stem_bns):
            x = nn.relu(bn(conv(x), train))
        x = max_pool_torch(x, 3, 2, 1)

        feats = []
        for stage in (self.layer1, self.layer2, self.layer3,
                      self.layer4)[:stages]:
            for block in stage:
                x = block(x, train)
            feats.append(x)
        return feats

    def run_layer4(self, x, train: bool):
        for block in self.layer4:
            x = block(x.astype(self.dtype), train)
        return x


def adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Exact torch AdaptiveAvgPool2d on NHWC via integral images.

    Window boundaries: rows [floor(i*H/out), ceil((i+1)*H/out))."""
    n, h, w, c = x.shape
    if (h, w) == (out_size, out_size):
        return x

    def bounds(size):
        lo = [(i * size) // out_size for i in range(out_size)]
        hi = [-(-((i + 1) * size) // out_size) for i in range(out_size)]
        return lo, hi

    ys = jnp.cumsum(f32up(x), axis=1)
    ys = jnp.concatenate([jnp.zeros((n, 1, w, c), jnp.float32), ys], axis=1)
    lo, hi = bounds(h)
    rows = jnp.stack([(ys[:, b] - ys[:, a]) / (b - a)
                      for a, b in zip(lo, hi)], axis=1)     # [n,out,w,c]
    xs = jnp.cumsum(rows, axis=2)
    xs = jnp.concatenate(
        [jnp.zeros((n, out_size, 1, c), jnp.float32), xs], axis=2)
    lo, hi = bounds(w)
    return jnp.stack([(xs[:, :, b] - xs[:, :, a]) / (b - a)
                      for a, b in zip(lo, hi)], axis=2)     # [n,out,out,c]


def weighted_gap(feat: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked global average pooling (reference Weighted_GAP :15-20):
    sum(x*m) / (sum(m) + 0.0005). feat [N,h,w,c], mask [N,h,w,1]."""
    n, h, w, c = feat.shape
    return masked_average_pooling(
        feat.reshape(n, h * w, c), mask.reshape(n, h * w), eps=0.0005)


class ConvReluDropHead(nn.Module):
    """conv3x3 -> relu -> dropout(0.1) -> conv1x1 to classes (the ``cls``
    and ``inner_cls`` heads, reference :82-87, :124-129)."""
    classes: int = 2
    drop_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(256, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                 name="conv")(x)
        x = nn.relu(x)
        x = Dropout2d(self.drop_rate, name="drop")(x, train)
        return Conv(self.classes, (1, 1), dtype=self.dtype, name="cls")(x)


class PFENet(nn.Module):
    shot: int = 1
    ppm_scales: Tuple[int, ...] = (60, 30, 15, 8)
    # (cls/inner_cls head rate, down_query/down_supp rate); zeroed by the
    # train-parity tests whose torch mirrors carry Identity in these slots
    drop_rates: Tuple[float, float] = (0.1, 0.5)
    dtype: Dtype = jnp.float32

    # the whole trunk is gradient-free (reference :169-174)
    FROZEN = {"resnet50v2": [r"^backbone/"]}

    @nn.compact
    def __call__(self, sup_img, sup_mask, qry_img,
                 out_hw: Optional[Tuple[int, int]] = "input",
                 train: bool = False):
        """Returns (out, aux_outs): main logits [B,Q,out_h,out_w,2] and the
        per-scale auxiliary logits tuple (same spatial size)."""
        b, s, H, W, _ = sup_img.shape
        q = qry_img.shape[1]
        assert q == 1, "PFENet protocol uses a single query image"
        assert (H - 1) % 8 == 0 and (W - 1) % 8 == 0
        if out_hw == "input":
            out_hw = (H, W)

        trunk = ResNet50V2Trunk(dtype=self.dtype, name="backbone")

        # --- query features (gradient-free trunk) ---
        x = qry_img.reshape(b, H, W, 3)
        q1, q2, q3, q4 = [lax.stop_gradient(f32up(f))
                          for f in trunk(x, train)]
        query_feat = jnp.concatenate([q3, q2], axis=-1)
        query_feat = self._down(query_feat, "down_query", train)
        h, w = query_feat.shape[1:3]

        # --- per-shot support features + priors ---
        h4 = q4.shape[1]
        supp_feats, corr_masks = [], []
        for i in range(self.shot):
            mask = f32up(sup_mask[:, i, :, :, 0] == 1.0)[..., None]
            s_out = trunk(sup_img[:, i], train, stages=3)
            s2, s3 = [lax.stop_gradient(f32up(f))
                      for f in (s_out[1], s_out[2])]
            mask_f = resize_bilinear_align_corners(mask, s3.shape[1:3])
            # layer4 on the masked layer3 features, shared weights (ref :193)
            s4 = lax.stop_gradient(
                f32up(trunk.run_layer4(s3 * mask_f, train)))

            feat = jnp.concatenate([s3, s2], axis=-1)
            feat = self._down(feat, "down_supp", train)
            supp_feats.append(weighted_gap(feat, mask_f)[:, None, None, :])

            corr_masks.append(self._prior(
                q4, s4, resize_bilinear_align_corners(mask, (h4, h4))))

        corr = jnp.mean(jnp.stack(corr_masks, axis=1), axis=1)  # [B,h4,h4,1]
        corr = resize_bilinear_align_corners(corr, (h, w))
        supp_feat = sum(supp_feats) / len(supp_feats)            # [B,1,1,256]

        # --- feature enrichment pyramid (reference :242-265) ---
        pyramid_feats, aux_outs = [], []
        for idx, bin_ in enumerate(self.ppm_scales):
            qf_bin = adaptive_avg_pool(query_feat, bin_)
            sf_bin = jnp.broadcast_to(supp_feat, (b, bin_, bin_, 256))
            cm_bin = resize_bilinear_align_corners(corr, (bin_, bin_))
            merge = jnp.concatenate([qf_bin, sf_bin, cm_bin], axis=-1)
            merge = nn.relu(Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                                 name=f"init_merge_{idx}")(merge))

            if idx >= 1:
                pre = resize_bilinear_align_corners(
                    pyramid_feats[idx - 1], (bin_, bin_))
                rec = jnp.concatenate([merge, pre], axis=-1)
                alpha = nn.relu(Conv(256, (1, 1), use_bias=False,
                                     dtype=self.dtype,
                                     name=f"alpha_conv_{idx - 1}")(rec))
                merge = alpha + merge

            beta = merge
            for bj in range(2):
                beta = nn.relu(Conv(256, (3, 3), padding=1, use_bias=False,
                                    dtype=self.dtype,
                                    name=f"beta_conv_{idx}_{bj}")(beta))
            merge = beta + merge
            aux_outs.append(ConvReluDropHead(
                drop_rate=self.drop_rates[0],
                dtype=self.dtype, name=f"inner_cls_{idx}")(merge, train))
            pyramid_feats.append(
                resize_bilinear_align_corners(merge, (h, w)))

        feat = jnp.concatenate(pyramid_feats, axis=-1)
        feat = nn.relu(Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                            name="res1")(feat))
        res2 = feat
        for bj in range(2):
            res2 = nn.relu(Conv(256, (3, 3), padding=1, use_bias=False,
                                dtype=self.dtype, name=f"res2_{bj}")(res2))
        feat = res2 + feat
        out = ConvReluDropHead(drop_rate=self.drop_rates[0],
                               dtype=self.dtype, name="cls")(feat, train)

        def finish(o):
            o = o.reshape(b, 1, *o.shape[1:])
            if out_hw is None:
                return o
            o = resize_bilinear_align_corners(o[:, 0], out_hw)
            return o.reshape(b, 1, *out_hw, 2)

        return finish(out), tuple(finish(a) for a in aux_outs)

    def _down(self, feat, name, train):
        """1x1 conv 1536->256 + relu + dropout(0.5) (reference :89-98)."""
        feat = Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"{name}_conv")(feat)
        feat = nn.relu(feat)
        return Dropout2d(self.drop_rates[1],
                         name=f"{name}_drop")(feat, train)

    def _prior(self, q4, s4_masked, mask4):
        """Training-free prior (reference :201-231): cosine correlation of
        masked support layer-4 vs query layer-4, max over support pixels,
        min-max normalized."""
        eps = 1e-7
        bsz, hh, ww, ch = q4.shape
        n = hh * ww
        qf = q4.reshape(bsz, n, ch)
        sf = (s4_masked * mask4).reshape(bsz, n, ch)
        qn = jnp.linalg.norm(qf, axis=-1)[:, None, :]        # [B,1,nq]
        sn = jnp.linalg.norm(sf, axis=-1)[:, :, None]        # [B,ns,1]
        sim = jnp.einsum("bsc,bqc->bsq", sf, qf, precision=_HI)
        sim = sim / (sn * qn + eps)                          # note: + eps,
        # not max(., eps) — reference :221 adds eps to the norm product
        sim = jnp.max(sim, axis=1)                           # [B, nq]
        mn = jnp.min(sim, axis=1, keepdims=True)
        mx = jnp.max(sim, axis=1, keepdims=True)
        sim = (sim - mn) / (mx - mn + eps)
        return sim.reshape(bsz, hh, ww, 1)
