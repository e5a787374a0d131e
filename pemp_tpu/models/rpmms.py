"""RPMMs: Residual Prototype Mixture Models.

Behavioral counterpart of reference ``networks/rpmms.py``:
- PMMs (:28-141): EM (10 iterations, no gradients) clusters masked support
  features into k prototypes with a vMF-like kernel (kappa=20); query
  probability maps come from a softmax over query-feature / prototype
  inner products. The reference instantiates a *fresh PMMs with random mu
  per forward* (:234, :42) — here the randomness is an explicit
  ``self.make_rng('pmm')`` key, so both train and eval steps must provide
  a ``pmm`` rng stream.
- RPMMs (:144-287): a residual 3-scale pyramid over k in {1, 3, 6} with a
  CaNet-style refinement head; stage t's softmax feeds stage t+1 as a
  pseudo mask. Returns (out_k1, out_k3, out_k6) feature-res logits; the
  3-term CE loss lives in pemp_tpu/core/losses.py (rpmms_loss).

Support and query are encoded in SEPARATE backbone calls, support first
(reference :222-225), so train-mode BN batch statistics are computed per
group exactly like the reference — unlike the rest of the zoo, which
concatenates S+Q into one encoder call.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from pemp_tpu.ops.dtypes import f32up

from pemp_tpu.models import backbones
from pemp_tpu.models.common import RESNET_LAYERS, output_resize
from pemp_tpu.models.layers import ASPP, BatchNorm, Conv, Dropout2d, Dtype
from pemp_tpu.models.canet import ResidualBlock
from pemp_tpu.ops.resize import resize_bilinear_align_corners

_HI = lax.Precision.HIGHEST


@dataclass
class NetConfig:
    """Scope ``net`` (reference: networks/rpmms.py:18-25)."""
    dist_scalar: float = 20.0
    init_channels: int = 3
    out_channels: int = 512
    backbone: str = "resnet50"
    protos: int = 3
    drop_rate: float = 0.5


def _l2norm(x, axis):
    return x / (1e-6 + jnp.linalg.norm(x, axis=axis, keepdims=True))


def pmm_mu_init(rng, c, k):
    """Random PMMs mu init: normal(0, sqrt(2/k)) l2-normalized over
    channels (reference :41-44), shared across the batch. One init per
    PMMs instance — fg and bg EM both start from it (reference :73,
    :108-116: ``self.mu`` is reused by both ``get_prototype`` calls)."""
    mu0 = jax.random.normal(rng, (1, c, k)) * math.sqrt(2.0 / k)
    return _l2norm(mu0, axis=1)                              # [1, c, k]


def pmm_em(rng, x, k, stage_num=10, kappa=20.0, mu0=None):
    """EM prototype estimation on features ``x`` [B, n, c] -> mu [B, k, c].

    ``mu0`` [1, c, k] is the init (see ``pmm_mu_init``); ``rng`` is used
    only when ``mu0`` is None.
    """
    b, n, c = x.shape
    if mu0 is None:
        mu0 = pmm_mu_init(rng, c, k)
    mu = jnp.broadcast_to(mu0, (b, c, k))

    x = lax.stop_gradient(f32up(x))

    def body(_, mu):
        z = kappa * jnp.einsum("bnc,bck->bnk", x, mu, precision=_HI)
        z = jax.nn.softmax(z, axis=2)                        # E step
        z = z / (1e-6 + jnp.sum(z, axis=1, keepdims=True))
        mu = jnp.einsum("bnc,bnk->bck", x, z, precision=_HI)  # M step
        return _l2norm(mu, axis=1)

    mu = lax.fori_loop(0, stage_num, body, mu)
    return jnp.swapaxes(mu, 1, 2)                            # [B, k, c]


def pmm_prob_map(query_feature, mu_f, mu_b):
    """Query probability map from fg/bg prototype mixtures
    (reference discriminative_model :119-141). All no-grad.

    query_feature: [B, h, w, c]; mu_f / mu_b: [B, k, c].
    Returns Prob_map [B, h, w, 2] (order [bg, fg])."""
    b, h, w, c = query_feature.shape
    k = mu_f.shape[1]
    mu = jnp.concatenate([mu_f, mu_b], axis=1)               # [B, 2k, c]
    x = lax.stop_gradient(query_feature.reshape(b, h * w, c))
    z = jnp.einsum("bnc,bkc->bnk", x, lax.stop_gradient(mu), precision=_HI)
    p = jax.nn.softmax(z, axis=2)                            # [B, n, 2k]
    p_f = jnp.sum(p[..., :k], axis=-1)
    p_b = jnp.sum(p[..., k:], axis=-1)
    return jnp.stack([p_b, p_f], axis=-1).reshape(b, h, w, 2)


class RPMMs(nn.Module):
    drop_rate: float = 0.5
    dtype: Dtype = jnp.float32
    num_pro_list: Tuple[int, ...] = (1, 3, 6)

    FROZEN = {"resnet50": [r"backbone/.*bn"]}

    @nn.compact
    def __call__(self, sup_img, sup_mask, qry_img,
                 out_hw: Optional[Tuple[int, int]] = None,
                 train: bool = False, mu_init=None):
        """``mu_init``: optional per-scale mu inits ([1, c, k] each,
        parity tests); defaults to fresh ``pmm`` rng draws per scale like
        the reference's fresh ``PMMs`` instance per forward (:234)."""
        b, s, H, W, _ = sup_img.shape
        q = qry_img.shape[1]
        assert q == 1, "RPMMs protocol uses a single query image"

        backbone = backbones.ResNet(RESNET_LAYERS["resnet50"],
                                    ret_features=True, dtype=self.dtype,
                                    name="backbone")
        layer5_conv = Conv(256, (3, 3), padding=2, dilation=2,
                           dtype=self.dtype, name="layer5_conv")
        layer5_bn = BatchNorm(dtype=self.dtype, name="layer5_bn")

        def encode(imgs):
            # extract_feature_res (reference :256-263): concat(f2, f3) ->
            # layer5 conv3x3 dil2 + BN + relu
            _, f2, f3 = backbone(imgs, train)
            f = jnp.concatenate([f2, f3], axis=-1)
            f = layer5_bn(layer5_conv(f), train)
            return f32up(nn.relu(f))

        # support and query encoded in SEPARATE calls, support first
        # (reference :222-225) — train-mode BN batch statistics are
        # computed per group, and running stats update in that order
        sup_feat = encode(sup_img.reshape(b * s, H, W, 3))
        qry_feat = encode(qry_img.reshape(b * q, H, W, 3))

        h, w = qry_feat.shape[1:3]
        c = qry_feat.shape[-1]
        # masked support features for EM (the reference is single-shot;
        # S>1 folds shots into the pixel axis)
        sup_feat = sup_feat.reshape(b, s * h * w, c)
        qry_feat = qry_feat.reshape(b, h, w, c)

        # masks bilinearly resized (align_corners) to feature res (ref :102)
        m = resize_bilinear_align_corners(
            sup_mask[..., :1].reshape(b * s, H, W, 1), (h, w))
        m = m.reshape(b, s * h * w, 1)

        # Head modules are shared across all pyramid stages and prototype
        # branches (the reference reuses the same layers per forward).
        layer55_conv = Conv(256, (3, 3), padding=2, dilation=2,
                            dtype=self.dtype, name="layer55_conv")
        layer55_drop = Dropout2d(self.drop_rate, name="layer55_drop")
        layer56_conv = Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="layer56_conv")
        layer56_drop = Dropout2d(self.drop_rate, name="layer56_drop")
        residule1 = ResidualBlock(dtype=self.dtype, name="residule1")
        residule2 = ResidualBlock(dtype=self.dtype, name="residule2")
        residule3 = ResidualBlock(dtype=self.dtype, name="residule3")
        layer6 = ASPP(256, 256, 512, self.drop_rate, tail=False,
                      dtype=self.dtype, name="layer6")
        layer7_conv = Conv(256, (1, 1), dtype=self.dtype, name="layer7_conv")
        layer7_drop = Dropout2d(self.drop_rate, name="layer7_drop")
        layer9 = Conv(2, (1, 1), dtype=self.dtype, name="layer9")

        pseudo = jnp.zeros((b, h, w, 2), jnp.float32)
        outs = []
        for idx, k in enumerate(self.num_pro_list):
            # one mu init per scale, SHARED by the fg and bg EM (the
            # reference PMMs instance reuses self.mu for both)
            mu0 = mu_init[idx] if mu_init is not None else \
                pmm_mu_init(self.make_rng("pmm"), c, k)
            mu_f = pmm_em(None, sup_feat * m, k, mu0=mu0)
            mu_b = pmm_em(None, sup_feat * (1.0 - m), k, mu0=mu0)
            prob_map = pmm_prob_map(qry_feat, mu_f, mu_b)

            # sum over k of layer55(concat(query, tile(mu_f_k)))  (ref :237-244)
            acc = None
            for i in range(k):
                vec = jnp.broadcast_to(mu_f[:, i][:, None, None, :],
                                       (b, h, w, c))
                x = layer55_drop(nn.relu(layer55_conv(
                    jnp.concatenate([qry_feat, vec], axis=-1))), train)
                acc = x if acc is None else acc + x

            x = jnp.concatenate([acc, prob_map], axis=-1)
            x = layer56_drop(nn.relu(layer56_conv(x)), train)

            # residual head + ASPP + classifier (reference :271-287)
            x = x + residule1(jnp.concatenate([x, pseudo], axis=-1))
            x = x + residule2(x)
            x = x + residule3(x)
            x = layer6(x, train)
            x = layer7_drop(nn.relu(layer7_conv(x)), train)
            out = layer9(x)

            pseudo = jax.nn.softmax(out, axis=-1)
            outs.append(out.reshape(b, q, h, w, 2))

        if out_hw is not None:
            outs = tuple(output_resize(o, out_hw) for o in outs)
        return tuple(outs)
