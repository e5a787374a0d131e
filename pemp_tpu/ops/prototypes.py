"""Prototype extraction and dense cosine matching (jnp reference impls).

These are the episode-level hot ops of every model in the zoo:

- masked average pooling over support features
  (reference: networks/baseline.py:105-110),
- dense cosine similarity between query features and class prototypes
  (reference: networks/baseline.py:144-149 — torch ``F.cosine_similarity``
  semantics: ``x.y / max(|x|.|y|, eps)`` with ``eps = 1e-8``),
- the PEMP meta-prototype module: soft assignment of support pixels to
  learned global centers, masked by fg/bg, producing per-episode adaptive
  prototypes (reference: networks/pemp_stage1.py:201-215).

Layout is channels-last with flattened spatial ``[B, S, n, c]`` so every
contraction is an MXU-shaped matmul ``[n, c] x [c, k]``. A fused Pallas
kernel (pemp_tpu/ops/pallas) can replace the assignment chain; these jnp
versions are the ground truth it is tested against.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from pemp_tpu.ops.dtypes import f32up

# This environment's default matmul precision is bf16-level even on CPU;
# prototype/cosine math is parity-critical, so every contraction here pins
# full f32 precision explicitly.
_HI = lax.Precision.HIGHEST

COS_EPS = 1e-8      # torch F.cosine_similarity default
POOL_EPS = 1e-5     # reference masked-average denominators
ASSIGN_EPS = 1e-6   # reference meta-prototype denominator


def masked_average_pooling(fts: jnp.ndarray, mask: jnp.ndarray,
                           eps: float = POOL_EPS) -> jnp.ndarray:
    """Masked mean over the pixel axis.

    fts:  [..., n, c]
    mask: [..., n]
    returns [..., c]
    """
    fts = f32up(fts)
    mask = f32up(mask)
    num = jnp.einsum("...nc,...n->...c", fts, mask, precision=_HI)
    den = jnp.sum(mask, axis=-1)[..., None] + eps
    return num / den


def masked_average_pooling_adjoint(fts: jnp.ndarray, mask: jnp.ndarray,
                                   eps: float = POOL_EPS) -> jnp.ndarray:
    """``masked_average_pooling(resize_bilinear_align_corners(fts, HW),
    mask)`` WITHOUT materializing the upsampled features.

    The reference pools support features after upsampling them to mask
    resolution (networks/baseline.py:100-110, panet.py) — a [B,S,H,W,c]
    f32 tensor (~10 GB at 401²/c=512/B=32) that caps the batch size.
    Bilinear resize is linear, so the pooled numerator equals contracting
    the ORIGINAL features with the adjoint-projected mask
    ``R_h^T m R_w`` (exact up to f32 reassociation; the denominator uses
    the full-resolution mask sum like the reference).

    fts: [B, S, h, w, c] feature-resolution features
    mask: [B, S, H, W] full-resolution mask
    returns [B, S, c]
    """
    from pemp_tpu.ops.resize import _interp_matrix
    b, s, h, w, c = fts.shape
    big_h, big_w = mask.shape[-2:]
    rh = jnp.asarray(_interp_matrix(h, big_h))              # [H, h]
    rw = jnp.asarray(_interp_matrix(w, big_w))              # [W, w]
    m = f32up(mask)
    mdown = jnp.einsum("Hh,bsHW,Ww->bshw", rh, m, rw, precision=_HI)
    num = jnp.einsum("bshwc,bshw->bsc", f32up(fts), mdown,
                     precision=_HI)
    den = jnp.sum(m, axis=(-1, -2))[..., None] + eps
    return num / den


def _safe_norm(x: jnp.ndarray) -> jnp.ndarray:
    """L2 norm with a zero (not NaN) gradient at the zero vector —
    ``sqrt`` grad at 0 is inf and torch special-cases it to 0; the
    clamped sum keeps the forward value identical for any real vector
    (tiny << eps^2 of the cosine denominator clamp)."""
    sq = jnp.sum(x * x, axis=-1)
    return jnp.sqrt(jnp.maximum(sq, 1e-30))


def cosine_similarity(x: jnp.ndarray, y: jnp.ndarray,
                      eps: float = COS_EPS) -> jnp.ndarray:
    """Cosine similarity over the trailing channel axis with torch
    semantics (elementwise ``max`` with eps on the norm product).

    x: [..., n, c], y: [..., k, c] (broadcast-compatible leading dims)
    returns [..., n, k]
    """
    x = f32up(x)
    y = f32up(y)
    dot = jnp.einsum("...nc,...kc->...nk", x, y, precision=_HI)
    xn = _safe_norm(x)[..., :, None]
    yn = _safe_norm(y)[..., None, :]
    return dot / jnp.maximum(xn * yn, eps)


def prototype_predictions(qry_fts: jnp.ndarray,
                          fg_proto: jnp.ndarray,
                          bg_proto: jnp.ndarray,
                          dist_scalar: float = 20.0,
                          return_indices: bool = False):
    """Dense 2-class logits from per-class prototypes.

    qry_fts:  [B, Q, n, c]
    fg_proto / bg_proto: [B, c] (single prototype) or [B, p, c] (multi).
    Multi-prototype predictions take the max over p per class
    (reference: networks/pemp_stage1.py:213-215).

    Returns logits [B, Q, n, 2] (class order [bg, fg], matching the
    reference stacking at networks/baseline.py:148), and, if requested,
    the argmax prototype indices [B, Q, n, 2].
    """
    if fg_proto.ndim == 2:
        fg_proto = fg_proto[:, None, :]
        bg_proto = bg_proto[:, None, :]

    fg_sim = cosine_similarity(qry_fts, fg_proto[:, None]) * dist_scalar
    bg_sim = cosine_similarity(qry_fts, bg_proto[:, None]) * dist_scalar
    # [B, Q, n, p] each
    sims = jnp.stack([bg_sim, fg_sim], axis=3)          # [B, Q, n, 2, p]
    logits = jnp.max(sims, axis=-1)                     # [B, Q, n, 2]
    if return_indices:
        return logits, jnp.argmax(sims, axis=-1)        # [B, Q, n, 2]
    return logits


def meta_prototype_assign(sup_fts: jnp.ndarray,
                          sup_fg: jnp.ndarray,
                          sup_bg: jnp.ndarray,
                          ctr: jnp.ndarray,
                          protos: int,
                          eps: float = ASSIGN_EPS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Meta-prototype soft assignment -> per-episode adaptive prototypes.

    sup_fts: [B, S, n, c] support features
    sup_fg / sup_bg: [B, S, n] fg / bg masks at feature resolution
    ctr: [c, 2p] learned global centers; columns [0, p) are foreground,
         [p, 2p) background (reference layout, networks/pemp_stage1.py:202).

    Steps (reference :205-211):
    D = -||f - ctr||^2, softmax over the p centers *within each class*,
    masked by the class mask, then assignment-weighted feature averages,
    finally a mean over shots.

    Returns (fg_proto, bg_proto), each [B, p, c].
    """
    f = f32up(sup_fts)
    ctr = f32up(ctr)
    b, s, n, c = f.shape
    k2 = 2 * protos

    # -||f - ctr||^2 expanded so the bulk is one MXU matmul [n,c]x[c,2p].
    f_sq = jnp.sum(f * f, axis=-1, keepdims=True)               # [B,S,n,1]
    c_sq = jnp.sum(ctr * ctr, axis=0)                           # [2p]
    f_dot_c = jnp.einsum("bsnc,ck->bsnk", f, ctr, precision=_HI)               # [B,S,n,2p]
    dist = -(f_sq - 2.0 * f_dot_c + c_sq)                       # [B,S,n,2p]

    dist = dist.reshape(b, s, n, 2, protos)
    assign = jnp.exp(dist - jnp.max(dist, axis=-1, keepdims=True))
    assign = assign / jnp.sum(assign, axis=-1, keepdims=True)   # softmax over p
    mask = f32up(jnp.stack([sup_fg, sup_bg], axis=-1))  # [B,S,n,2]
    assign = assign * mask[..., None]                           # [B,S,n,2,p]
    assign = assign.reshape(b, s, n, k2)

    num = jnp.einsum("bsnc,bsnk->bskc", f, assign, precision=_HI)              # [B,S,2p,c]
    den = jnp.sum(assign, axis=2)[..., None] + eps              # [B,S,2p,1]
    proto = jnp.mean(num / den, axis=1)                         # [B,2p,c]
    return proto[:, :protos], proto[:, protos:]
