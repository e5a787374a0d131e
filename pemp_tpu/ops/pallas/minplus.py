"""Pallas TPU kernel: min-plus "matmul" for the exact EDT.

Both phases of the two-phase exact Euclidean distance transform
(pemp_tpu/ops/edt.py, replacing the reference's per-step CPU scipy EDT,
reference core/losses.py:17-43) are tropical-semiring matmuls

    out[m, n] = min_k (a[m, k] + b[k, n])

with a/b holding squared coordinate offsets and squared source
distances. XLA lowers the broadcast-min chain at ~10x off roofline on
TPU regardless of reduce orientation (measured: ~3 ms per phase at
401^2 bs=4); this kernel keeps the [TM, K, TN] broadcast entirely in
VMEM per tile and runs it on the VPU in one pass (~0.2 ms per phase).

Exactness: inputs are integer-valued f32 (squared pixel distances
< 2^24), so add/min are lossless — the kernel must bit-match the jnp
ground truth (tests/test_minplus.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:       # pragma: no cover
    _HAS_PALLAS = False

from pemp_tpu.ops.pallas.mpm import pallas_available  # noqa: F401 (re-export)

_INF2 = 1.0e12      # > any real squared distance; padding K never wins
# Tile sweep on v5e (401-sized phases, r2): runtime is tile-insensitive
# (Mosaic fuses the broadcast into the reduce, ~2 ms/call real); widest
# lanes won by ~25%.
TM = 64             # rows per tile
TN = 512            # output cols per tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(a_ref, b_ref, o_ref):
    a = a_ref[...]                                   # [TM, K]
    b = b_ref[...]                                   # [K, TN]
    # [TM, K, TN] broadcast lives in VMEM/vregs only; reduce over the
    # middle (sublane) axis keeps TN on the lanes.
    o_ref[...] = jnp.min(a[:, :, None] + b[None, :, :], axis=1)


def minplus_matmul(a: jnp.ndarray, b: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """min_k (a[m,k] + b[k,n]) for f32 a [M,K], b [K,N] -> [M,N]."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    mp, kp, np_ = _round_up(m, TM), _round_up(k, 8), _round_up(n, TN)

    ap = jnp.full((mp, kp), _INF2, jnp.float32)
    ap = ap.at[:m, :k].set(a.astype(jnp.float32))    # K-pad: +INF never wins
    bp = jnp.zeros((kp, np_), jnp.float32)
    bp = bp.at[:k, :n].set(b.astype(jnp.float32))

    out = pl.pallas_call(
        _kernel,
        grid=(mp // TM, np_ // TN),
        in_specs=[
            pl.BlockSpec((TM, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        interpret=interpret,
    )(ap, bp)
    return out[:m, :n]


def edt2_pallas(feature: jnp.ndarray, interpret: bool = False,
                mesh=None) -> jnp.ndarray:
    """Squared exact EDT of a boolean [B, H, W] feature map via two
    min-plus matmuls (drop-in for the jnp phases in ops/edt.py).

    ``mesh``: a >1-device data mesh makes the kernel run under
    ``shard_map`` over the batch axis — each device transforms its local
    episodes' boundary maps (the EDT is per-image, so batch sharding is
    embarrassingly parallel). This is how a pallas_call composes with
    the GSPMD-jitted train step: bare custom calls have no partitioning
    rule (tests/test_minplus.py exercises the 8-device CPU mesh)."""
    # batches not divisible by the mesh (B=1 init traces, tiny eval
    # batches) run the plain kernel: replicated-but-correct under GSPMD
    if (mesh is not None and mesh.size > 1
            and feature.shape[0] % mesh.size == 0):
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        # check_vma=False: pallas_call's out_shape carries no varying-
        # mesh-axes annotation, and the body is per-shard pure anyway
        return jax.shard_map(
            lambda f: edt2_pallas(f, interpret=interpret),
            mesh=mesh, in_specs=P(axis), out_specs=P(axis),
            check_vma=False)(feature)

    b, h, w = feature.shape
    src2 = jnp.where(feature, 0.0, _INF2).astype(jnp.float32)

    ih = jnp.arange(h, dtype=jnp.float32)
    dh2 = (ih[:, None] - ih[None, :]) ** 2                     # [Hout,Hin]
    s = jnp.moveaxis(src2, 1, 0).reshape(h, b * w)             # [Hin, B*W]
    g2 = minplus_matmul(dh2, s, interpret=interpret)           # [Hout, B*W]
    g2 = jnp.moveaxis(g2.reshape(h, b, w), 0, 1)               # [B,H,W]

    iw = jnp.arange(w, dtype=jnp.float32)
    dw2 = (iw[:, None] - iw[None, :]) ** 2                     # [Win,Wout]
    edt2 = minplus_matmul(g2.reshape(b * h, w), dw2,
                          interpret=interpret)                 # [B*H, Wout]
    return edt2.reshape(b, h, w)
