"""Pallas TPU kernels for the PEMP prototype hot path.

Two fused kernels replace the jnp chains in pemp_tpu/ops/prototypes.py
(the ground-truth implementations they are tested against):

1. ``meta_prototype_assign_pallas`` — the meta-prototype module
   (reference networks/pemp_stage1.py:205-211): squared-distance logits
   to the learned centers, per-class softmax over p, fg/bg masking, and
   the assignment-weighted feature reduction, all in one VMEM-resident
   pass per pixel tile. The [n, 2p] assignment tensor never touches HBM
   (the XLA version materializes [B,S,n,2,p] twice).

2. ``prototype_match_pallas`` — dense cosine matching + max-over-p
   (reference :213-215 / baseline.py:144-149): query/prototype norms,
   the [n, 2p] similarity matmul, per-class max and first-occurrence
   argmax fused.

TPU layout rules respected throughout:
- the [n, 2p] lane axis is never reshaped into [n, 2, p] (Mosaic cannot
  re-layout lanes); per-class reductions use fg/bg column indicators,
- the pixel axis is tiled (grid axis 1) so each block stays ~2 MB in
  VMEM; the assignment kernel accumulates its [2p, c] partials across
  pixel tiles into a revisited output block,
- padded prototype columns are masked with -inf before softmax/max;
  accumulation is f32 (MXU ``preferred_element_type``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:       # pragma: no cover
    _HAS_PALLAS = False

NEG = -1e30
ROW_TILE = 1024         # pixel rows per block (~2 MB f32 at c=512)


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pallas_enabled(cfg) -> bool:
    """THE config-level gate for every fused kernel (models and the EDT
    loss). A bare pallas_call has no GSPMD partitioning rule, so under
    a >1-device mesh every kernel call site must shard_map over the
    batch axis — the runtime passes the live mesh alongside this flag
    (models: ``pallas_mesh``; EDT: ``mesh``) and the kernels wrap
    themselves."""
    tpu = getattr(cfg, "tpu", None)
    return bool(tpu is not None and tpu.use_pallas and pallas_available())


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _wire_dtype(x):
    """HBM wire dtype for the big feature inputs: bf16/f16 stay narrow —
    the kernels upcast to f32 on the VMEM load (exact conversion, so the
    result is bit-identical to padding an f32 copy) and the padded HBM
    staging buffer moves half the bytes (trace: tools/profile_eval.py
    found the f32 staging copies cost ~10% of the eval step at B=256).
    Anything wider (f32, and f64 from x64 test runs) stages as f32,
    which is what the kernels have always computed at."""
    return x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32


def _col_padmask(protos: int, p_pad: int):
    """-inf additive mask for the padded prototype columns of the
    class-major [fg x p_pad, bg x p_pad] lane layout (THE layout contract
    shared by every kernel here: real fg cols [0, protos), real bg cols
    [p_pad, p_pad + protos), everything else padding)."""
    padmask = np.zeros((1, 2 * p_pad), np.float32)
    padmask[0, protos:p_pad] = NEG
    padmask[0, p_pad + protos:] = NEG
    return jnp.asarray(padmask)


def _pad_ctr(ctr, protos: int, p_pad: int):
    """Learned centers [c, 2*protos] -> class-major padded [c, 2*p_pad]
    plus the matching column padmask."""
    ctr_pad = jnp.zeros((ctr.shape[0], 2 * p_pad), jnp.float32)
    ctr_pad = ctr_pad.at[:, :protos].set(ctr[:, :protos])
    ctr_pad = ctr_pad.at[:, p_pad:p_pad + protos].set(ctr[:, protos:])
    return ctr_pad, _col_padmask(protos, p_pad)


def _pack_protos(fg_proto, bg_proto, protos: int, p_pad: int, q: int):
    """(fg, bg) [B,p,c] -> class-major padded [B*q, 2*p_pad, c] for the
    match kernel. Padded prototype rows are 0 (cosine denominator clamps
    at eps) and are -inf-masked by the column padmask anyway."""
    b, _, c = fg_proto.shape
    pk = jnp.zeros((b, 2 * p_pad, c), jnp.float32)
    pk = pk.at[:, :protos].set(fg_proto.astype(jnp.float32))
    pk = pk.at[:, p_pad:p_pad + protos].set(bg_proto.astype(jnp.float32))
    if q != 1:
        pk = jnp.repeat(pk, q, axis=0)
    return pk


# ---------------------------------------------------------------------------
# kernel 1: meta-prototype soft assignment (accumulating over pixel tiles)
# ---------------------------------------------------------------------------

def _assign_kernel(fts_ref, mask_ref, ctr_ref, padmask_ref,
                   num_ref, den_ref, *, protos_pad: int,
                   n_rows: int = 0):
    j = pl.program_id(1)
    f = fts_ref[0].astype(jnp.float32)                   # [tn, c]
    tn = f.shape[0]
    k2 = 2 * protos_pad
    if n_rows:
        # UNPADDED input (packed chain): the grid is cdiv(n, tn), so the
        # last block reads past n — whatever bytes sit in the padded
        # VMEM buffer. Zero those rows on BOTH operands (select, not
        # multiply: 0*NaN would poison the row-contraction below), so
        # out-of-bounds rows contribute exactly nothing — bit-identical
        # to the old zero-padded staging buffer without its HBM pass.
        row = jax.lax.broadcasted_iota(jnp.int32, (tn, 1), 0) + j * tn
        valid = row < n_rows
        f = jnp.where(valid, f, 0.0)
        # packed chain stores the mask [.., 2, n] — n on the LANE dim.
        # A [.., n, 2] f32 HBM tensor tiles its trailing 2 up to 128
        # lanes (64x physical blowup: the r4 trace billed ~2.4 ms of
        # pure mask staging to it); the [2, n] orientation is compact
        # and the (2, tn) block transposes in-VMEM for pennies.
        m = jnp.transpose(mask_ref[0].astype(jnp.float32))   # [tn, 2]
        m = jnp.where(valid, m, 0.0)

    ctr = ctr_ref[:].astype(jnp.float32)                 # [c, 2p_pad]
    c_sq = jnp.sum(ctr * ctr, axis=0, keepdims=True)     # [1, 2p_pad]
    f_sq = jnp.sum(f * f, axis=1, keepdims=True)         # [tn, 1]
    fc = jnp.dot(f, ctr, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    dist = -(f_sq - 2.0 * fc + c_sq) + padmask_ref[:]    # [tn, 2p_pad]

    col = jax.lax.broadcasted_iota(jnp.int32, (tn, k2), 1)
    is_fg = (col < protos_pad).astype(jnp.float32)

    def class_softmax(ind):
        # exclusion must happen INSIDE the exponent: exp(dist_other - mx)
        # overflows to inf when the other class's distances exceed this
        # class's max by ~88 (f32), and inf * 0 = NaN.
        d = dist + (1.0 - ind) * NEG
        mx = jnp.max(d, axis=1, keepdims=True)
        e = jnp.exp(d - mx) * ind
        return e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)

    if not n_rows:
        m = mask_ref[0].astype(jnp.float32)              # [tn, 2] fg/bg
    a2 = (class_softmax(is_fg) * m[:, 0:1]
          + class_softmax(1.0 - is_fg) * m[:, 1:2])      # [tn, 2p_pad]

    num = jax.lax.dot_general(
        a2, f, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [2p_pad, c]
    den = jnp.sum(a2, axis=0)[None, :]                   # [1, 2p_pad]

    @pl.when(j == 0)
    def _():
        num_ref[0] = num
        den_ref[0] = den

    @pl.when(j > 0)
    def _():
        num_ref[0] += num
        den_ref[0] += den


def meta_prototype_assign_pallas(sup_fts, sup_fg, sup_bg, ctr, protos: int,
                                 eps: float = 1e-6,
                                 interpret: bool = False):
    """Drop-in for pemp_tpu.ops.prototypes.meta_prototype_assign.

    sup_fts [B,S,n,c], masks [B,S,n], ctr [c, 2p] -> (fg, bg) [B,p,c].
    Padded pixel rows have zero masks, so they contribute nothing.
    """
    b, s, n, c = sup_fts.shape
    p_pad = max(_round_up(protos, 4), 4)
    # same tile rule as the packed chain (whole-row tile when it fits,
    # else ROW_TILE) so the two stay BIT-identical: equal block shapes
    # mean equal contraction trees (tests/test_pallas_kernels.py)
    tn = n if n <= ROW_TILE else ROW_TILE
    n_pad = _round_up(n, tn)
    n_tiles = n_pad // tn
    bs = b * s

    fdt = _wire_dtype(sup_fts)
    f = jnp.zeros((bs, n_pad, c), fdt)
    f = f.at[:, :n].set(sup_fts.reshape(bs, n, c).astype(fdt))
    mask = jnp.zeros((bs, n_pad, 2), jnp.float32)
    mask = mask.at[:, :n, 0].set(sup_fg.reshape(bs, n))
    mask = mask.at[:, :n, 1].set(sup_bg.reshape(bs, n))

    ctr_pad, padmask = _pad_ctr(ctr, protos, p_pad)

    kernel = functools.partial(_assign_kernel, protos_pad=p_pad)
    num, den = pl.pallas_call(
        kernel,
        grid=(bs, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * p_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * p_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * p_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * p_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, 2 * p_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((bs, 1, 2 * p_pad), jnp.float32),
        ],
        interpret=interpret,
    )(f, mask, ctr_pad, padmask)

    num = num.reshape(b, s, 2 * p_pad, c)
    den = den.reshape(b, s, 2 * p_pad)[..., None]
    proto = jnp.mean(num / (den + eps), axis=1)          # [b, 2p_pad, c]
    return proto[:, :protos], proto[:, p_pad:p_pad + protos]


# ---------------------------------------------------------------------------
# kernel 2: dense cosine matching + max over prototypes
# ---------------------------------------------------------------------------

def _match_kernel(qry_ref, proto_ref, padmask_ref, logit_ref, ind_ref, *,
                  protos_pad: int, dist_scalar: float, cos_eps: float):
    q = qry_ref[0].astype(jnp.float32)                   # [tn, c]
    tn = q.shape[0]
    k2 = 2 * protos_pad
    p = proto_ref[0].astype(jnp.float32)                 # [2p_pad, c]

    qn = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))     # [tn, 1]
    pn = jnp.sqrt(jnp.sum(p * p, axis=1, keepdims=True))     # [2p_pad, 1]
    dot = jax.lax.dot_general(
        q, p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [tn, 2p_pad]
    sim = dot / jnp.maximum(qn * jnp.transpose(pn), cos_eps)
    sim = sim * dist_scalar + padmask_ref[:]             # -inf on pads

    col = jax.lax.broadcasted_iota(jnp.int32, (tn, k2), 1)
    is_fg = col < protos_pad

    def class_max(ind):
        masked = jnp.where(ind, sim, NEG)
        mx = jnp.max(masked, axis=1, keepdims=True)      # [tn, 1]
        at_max = masked >= mx                            # ties -> first
        idx = jnp.min(jnp.where(at_max, col, k2), axis=1, keepdims=True)
        return mx, idx

    fg_max, fg_idx = class_max(is_fg)
    bg_max, bg_idx = class_max(jnp.logical_not(is_fg))
    bg_idx = bg_idx - protos_pad
    # reference class order [bg, fg]
    logit_ref[0] = jnp.concatenate([bg_max, fg_max], axis=1)
    ind_ref[0] = jnp.concatenate([bg_idx, fg_idx], axis=1).astype(jnp.int32)


def prototype_match_pallas(qry_fts, fg_proto, bg_proto,
                           dist_scalar: float = 20.0,
                           return_indices: bool = False,
                           cos_eps: float = 1e-8,
                           interpret: bool = False):
    """Drop-in for pemp_tpu.ops.prototypes.prototype_predictions
    (multi-prototype path). qry_fts [B,Q,n,c], protos [B,p,c]."""
    b, q, n, c = qry_fts.shape
    protos = fg_proto.shape[1]
    p_pad = max(_round_up(protos, 4), 4)
    tn = min(ROW_TILE, _round_up(n, 8))
    n_pad = _round_up(n, tn)
    n_tiles = n_pad // tn
    bq = b * q

    qdt = _wire_dtype(qry_fts)
    qf = jnp.zeros((bq, n_pad, c), qdt)
    qf = qf.at[:, :n].set(qry_fts.reshape(bq, n, c).astype(qdt))
    pk = _pack_protos(fg_proto, bg_proto, protos, p_pad, q)
    padmask = _col_padmask(protos, p_pad)

    kernel = functools.partial(_match_kernel, protos_pad=p_pad,
                               dist_scalar=dist_scalar, cos_eps=cos_eps)
    logits, inds = pl.pallas_call(
        kernel,
        grid=(bq, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * p_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * p_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bq, n_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((bq, n_pad, 2), jnp.int32),
        ],
        interpret=interpret,
    )(qf, pk, padmask)

    # kernel already emits reference class order [bg, fg]
    logits = logits[:, :n, :].reshape(b, q, n, 2)
    if return_indices:
        inds = inds[:, :n, :].reshape(b, q, n, 2)
        return logits, inds
    return logits


# ---------------------------------------------------------------------------
# packed chain: assign + match off ONE staged copy of the un-split features
# ---------------------------------------------------------------------------

def mpm_chain_packed_pallas(fts, sup_fg, sup_bg, ctr, protos: int,
                            dist_scalar: float = 20.0,
                            eps: float = 1e-6, cos_eps: float = 1e-8,
                            return_residuals: bool = False,
                            interpret: bool = False):
    """assign -> match with the support/query split done by the kernels.

    fts [B, S+Q, n, c] is the purifier output straight after its
    ``reshape(b, s+q, h*w, c)`` — NOT split into sup/qry. Both kernels
    read one shared padded staging buffer; the BlockSpec index_maps pick
    the support rows ((i//S)*(S+Q) + i%S) for the assignment grid and
    the query rows ((i//Q)*(S+Q) + S + i%Q) for the matching grid. This
    replaces the model-side slice plus two separate staging pads with a
    single fused relayout+pad pass over the largest activation (the
    remaining ~5% of the eval step after the bf16-wire fix —
    tools/profile_eval.py).

    Bit-identical to meta_prototype_assign_pallas + prototype_match_pallas
    on the split views (tests/test_pallas_kernels.py). Returns logits
    [B,Q,n,2]; with ``return_residuals`` also (inds, fg_proto, bg_proto)
    for the custom-VJP wrapper.
    """
    b, sq, n, c = fts.shape
    s = sup_fg.shape[1]
    q = sq - s
    p_pad = max(_round_up(protos, 4), 4)
    # Mosaic block-shape rule: the last two block dims must be divisible
    # by (8, 128) or EQUAL to the array dims. A single whole-row tile
    # (tn == n) is always legal; multi-tile rows use ROW_TILE, which is
    # divisible by both (the mask rides n on its lane dim, so a rounded
    # 8-multiple like the padded path used would be rejected there).
    tn = n if n <= ROW_TILE else ROW_TILE
    n_tiles = -(-n // tn)       # cdiv: boundary block masked in-kernel

    # NO padded staging buffer (r5): the r4 trace showed the zero-pad of
    # the largest activation (%pad 4.6 ms/launch at B=256) plus the
    # [.., n_pad, 2] f32 mask staging (its trailing dim of 2 is padded
    # to 128 lanes on HBM — a 64x physical blowup, ~3.3 ms of
    # dynamic-update-slice/pad) were the last non-backbone consumers of
    # the eval step. The kernels now read the UNPADDED [B*(S+Q), n, c]
    # reshape view directly — out-of-bounds rows of the cdiv boundary
    # block are zeroed in-kernel (see _assign_kernel n_rows), which is
    # bit-identical to what the zero-padded buffer provided.
    fdt = _wire_dtype(fts)
    stage = fts.reshape(b * sq, n, c).astype(fdt)
    # [b*s, 2, n]: n on the lane dim (see _assign_kernel's transpose)
    mask = jnp.stack([sup_fg.reshape(b * s, n),
                      sup_bg.reshape(b * s, n)], axis=1)
    mask = mask.astype(jnp.float32)

    ctr_pad, padmask = _pad_ctr(ctr, protos, p_pad)

    kernel = functools.partial(_assign_kernel, protos_pad=p_pad, n_rows=n)
    num, den = pl.pallas_call(
        kernel,
        grid=(b * s, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tn, c),
                         lambda i, j: ((i // s) * sq + i % s, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * p_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * p_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * p_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * p_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * s, 2 * p_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b * s, 1, 2 * p_pad), jnp.float32),
        ],
        interpret=interpret,
    )(stage, mask, ctr_pad, padmask)

    num = num.reshape(b, s, 2 * p_pad, c)
    den = den.reshape(b, s, 2 * p_pad)[..., None]
    proto = jnp.mean(num / (den + eps), axis=1)          # [b, 2p_pad, c]
    fg_proto = proto[:, :protos]
    bg_proto = proto[:, p_pad:p_pad + protos]

    pk = _pack_protos(fg_proto, bg_proto, protos, p_pad, q)

    mkernel = functools.partial(_match_kernel, protos_pad=p_pad,
                                dist_scalar=dist_scalar, cos_eps=cos_eps)
    logits, inds = pl.pallas_call(
        mkernel,
        grid=(b * q, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tn, c),
                         lambda i, j: ((i // q) * sq + s + i % q, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * p_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * p_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # unpadded: the boundary block's writes past n are masked by
            # pallas, so the old [:, :n] slice (a full pass over the
            # 64x-lane-padded [.., n_pad, 2] layout) disappears. The
            # match kernel needs no row masking — garbage rows only
            # produce garbage values that those masked writes drop.
            jax.ShapeDtypeStruct((b * q, n, 2), jnp.float32),
            jax.ShapeDtypeStruct((b * q, n, 2), jnp.int32),
        ],
        interpret=interpret,
    )(stage, pk, padmask)

    logits = logits.reshape(b, q, n, 2)
    if return_residuals:
        inds = inds.reshape(b, q, n, 2)
        return logits, inds, fg_proto, bg_proto
    return logits
