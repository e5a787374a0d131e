"""Opt-in ON-CHIP compiled-kernel bit-parity suite (VERDICT r2 item 2).

Every Pallas comparison elsewhere in tests/ runs the kernels in
interpreter mode on CPU; Mosaic compilation can legally differ from
interpret mode (the r1 f32-exp overflow bug was exactly such a case).
This module re-runs the same parity assertions with the kernels
COMPILED on the real TPU, in ~1-2 minutes, so chip bitness is a
repeatable artifact instead of an in-session anecdote:

    PEMP_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_onchip.py -q

Off-chip (the normal CPU suite) every test here auto-skips.
Covered: mpm forward kernels (assign + match, incl. the well-separated
softmax-overflow regression), both custom VJPs + the fused chain vs
jax.grad of the jnp path, the min-plus EDT (exact integer equality), and
a whole-model fast-eval counts batch pallas-vs-jnp (reference hot loop:
networks/pemp_stage1.py:205-215).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="needs the real TPU (PEMP_TPU_TESTS=1 pytest -m tpu)"),
]


def _close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("n,c,p,s", [(100, 128, 3, 1), (64, 256, 3, 2)])
def test_onchip_assign_kernel(n, c, p, s):
    from pemp_tpu.ops.pallas.mpm import meta_prototype_assign_pallas
    from pemp_tpu.ops.prototypes import meta_prototype_assign

    rng = np.random.RandomState(0)
    b = 2
    sup = jnp.asarray(rng.randn(b, s, n, c).astype(np.float32))
    fg = jnp.asarray((rng.rand(b, s, n) > 0.6).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))

    f1, b1 = meta_prototype_assign(sup, fg, bg, ctr, p)
    f2, b2 = meta_prototype_assign_pallas(sup, fg, bg, ctr, p,
                                          interpret=False)
    _close(f1, f2)
    _close(b1, b2)


def test_onchip_assign_kernel_well_separated_no_overflow():
    """r1 regression compiled on chip: distances past exp's f32 range
    must not produce inf*0=NaN in the per-class softmax."""
    from pemp_tpu.ops.pallas.mpm import meta_prototype_assign_pallas
    from pemp_tpu.ops.prototypes import meta_prototype_assign

    rng = np.random.RandomState(0)
    b, s, n, c, p = 1, 1, 40, 64, 3
    sup = jnp.asarray(rng.randn(b, s, n, c).astype(np.float32) * 0.1)
    fg = jnp.asarray((rng.rand(b, s, n) > 0.5).astype(np.float32))
    bg = 1.0 - fg
    ctr = np.zeros((c, 2 * p), np.float32)
    ctr[:, :p] = 10.0
    ctr = jnp.asarray(ctr)

    f1, b1 = meta_prototype_assign(sup, fg, bg, ctr, p)
    f2, b2 = meta_prototype_assign_pallas(sup, fg, bg, ctr, p,
                                          interpret=False)
    assert np.isfinite(np.asarray(f2)).all()
    assert np.isfinite(np.asarray(b2)).all()
    _close(f1, f2)
    _close(b1, b2)


@pytest.mark.parametrize("n,c,p", [(100, 128, 3), (64, 256, 1)])
def test_onchip_match_kernel(n, c, p):
    from pemp_tpu.ops.pallas.mpm import prototype_match_pallas
    from pemp_tpu.ops.prototypes import prototype_predictions

    rng = np.random.RandomState(1)
    b = 2
    qry = jnp.asarray(rng.randn(b, 1, n, c).astype(np.float32))
    fg = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    bg = jnp.asarray(rng.randn(b, p, c).astype(np.float32))

    l1, i1 = prototype_predictions(qry, fg, bg, 20.0, return_indices=True)
    l2, i2 = prototype_match_pallas(qry, fg, bg, 20.0,
                                    return_indices=True, interpret=False)
    _close(l1, l2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_onchip_fused_chain_vjp():
    """Assign -> match composed through the custom VJPs, compiled: value
    and grads to sup/qry/ctr vs jax.grad of the jnp ground truth."""
    from pemp_tpu.ops.pallas.mpm_vjp import (
        meta_prototype_assign_fused, prototype_match_fused,
    )
    from pemp_tpu.ops.prototypes import (
        meta_prototype_assign, prototype_predictions,
    )

    rng = np.random.RandomState(3)
    b, s, n, c, p = 2, 1, 81, 64, 3
    sup = jnp.asarray(rng.randn(b, s, n, c).astype(np.float32))
    qry = jnp.asarray(rng.randn(b, 1, n, c).astype(np.float32))
    fg = jnp.asarray((rng.rand(b, s, n) > 0.5).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))
    w = jnp.asarray(rng.randn(b, 1, n, 2).astype(np.float32))

    def loss_ref(sup, qry, ctr):
        f, g = meta_prototype_assign(sup, fg, bg, ctr, p)
        return jnp.sum(prototype_predictions(qry, f, g, 20.0) * w)

    def loss_fused(sup, qry, ctr):
        f, g = meta_prototype_assign_fused(sup, fg, bg, ctr, p, 1e-6, True)
        return jnp.sum(prototype_match_fused(qry, f, g, 20.0,
                                             1e-8, True) * w)

    v1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(sup, qry, ctr)
    v2, g2 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(sup, qry, ctr)
    _close(v1, v2)
    for a, b_ in zip(g1, g2):
        _close(a, b_)


@pytest.mark.parametrize("m,k,n", [(40, 37, 53), (128, 8, 128)])
def test_onchip_minplus_matmul_exact(m, k, n):
    from pemp_tpu.ops.pallas.minplus import minplus_matmul

    rng = np.random.RandomState(0)
    a = rng.randint(0, 2 ** 20, (m, k)).astype(np.float32)
    b = rng.randint(0, 2 ** 20, (k, n)).astype(np.float32)
    want = (a[:, :, None] + b[None, :, :]).min(axis=1)
    got = np.asarray(minplus_matmul(jnp.asarray(a), jnp.asarray(b),
                                    interpret=False))
    np.testing.assert_array_equal(got, want)


def test_onchip_edt2_exact_on_real_boundaries():
    """Compiled min-plus EDT: the squared distances are exact integers,
    so the kernel must match a brute-force oracle EXACTLY. (The final
    sqrt is compared at 1-ulp: XLA's TPU sqrt and host numpy's can
    legally differ in the last bit.)"""
    from pemp_tpu.ops.edt import boundary_map, euclidean_distance_transform
    from pemp_tpu.ops.pallas.minplus import edt2_pallas

    target = np.zeros((2, 41, 41), np.int32)
    target[0, 10:25, 12:30] = 1
    target[1, 3:9, 4:7] = 1
    target[1, 20:30, 25:33] = 1
    feat = boundary_map(jnp.asarray(target))
    feat_np = np.asarray(feat)

    d2_pal = np.asarray(edt2_pallas(feat, interpret=False))

    yy, xx = np.mgrid[:41, :41]
    for b in range(2):
        ys, xs = np.nonzero(feat_np[b])
        oracle = ((yy[..., None] - ys) ** 2
                  + (xx[..., None] - xs) ** 2).min(-1)
        np.testing.assert_array_equal(d2_pal[b], oracle.astype(np.float32))

    d_jnp = np.asarray(euclidean_distance_transform(feat, use_pallas=False))
    np.testing.assert_allclose(np.sqrt(d2_pal), d_jnp, rtol=3e-7)


def test_onchip_whole_model_pallas_vs_jnp_eval_counts():
    """One fast-eval counts batch through PEMPStage1: the pallas path
    (fused kernels in the jitted model) vs the jnp path on the SAME chip
    — logits close, argmax labels near-identical, metric counts equal up
    to f32 argmax ties."""
    from pemp_tpu.core.metrics import tp_fp_fn
    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    rng = np.random.RandomState(4)
    b, s, q, hw = 2, 1, 1, 33
    sup = rng.randn(b, s, hw, hw, 3).astype(np.float32)
    fgm = (rng.rand(b, s, hw, hw, 1) > 0.5).astype(np.float32)
    msk = np.concatenate([fgm, 1 - fgm], -1)
    qry = rng.randn(b, q, hw, hw, 3).astype(np.float32)
    labels = rng.randint(0, 2, (b, q, hw, hw)).astype(np.int32)

    logits = {}
    for use_pallas in (False, True):
        model = PEMPStage1(backbone="resnet50", protos=3,
                           use_pallas=use_pallas)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.asarray(sup), jnp.asarray(msk),
                               jnp.asarray(qry), out_hw=(hw, hw))
        out = jax.jit(lambda v: model.apply(
            v, jnp.asarray(sup), jnp.asarray(msk), jnp.asarray(qry),
            out_hw=(hw, hw)))(variables)
        logits[use_pallas] = np.asarray(out)

    _close(logits[True], logits[False], rtol=1e-4, atol=1e-4)
    pred_p = logits[True].argmax(-1)
    pred_j = logits[False].argmax(-1)
    assert (pred_p != pred_j).mean() < 0.005
    c_p = np.asarray(tp_fp_fn(jnp.asarray(pred_p), jnp.asarray(labels)))
    c_j = np.asarray(tp_fp_fn(jnp.asarray(pred_j), jnp.asarray(labels)))
    assert np.abs(c_p - c_j).max() <= int(0.005 * pred_p.size)


def test_onchip_packed_chain_vjp():
    """The PACKED fused chain COMPILED on chip: forward bit-path vs the
    jnp ground truth on split views, grads for every input vs jax.grad
    (the model's training/eval path after the packed-boundary change)."""
    from pemp_tpu.ops.pallas.mpm_vjp import mpm_fused_chain_packed
    from pemp_tpu.ops.prototypes import (
        meta_prototype_assign, prototype_predictions,
    )

    rng = np.random.RandomState(41)
    b, s, n, c, p = 2, 1, 81, 128, 3
    fts = jnp.asarray(rng.randn(b, s + 1, n, c).astype(np.float32))
    fg = jnp.asarray((rng.rand(b, s, n) > 0.5).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))
    w = jnp.asarray(rng.randn(b, 1, n, 2).astype(np.float32))

    def loss_ref(fts, fg, bg, ctr):
        f, g = meta_prototype_assign(fts[:, :s], fg, bg, ctr, p)
        return jnp.sum(prototype_predictions(fts[:, s:], f, g, 20.0) * w)

    def loss_packed(fts, fg, bg, ctr):
        return jnp.sum(mpm_fused_chain_packed(fts, fg, bg, ctr, p, 20.0) * w)

    v1, g1 = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3)))(
        fts, fg, bg, ctr)
    v2, g2 = jax.jit(jax.value_and_grad(loss_packed, argnums=(0, 1, 2, 3)))(
        fts, fg, bg, ctr)
    _close(v1, v2)
    for a, b_ in zip(g1, g2):
        _close(a, b_)


def test_onchip_packed_chain_bf16_wire():
    """bf16 packed features through the compiled kernels must equal the
    f32-upcast path bit-for-bit (the HBM-wire dtype change)."""
    from pemp_tpu.ops.pallas.mpm import mpm_chain_packed_pallas

    rng = np.random.RandomState(43)
    b, s, n, c, p = 2, 1, 100, 128, 3
    fts16 = jnp.asarray(rng.randn(b, s + 1, n, c), jnp.bfloat16)
    fg = jnp.asarray((rng.rand(b, s, n) > 0.6).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))

    l16 = mpm_chain_packed_pallas(fts16, fg, bg, ctr, p, 20.0)
    l32 = mpm_chain_packed_pallas(fts16.astype(jnp.float32), fg, bg,
                                  ctr, p, 20.0)
    np.testing.assert_array_equal(np.asarray(l16), np.asarray(l32))


def test_onchip_serving_artifact_executes_and_matches():
    """The StableHLO serving artifact (tools/export_serving.py) compiled
    and EXECUTED on the real chip: deserialize(serialize(export(serve)))
    must produce the live jitted forward's logits bit-for-bit on TPU —
    the CPU round-trip test (test_export_serving.py) never proves the
    artifact actually lowers through the TPU backend."""
    from jax import export

    from tools.convert_reference_ckpt import build_init_trees
    from tools.export_serving import build_serving_fn

    model, params, stats = build_init_trees("pemp_stage1", "resnet50",
                                            shot=1)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    b, hw = 1, 33
    serve, specs = build_serving_fn("pemp_stage1", model, variables,
                                    b, 1, 1, hw)
    restored = export.deserialize(export.export(serve)(*specs).serialize())

    rng = np.random.RandomState(0)
    fg = (rng.rand(b, 1, hw, hw, 1) > 0.5).astype(np.float32)
    inputs = [
        jnp.asarray(rng.randn(b, 1, hw, hw, 3).astype(np.float32)),
        jnp.asarray(np.concatenate([fg, 1 - fg], -1)),
        jnp.asarray(rng.randn(b, 1, hw, hw, 3).astype(np.float32)),
    ]
    want = np.asarray(serve(*inputs))
    got = np.asarray(restored.call(*inputs))
    assert want.shape == (b, 1, hw, hw, 2)
    np.testing.assert_array_equal(got, want)
