"""Custom-VJP Pallas wrappers vs jax.grad of the jnp ground truth.

The fused kernels (interpret mode on CPU) must produce the same
cotangents as autodiff through pemp_tpu/ops/prototypes.py for every
differentiable input — this is what licenses putting them on the
training path (reference hot loop networks/pemp_stage1.py:201-215).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pemp_tpu.ops.prototypes import (
    meta_prototype_assign, prototype_predictions,
)
from pemp_tpu.ops.pallas.mpm_vjp import (
    meta_prototype_assign_fused, prototype_match_fused,
)


def _close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("n,c,p,s", [(100, 128, 3, 1), (64, 96, 3, 2),
                                     (50, 128, 1, 1)])
def test_assign_vjp_matches_autodiff(n, c, p, s):
    rng = np.random.RandomState(7)
    b = 2
    sup = jnp.asarray(rng.randn(b, s, n, c).astype(np.float32))
    fg = jnp.asarray((rng.rand(b, s, n) > 0.6).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))
    wf = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    wb = jnp.asarray(rng.randn(b, p, c).astype(np.float32))

    def loss_ref(sup, fg, bg, ctr):
        f, g = meta_prototype_assign(sup, fg, bg, ctr, p)
        return jnp.sum(f * wf) + jnp.sum(g * wb)

    def loss_fused(sup, fg, bg, ctr):
        f, g = meta_prototype_assign_fused(sup, fg, bg, ctr, p, 1e-6, True)
        return jnp.sum(f * wf) + jnp.sum(g * wb)

    v1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        sup, fg, bg, ctr)
    v2, g2 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        sup, fg, bg, ctr)
    _close(v1, v2)
    for a, b_ in zip(g1, g2):
        _close(a, b_)


@pytest.mark.parametrize("n,c,p,q", [(100, 128, 3, 1), (64, 96, 1, 2)])
def test_match_vjp_matches_autodiff(n, c, p, q):
    rng = np.random.RandomState(11)
    b = 2
    qry = jnp.asarray(rng.randn(b, q, n, c).astype(np.float32))
    fgp = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    bgp = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    w = jnp.asarray(rng.randn(b, q, n, 2).astype(np.float32))

    def loss_ref(qry, fgp, bgp):
        return jnp.sum(prototype_predictions(qry, fgp, bgp, 20.0) * w)

    def loss_fused(qry, fgp, bgp):
        return jnp.sum(prototype_match_fused(qry, fgp, bgp, 20.0,
                                             1e-8, True) * w)

    v1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(qry, fgp, bgp)
    v2, g2 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(qry, fgp, bgp)
    _close(v1, v2)
    for a, b_ in zip(g1, g2):
        _close(a, b_)


def test_full_mpm_chain_vjp():
    """Assign -> match composed, grads to features AND the learned ctr
    parameter (the exact training-path composition in mpm_predict)."""
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
        return jnp.sum(prototype_match_fused(qry, f, g, 20.0, 1e-8, True) * w)

    v1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(sup, qry, ctr)
    v2, g2 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(sup, qry, ctr)
    _close(v1, v2)
    for a, b_ in zip(g1, g2):
        _close(a, b_)


def test_match_vjp_zero_prototype_no_nan():
    """A zero prototype (empty support class) must give finite, matching
    grads — the _safe_norm guard path. p=1 so the all-zero class has no
    max-over-p tie (ties split in autodiff but take-first in the kernel,
    a documented measure-zero deviation)."""
    rng = np.random.RandomState(5)
    b, n, c, p = 1, 50, 64, 1
    qry = jnp.asarray(rng.randn(b, 1, n, c).astype(np.float32))
    fgp = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    bgp = jnp.zeros((b, p, c), jnp.float32)        # all-zero bg prototypes
    w = jnp.asarray(rng.randn(b, 1, n, 2).astype(np.float32))

    def loss_ref(qry, fgp, bgp):
        return jnp.sum(prototype_predictions(qry, fgp, bgp, 20.0) * w)

    def loss_fused(qry, fgp, bgp):
        return jnp.sum(prototype_match_fused(qry, fgp, bgp, 20.0,
                                             1e-8, True) * w)

    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(qry, fgp, bgp)
    g2 = jax.grad(loss_fused, argnums=(0, 1, 2))(qry, fgp, bgp)
    for a, b_ in zip(g1, g2):
        assert np.isfinite(np.asarray(b_)).all()
        _close(a, b_)


def test_mpm_fused_chain_shard_map_grads_match_autodiff():
    """The full assign->match chain shard_mapped over an 8-device data
    mesh: values and gradients (including the REPLICATED ctr cotangent,
    which shard_map's transpose must psum across shards) must match
    jax.grad of the jnp ground truth on the global batch."""
    import jax
    from pemp_tpu.ops.pallas.mpm_vjp import mpm_fused_chain
    from pemp_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = mesh_lib.data_mesh(8)

    rng = np.random.RandomState(13)
    b, s, n, c, p = 16, 1, 50, 64, 3        # 2 episodes per device
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
        lg = mpm_fused_chain(sup, fg, bg, qry, ctr, p, 20.0,
                             mesh=mesh, interpret=True)
        return jnp.sum(lg * w)

    v1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(sup, qry, ctr)
    v2, g2 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(sup, qry, ctr)
    _close(v1, v2)
    for a, b_ in zip(g1, g2):
        _close(a, b_)


def test_mpm_fused_chain_mesh_indivisible_batch_falls_back():
    """B=1 (model.init traces) and mesh-indivisible batches must run the
    plain kernels instead of crashing on shard_map divisibility —
    regression for the multi-device init crash."""
    import jax
    from pemp_tpu.ops.pallas.mpm_vjp import mpm_fused_chain
    from pemp_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = mesh_lib.data_mesh(8)

    rng = np.random.RandomState(17)
    for b in (1, 3):                        # neither divisible by 8
        sup = jnp.asarray(rng.randn(b, 1, 40, 32).astype(np.float32))
        qry = jnp.asarray(rng.randn(b, 1, 40, 32).astype(np.float32))
        fg = jnp.asarray((rng.rand(b, 1, 40) > 0.5).astype(np.float32))
        bg = 1.0 - fg
        ctr = jnp.asarray(rng.rand(32, 6).astype(np.float32))
        got = mpm_fused_chain(sup, fg, bg, qry, ctr, 3, 20.0,
                              mesh=mesh, interpret=True)
        f, g = meta_prototype_assign(sup, fg, bg, ctr, 3)
        want = prototype_predictions(qry, f, g, 20.0)
        _close(got, want)


@pytest.mark.parametrize("s,q", [(1, 1), (2, 1), (1, 2)])
def test_mpm_packed_fused_matches_autodiff(s, q):
    """The PACKED chain (kernels split support/query via index_maps, one
    staging pass) — values and every-input grads vs jax.grad of the jnp
    ground truth on the split views. The packed features get ONE
    cotangent (the concat of the sup/qry cotangents: the exact transpose
    of the slicing the unpacked model code did)."""
    from pemp_tpu.ops.pallas.mpm_vjp import mpm_fused_chain_packed

    rng = np.random.RandomState(23)
    b, n, c, p = 2, 81, 64, 3
    fts = jnp.asarray(rng.randn(b, s + q, n, c).astype(np.float32))
    fg = jnp.asarray((rng.rand(b, s, n) > 0.5).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))
    w = jnp.asarray(rng.randn(b, q, n, 2).astype(np.float32))

    def loss_ref(fts, fg, bg, ctr):
        f, g = meta_prototype_assign(fts[:, :s], fg, bg, ctr, p)
        return jnp.sum(prototype_predictions(fts[:, s:], f, g, 20.0) * w)

    def loss_packed(fts, fg, bg, ctr):
        lg = mpm_fused_chain_packed(fts, fg, bg, ctr, p, 20.0,
                                    interpret=True)
        return jnp.sum(lg * w)

    v1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        fts, fg, bg, ctr)
    v2, g2 = jax.value_and_grad(loss_packed, argnums=(0, 1, 2, 3))(
        fts, fg, bg, ctr)
    _close(v1, v2)
    for a, b_ in zip(g1, g2):
        _close(a, b_)


def test_mpm_packed_fused_shard_map_and_fallback():
    """Packed chain under the 8-device mesh (values + grads incl. the
    psum'd ctr cotangent) and the mesh-indivisible fallback."""
    from pemp_tpu.ops.pallas.mpm_vjp import mpm_fused_chain_packed
    from pemp_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = mesh_lib.data_mesh(8)

    rng = np.random.RandomState(29)
    b, s, n, c, p = 16, 1, 50, 64, 3
    fts = jnp.asarray(rng.randn(b, s + 1, n, c).astype(np.float32))
    fg = jnp.asarray((rng.rand(b, s, n) > 0.5).astype(np.float32))
    bg = 1.0 - fg
    ctr = jnp.asarray(rng.rand(c, 2 * p).astype(np.float32))
    w = jnp.asarray(rng.randn(b, 1, n, 2).astype(np.float32))

    def loss_ref(fts, ctr):
        f, g = meta_prototype_assign(fts[:, :s], fg, bg, ctr, p)
        return jnp.sum(prototype_predictions(fts[:, s:], f, g, 20.0) * w)

    def loss_packed(fts, ctr):
        lg = mpm_fused_chain_packed(fts, fg, bg, ctr, p, 20.0,
                                    mesh=mesh, interpret=True)
        return jnp.sum(lg * w)

    v1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1))(fts, ctr)
    v2, g2 = jax.value_and_grad(loss_packed, argnums=(0, 1))(fts, ctr)
    _close(v1, v2)
    for a, b_ in zip(g1, g2):
        _close(a, b_)

    # indivisible batch falls back to the plain kernels
    fts3 = fts[:3]
    got = mpm_fused_chain_packed(fts3, fg[:3], bg[:3], ctr, p, 20.0,
                                 mesh=mesh, interpret=True)
    f, g = meta_prototype_assign(fts3[:, :s], fg[:3], bg[:3], ctr, p)
    want = prototype_predictions(fts3[:, s:], f, g, 20.0)
    _close(got, want)
