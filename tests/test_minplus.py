"""Pallas min-plus matmul / EDT kernel vs the jnp ground truth
(interpreter mode on CPU). The EDT phases are integer-valued f32, so the
kernel must match EXACTLY wherever any feature pixel exists."""

import numpy as np
import pytest

import jax.numpy as jnp

from pemp_tpu.ops.edt import boundary_map, euclidean_distance_transform
from pemp_tpu.ops.pallas.minplus import edt2_pallas, minplus_matmul


@pytest.mark.parametrize("m,k,n", [(40, 37, 53), (128, 8, 128), (33, 401, 65)])
def test_minplus_matmul_exact(m, k, n):
    rng = np.random.RandomState(0)
    a = rng.randint(0, 2 ** 20, (m, k)).astype(np.float32)
    b = rng.randint(0, 2 ** 20, (k, n)).astype(np.float32)
    want = (a[:, :, None] + b[None, :, :]).min(axis=1)
    got = np.asarray(minplus_matmul(jnp.asarray(a), jnp.asarray(b),
                                    interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape", [(2, 37, 53), (1, 64, 64)])
def test_edt2_pallas_matches_jnp_ground_truth(shape):
    rng = np.random.RandomState(1)
    feat = rng.rand(*shape) < 0.02
    feat[:, 5, 7] = True                     # at least one feature pixel
    d_jnp = np.asarray(euclidean_distance_transform(
        jnp.asarray(feat), use_pallas=False))
    d2_pal = np.asarray(edt2_pallas(jnp.asarray(feat), interpret=True))
    np.testing.assert_array_equal(np.sqrt(d2_pal), d_jnp)


def test_edt2_pallas_empty_map_huge():
    feat = np.zeros((1, 16, 16), bool)
    d2 = np.asarray(edt2_pallas(jnp.asarray(feat), interpret=True))
    assert np.all(np.sqrt(d2) > 1e5)


def test_edt2_pallas_on_real_boundaries():
    """End-to-end shape: boundary extraction -> pallas EDT vs jnp EDT
    on a realistic blob label map."""
    rng = np.random.RandomState(2)
    target = np.zeros((2, 41, 41), np.int32)
    target[0, 10:25, 12:30] = 1
    target[1, 3:9, 4:7] = 1
    target[1, 20:30, 25:33] = 1
    feat = boundary_map(jnp.asarray(target))
    d_jnp = np.asarray(euclidean_distance_transform(feat, use_pallas=False))
    d2_pal = np.asarray(edt2_pallas(feat, interpret=True))
    np.testing.assert_array_equal(np.sqrt(d2_pal), d_jnp)


def test_edt2_pallas_shard_map_over_data_mesh():
    """Under a >1-device mesh the kernel wraps itself in shard_map over
    the batch axis (the composition that lets a pallas_call live inside
    the GSPMD-jitted cedt train step) — results must match the
    single-device kernel and the jnp ground truth exactly."""
    import jax
    from pemp_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")
    mesh = mesh_lib.data_mesh(8)

    rng = np.random.RandomState(3)
    feat = rng.rand(16, 33, 41) < 0.03          # batch 16 = 2 per device
    feat[:, 4, 5] = True
    d2_sharded = np.asarray(
        edt2_pallas(jnp.asarray(feat), interpret=True, mesh=mesh))
    d2_single = np.asarray(edt2_pallas(jnp.asarray(feat), interpret=True))
    np.testing.assert_array_equal(d2_sharded, d2_single)

    d_jnp = np.asarray(euclidean_distance_transform(
        jnp.asarray(feat), use_pallas=False))
    np.testing.assert_array_equal(np.sqrt(d2_sharded), d_jnp)


def test_sharded_cedt_composition_with_pallas_edt():
    """The real train-step composition: a GSPMD-jitted loss over
    batch-sharded arrays whose EDT weight comes from the shard_mapped
    pallas kernel — values and logits-grads must match the jnp-EDT
    version of the same loss."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pemp_tpu.core.losses import _pixel_ce
    from pemp_tpu.ops.edt import boundary_map
    from pemp_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")
    mesh = mesh_lib.data_mesh(8)
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))

    rng = np.random.RandomState(9)
    logits = jax.device_put(
        jnp.asarray(rng.randn(16, 33, 33, 2).astype(np.float32)), shard)
    labels = jax.device_put(
        jnp.asarray(rng.randint(0, 2, (16, 33, 33)), jnp.int32), shard)

    def loss(weight_fn, lg, lb):
        pix, _ = _pixel_ce(lg, lb)
        w = weight_fn(lb)
        return jnp.sum(pix * w) / jnp.sum(w)

    def w_pallas(lb):
        d2 = edt2_pallas(boundary_map(lb), interpret=True, mesh=mesh)
        return jnp.exp(-jnp.sqrt(d2) / 25.0) + 1.0

    def w_jnp(lb):
        d = euclidean_distance_transform(boundary_map(lb), use_pallas=False)
        return jnp.exp(-d / 25.0) + 1.0

    v1, g1 = jax.jit(jax.value_and_grad(
        lambda lg: loss(w_pallas, lg, labels)))(logits)
    v2, g2 = jax.jit(jax.value_and_grad(
        lambda lg: loss(w_jnp, lg, labels)))(logits)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)


def test_edt2_pallas_mesh_indivisible_batch_falls_back():
    """Batches not divisible by the mesh (B=1 init traces, tiny eval
    batches) must run the plain kernel instead of crashing shard_map."""
    import jax
    from pemp_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")
    mesh = mesh_lib.data_mesh(8)

    feat = np.zeros((3, 16, 16), bool)
    feat[:, 4, 5] = True
    got = np.asarray(edt2_pallas(jnp.asarray(feat), interpret=True,
                                 mesh=mesh))
    want = np.asarray(edt2_pallas(jnp.asarray(feat), interpret=True))
    np.testing.assert_array_equal(got, want)
