"""Data-parallel sharding over the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_full_train_step():
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """Gradients with episodes sharded over the mesh equal the
    single-device result (GSPMD all-reduce correctness)."""
    from pemp_tpu.config import TrainConfig
    from pemp_tpu.core.solver import make_optimizer, trainable_mask
    from pemp_tpu.core.trainer import TrainState
    from pemp_tpu.parallel.mesh import data_mesh
    from pemp_tpu.parallel.step import make_train_step, replicate_state

    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 3).astype(np.float32)

    def loss_fn(params, batch_stats, batch, _rng):
        pred = batch["sup_rgb"] @ params["w"]
        loss = jnp.mean((pred - batch["qry_rgb"]) ** 2)
        return loss, (batch_stats, {})

    cfg = TrainConfig(opt="sgd", sgd_momentum=0.0, weight_decay=0.0)

    def run(mesh):
        params = {"w": jnp.asarray(w0)}
        tx = make_optimizer(cfg, trainable_mask(params, []))
        state = TrainState(params, {}, tx.init(params))
        if mesh is not None:
            state = replicate_state(state, mesh)
        step = make_train_step(loss_fn, tx, mesh)
        batch = {"sup_rgb": x, "qry_rgb": y}
        state, loss, _ = step(state, batch, 0.1, jax.random.PRNGKey(0))
        return np.asarray(state.params["w"]), float(loss)

    w_single, l_single = run(None)
    w_mesh, l_mesh = run(data_mesh(8))
    np.testing.assert_allclose(w_mesh, w_single, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(l_mesh, l_single, rtol=1e-5)


def test_process_episode_range():
    from pemp_tpu.parallel.mesh import process_episode_range
    start, stop = process_episode_range(1000)
    assert (start, stop) == (0, 1000)   # single process owns everything
