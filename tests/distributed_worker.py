"""Worker for tests/test_distributed_2proc.py (NOT collected by pytest).

Runs the REAL multi-process path: ``initialize_distributed()`` via the
explicit COORDINATOR_ADDRESS env (pemp_tpu/parallel/mesh.py:85-89), a
global data mesh over all processes' CPU devices, the framework's
``make_train_step`` (donated state, wire-format batch, GSPMD gradient
all-reduce) on a deterministic global batch, and the rank-sharded
episode range. Results are dumped as JSON for the parent to compare
across ranks and against the single-process run.

Usage: python tests/distributed_worker.py <out.json>
(single-process reference when COORDINATOR_ADDRESS is unset)
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pemp_tpu.core import losses as loss_lib
from pemp_tpu.core import solver
from pemp_tpu.core.trainer import TrainState
from pemp_tpu.parallel.mesh import (
    batch_sharding, data_mesh, fetch_global, initialize_distributed,
    local_rows, process_episode_range,
)
from pemp_tpu.parallel.step import (
    device_batch, make_train_step, replicate_state,
)

N_EPISODES = 8
HW = 17
STEPS = 2
LR = 0.05


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x):                       # [B, Q, H, W, 3]
        b, q, h, w, c = x.shape
        x = x.reshape(b * q, h, w, c)
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        x = nn.Conv(2, (1, 1))(x)
        return x.reshape(b, q, h, w, 2)


def main(out_path):
    distributed = initialize_distributed()
    rank = jax.process_index()
    world = jax.process_count()

    mesh = data_mesh()                           # ALL global devices
    model = TinyNet()

    rng = np.random.RandomState(0)               # same stream everywhere
    qry = rng.randn(N_EPISODES, 1, HW, HW, 3).astype(np.float32)
    msk = rng.randint(0, 2, (N_EPISODES, 1, HW, HW)).astype(np.int32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(qry[:1]))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    mask = solver.trainable_mask(params, [])
    from types import SimpleNamespace
    tx = solver.make_optimizer(
        SimpleNamespace(opt="sgd", sgd_momentum=0.9, sgd_nesterov=False,
                        weight_decay=5e-4, grad_clip=1.1), mask)
    state = TrainState(params, {}, tx.init(params))
    state = replicate_state(state, mesh)

    def loss_fn(p, batch_stats, batch, step_rng):
        logits = model.apply({"params": p}, batch["qry_rgb"])
        loss = loss_lib.cross_entropy(
            logits.reshape(-1, HW, HW, 2),
            batch["qry_msk"].reshape(-1, HW, HW))
        return loss, (batch_stats, {})

    step = make_train_step(loss_fn, tx, mesh)
    losses = []
    for i in range(STEPS):
        state, loss, _ = step(
            state, {"qry_rgb": qry, "qry_msk": msk}, LR,
            jax.random.PRNGKey(i))
        losses.append(float(loss))

    # ---- phase 2: PROCESS-LOCAL batches (host-sharded loader
    # semantics). Each rank holds only its strided slice of the global
    # batch; device_batch(process_local=True) assembles the global array
    # via make_array_from_process_local_data. Must reproduce the
    # full-global-batch run (the strided union per step is the same
    # episode set; means are permutation-invariant).
    local_qry = qry[rank::world]
    local_msk = msk[rank::world]
    state2 = TrainState(
        jax.tree_util.tree_map(jnp.asarray, params), {}, tx.init(params))
    state2 = replicate_state(state2, mesh)
    shard = batch_sharding(mesh)
    losses_local = []
    for i in range(STEPS):
        wire = device_batch({"qry_rgb": local_qry, "qry_msk": local_msk},
                            shard, process_local=(world > 1))
        if i == 0:
            # the assembled global batch must (a) give each rank back
            # exactly ITS local rows via local_rows (CaNet history
            # write-back relies on this alignment), and (b) equal the
            # process-major concat of every rank's strided slice
            np.testing.assert_array_equal(
                local_rows(wire["qry_rgb"]),
                local_qry.astype(np.float16))
            expect = np.concatenate(
                [qry[r::world] for r in range(world)]).astype(np.float16)
            np.testing.assert_array_equal(
                fetch_global(wire["qry_rgb"]), expect)
        state2, loss, _ = step(state2, wire, LR, jax.random.PRNGKey(i))
        losses_local.append(float(loss))
    flat_local = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state2.params))

    # ---- phase 3: DIVERGENT replicated put (unsharded multi-host train
    # loader semantics, e.g. CaNet: augmentation draws from the python-
    # global ``random`` stream, so each host's batch bytes differ). A
    # mesh-indivisible batch (B=3 on the 4-device mesh) takes the
    # replicate fallback; ``divergent_hosts=True`` must ship rank 0's
    # bytes to every process — stamping per-host-different bytes as
    # "replicated" would let GSPMD insert no sync and the worlds would
    # silently diverge for the rest of the run.
    div = np.random.RandomState(100 + rank).randn(
        3, 1, HW, HW, 3).astype(np.float32)
    wire3 = device_batch({"qry_rgb": div}, batch_sharding(mesh),
                         divergent_hosts=(world > 1))
    local_view = np.asarray(wire3["qry_rgb"].addressable_shards[0].data)
    rank0_bytes = np.random.RandomState(100).randn(
        3, 1, HW, HW, 3).astype(np.float32).astype(np.float16)
    divergent_put_ok = bool((local_view == rank0_bytes).all())

    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params))
    start, stop = process_episode_range(N_EPISODES)
    json.dump({
        "distributed": bool(distributed),
        "rank": int(rank),
        "world": int(world),
        "n_global_devices": jax.device_count(),
        "n_local_devices": jax.local_device_count(),
        "episode_range": [int(start), int(stop)],
        "losses": losses,
        "param_sum": float(sum(np.abs(leaf).sum() for leaf in flat)),
        "params": [leaf.ravel().tolist() for leaf in flat],
        "losses_local": losses_local,
        "params_local": [leaf.ravel().tolist() for leaf in flat_local],
        "divergent_put_ok": divergent_put_ok,
    }, open(out_path, "w"))


if __name__ == "__main__":
    main(sys.argv[1])
