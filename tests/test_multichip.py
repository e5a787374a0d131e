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


def test_weak_scaling_per_device_flops_divide():
    """The sharded train step actually DIVIDES compute across the mesh:
    XLA cost analysis of the SPMD-partitioned executable shows per-device
    FLOPs scaling as ~1/n at a fixed global batch (n = 1, 2, 8; PEMP-s1
    vgg16 at toy shapes to keep the three compiles cheap). This is the
    compile-time half of the multi-chip scaling story that no real
    multi-chip hardware is available to measure — GSPMD partitions the
    program, it does not replicate it."""
    from pemp_tpu.config import Config
    from pemp_tpu.core import solver as solver_lib
    from pemp_tpu.core.losses import cross_entropy
    from pemp_tpu.core.trainer import TrainState
    from pemp_tpu.models.pemp_stage1 import PEMPStage1
    from pemp_tpu.parallel.mesh import data_mesh
    from pemp_tpu.parallel.step import (device_batch, make_train_step,
                                        replicate_state)

    hw, bs = 33, 8   # fixed GLOBAL batch; per-device batch = 8/n
    model = PEMPStage1(backbone="vgg16", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    host_batch = {
        "sup_rgb": rng.randn(bs, 1, hw, hw, 3).astype(np.float32),
        "sup_mask": np.concatenate([
            np.ones((bs, 1, hw, hw, 1), np.float32),
            np.zeros((bs, 1, hw, hw, 1), np.float32)], axis=-1),
        "qry_rgb": rng.randn(bs, 1, hw, hw, 3).astype(np.float32),
        "qry_msk": rng.randint(0, 2, (bs, 1, hw, hw)).astype(np.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(host_batch["sup_rgb"][:1]),
        jnp.asarray(host_batch["sup_mask"][:1]),
        jnp.asarray(host_batch["qry_rgb"][:1]), out_hw=None)
    cfg = Config()
    tx, opt_state, _, _ = solver_lib.get(
        cfg.tr, variables["params"], [], max_steps=10)

    def loss_fn(params, batch_stats, dbatch, rng):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            dbatch["sup_rgb"], dbatch["sup_mask"], dbatch["qry_rgb"],
            out_hw=(hw, hw), train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        labels = dbatch["qry_msk"].reshape(-1, hw, hw)
        loss = cross_entropy(logits.reshape(-1, hw, hw, 2), labels)
        return loss, (mutated.get("batch_stats", batch_stats), {})

    def per_device_flops(n):
        mesh = data_mesh(n) if n > 1 else None
        state = TrainState(variables["params"],
                           variables.get("batch_stats", {}), opt_state)
        step = make_train_step(loss_fn, tx, mesh)
        if mesh is not None:
            state = replicate_state(state, mesh)
        dbatch = device_batch(host_batch, step.sharding)
        compiled = step.jit_step.lower(
            state, dbatch, jnp.float32(0.1), jax.random.PRNGKey(1)
        ).compile()
        cost = compiled.cost_analysis()
        return (cost[0] if isinstance(cost, list) else cost)["flops"]

    f1 = per_device_flops(1)
    for n in (2, 8):
        fn = per_device_flops(n)
        # conv/matmul flops divide exactly; collectives add bytes, not
        # flops — allow 15% for partitioner padding and psum adds
        np.testing.assert_allclose(fn, f1 / n, rtol=0.15)


def test_weak_scaling_eval_per_device_flops_divide():
    """Eval-side twin of the train weak-scaling test: the fast-eval
    program (feature-res forward -> align-corners resize -> argmax ->
    TP/FP/FN counts, core/experiment.py make_fast_eval_step) also
    partitions — per-device FLOPs of the compiled SPMD executable
    divide by the mesh size at a fixed global eval batch. Deployment
    serving/eval fan-out is the headline multi-chip use (bench.py's
    protocol), so its scaling story deserves the same compile-time
    evidence as the train step's."""
    from pemp_tpu.core.metrics import tp_fp_fn
    from pemp_tpu.models.common import output_resize
    from pemp_tpu.models.pemp_stage1 import PEMPStage1
    from pemp_tpu.parallel.mesh import data_mesh, replicate
    from pemp_tpu.parallel.step import device_batch

    hw, bs = 33, 8   # fixed GLOBAL eval batch; per-device = 8/n
    model = PEMPStage1(backbone="vgg16", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    host_batch = {
        "sup_rgb": rng.randn(bs, 1, hw, hw, 3).astype(np.float32),
        "sup_mask": np.concatenate([
            np.ones((bs, 1, hw, hw, 1), np.float32),
            np.zeros((bs, 1, hw, hw, 1), np.float32)], axis=-1),
        "qry_rgb": rng.randn(bs, 1, hw, hw, 3).astype(np.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(host_batch["sup_rgb"][:1]),
        jnp.asarray(host_batch["sup_mask"][:1]),
        jnp.asarray(host_batch["qry_rgb"][:1]), out_hw=None)

    def eval_fn(variables, batch):
        logits = model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"],
            batch["qry_rgb"], out_hw=None, train=False)
        logits = output_resize(logits, (hw, hw))
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        labels = jnp.zeros(pred.shape, jnp.int32)
        return jax.vmap(jax.vmap(tp_fp_fn))(pred, labels).sum(axis=1)

    def per_device_flops(n):
        mesh = data_mesh(n) if n > 1 else None
        v = (jax.device_put(variables, replicate(mesh))
             if mesh is not None else variables)
        from pemp_tpu.parallel.mesh import batch_sharding
        shard = batch_sharding(mesh) if mesh is not None else None
        dbatch = device_batch(host_batch, shard, compact_wire=False)
        compiled = jax.jit(eval_fn).lower(v, dbatch).compile()
        cost = compiled.cost_analysis()
        return (cost[0] if isinstance(cost, list) else cost)["flops"]

    f1 = per_device_flops(1)
    for n in (2, 8):
        fn = per_device_flops(n)
        np.testing.assert_allclose(fn, f1 / n, rtol=0.15)


def test_put_global_single_host_is_device_put():
    from pemp_tpu.parallel.mesh import batch_sharding, data_mesh, put_global
    mesh = data_mesh(8)
    v = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    a = put_global(v, batch_sharding(mesh))
    b = jax.device_put(v, batch_sharding(mesh))
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_put_global_shard_branch(monkeypatch):
    """The no-assert_equal branch (taken under real multi-host) builds
    the same sharded value device_put would, from addressable shards
    only, and canonicalizes dtypes like device_put does."""
    import pemp_tpu.parallel.mesh as mesh_lib
    mesh = mesh_lib.data_mesh(8)
    ref_batch = jax.device_put(np.zeros((16, 3), np.float32),
                               mesh_lib.batch_sharding(mesh))
    ref_rep = jax.device_put(np.zeros((16, 3), np.float32),
                             mesh_lib.replicate(mesh))
    monkeypatch.setattr(mesh_lib, "spans_processes", lambda m: True)
    v = np.arange(16 * 3, dtype=np.float64).reshape(16, 3)
    a = mesh_lib.put_global(v, mesh_lib.batch_sharding(mesh))
    assert a.dtype == jnp.float32          # canonicalized (x64 off)
    assert a.sharding.is_equivalent_to(ref_batch.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), v.astype(np.float32))
    b = mesh_lib.put_global(v, mesh_lib.replicate(mesh))
    assert b.sharding.is_equivalent_to(ref_rep.sharding, b.ndim)
    np.testing.assert_array_equal(np.asarray(b), v.astype(np.float32))


def test_put_global_verify_flag(monkeypatch):
    """PEMP_VERIFY_GLOBAL_PUTS: matching digests pass, a divergent rank
    raises instead of silently building a 'replicated' array whose
    shards differ."""
    import pemp_tpu.parallel.mesh as mesh_lib
    monkeypatch.setattr(mesh_lib, "spans_processes", lambda m: True)
    monkeypatch.setenv("PEMP_VERIFY_GLOBAL_PUTS", "1")
    mesh = mesh_lib.data_mesh(8)
    v = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)

    # world of 1: the allgather returns this rank's digest — equal, passes
    a = mesh_lib.put_global(v, mesh_lib.batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(a), v)

    # simulate a divergent peer: the gathered digests disagree
    from jax.experimental import multihost_utils
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda x, **kw: np.asarray([x, x + 1]))
    import pytest
    with pytest.raises(ValueError, match="differs across processes"):
        mesh_lib.put_global(v, mesh_lib.batch_sharding(mesh))

    # a DECLARED-divergent batch-sharded put skips the digest check:
    # per-host bytes legitimately differ (each global row has exactly
    # one owner), so the debug net must not false-positive on the
    # config it exists to debug (multi-host CaNet train batches)
    a = mesh_lib.put_global(v, mesh_lib.batch_sharding(mesh),
                            broadcast_replicated=True)
    np.testing.assert_array_equal(np.asarray(a), v)


def test_process_episode_range():
    from pemp_tpu.parallel.mesh import process_episode_range
    start, stop = process_episode_range(1000)
    assert (start, stop) == (0, 1000)   # single process owns everything


def test_process_episode_range_world4():
    """Disjoint cover of the global episode list across a 4-process
    world, including the uneven tail and empty trailing ranks."""
    from pemp_tpu.parallel.mesh import process_episode_range
    ranges = [process_episode_range(10, rank=r, world=4) for r in range(4)]
    assert ranges == [(0, 3), (3, 6), (6, 9), (9, 10)]
    ranges = [process_episode_range(2, rank=r, world=4) for r in range(4)]
    assert ranges == [(0, 1), (1, 2), (2, 2), (2, 2)]


def test_process_episode_indices_equal_length():
    """Equal-length wrap-padded rank shards (DistributedSampler
    semantics): unequal per-rank step counts would deadlock the
    synchronous GSPMD collectives on the uneven tail rank."""
    from pemp_tpu.parallel.mesh import process_episode_indices

    shards = [process_episode_indices(10, rank=r, world=4)
              for r in range(4)]
    assert [len(s) for s in shards] == [3, 3, 3, 3]   # EQUAL steps
    assert shards[2] == [2, 6, 0] and shards[3] == [3, 7, 1]  # tail wraps
    flat = [i for s in shards for i in s]
    assert set(flat) == set(range(10))                # full cover
    # divisible world: exact disjoint strided cover, no padding; each
    # global step's union is a contiguous run of the sampler stream
    shards = [process_episode_indices(8, rank=r, world=2)
              for r in range(2)]
    assert shards == [[0, 2, 4, 6], [1, 3, 5, 7]]
    assert process_episode_indices(0, rank=0, world=2) == []


def test_loader_shards_by_process(monkeypatch):
    """Rank-sharded loading for a faked 4-process world: every process's
    EpisodeLoader yields the SAME number of episodes (wrap-around padded
    — unequal counts deadlock multi-host collectives) and the union over
    all ranks covers every episode."""
    from pemp_tpu.config import Config
    from pemp_tpu.data import datasets
    from pemp_tpu.data.loader import EpisodeLoader

    cfg = Config(split=0, shot=1, query=1)
    cfg.data.dataset = "SYNTH"
    cfg.data.height = cfg.data.width = 17
    cfg.data.train_n = 10
    cfg.data.bs = 2
    ds, _, _ = datasets.load(cfg, "train")
    ds.sample_tasks()

    world = 4
    per_rank = []
    for rank in range(world):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(jax, "process_count", lambda: world)
        loader = EpisodeLoader(ds, batch_size=2, num_workers=2,
                               shard_by_process=True)
        got = [ep for batch in loader
               for ep in np.atleast_1d(batch["cls"])]
        per_rank.append(got)
    assert [len(g) for g in per_rank] == [3] * world   # equal steps
    assert len(loader) == 2                            # ceil(3/2) batches
    # 10 episodes + 2 wrap-padded repeats cover the global list
    all_cls = [c for g in per_rank for c in g]
    assert len(all_cls) == 12


def test_resolve_mesh(monkeypatch):
    """tpu.mesh resolution: auto keeps small single-host runs off the
    GSPMD path but must cover the whole world under multi-process (a
    process-local mesh would train divergent replicas silently)."""
    import pytest
    from pemp_tpu.parallel.mesh import resolve_mesh

    assert resolve_mesh(0) is None          # auto, single process
    assert resolve_mesh(1) is None
    assert resolve_mesh(4).size == 4
    assert resolve_mesh(-1).size == len(jax.devices())

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert resolve_mesh(0).size == len(jax.devices())   # auto -> world
    assert resolve_mesh(-1).size == len(jax.devices())
    with pytest.raises(ValueError):         # partial mesh under multi-host
        resolve_mesh(4)
    with pytest.raises(ValueError):         # no mesh under multi-host
        resolve_mesh(1)


def test_device_batch_keeps_mismatched_gt_on_host():
    """Variable-size eval GT that happens to stack (same original
    resolution != input size) must stay host-side: the bucket/host eval
    paths index it on host, which a globally-sharded device array
    refuses under multi-host."""
    from pemp_tpu.parallel.mesh import batch_sharding, data_mesh
    from pemp_tpu.parallel.step import device_batch

    rgb = np.zeros((4, 1, 9, 9, 3), np.float32)
    gt = np.zeros((4, 1, 7, 5), np.uint8)        # original-res GT
    out = device_batch({"qry_rgb": rgb, "qry_msk": gt},
                       batch_sharding(data_mesh(4)))
    assert "qry_msk" not in out                   # left on host
    assert isinstance(out["qry_rgb"], jax.Array)

    matched = np.zeros((4, 1, 9, 9), np.uint8)    # input-res GT
    out = device_batch({"qry_rgb": rgb, "qry_msk": matched},
                       batch_sharding(data_mesh(4)))
    assert isinstance(out["qry_msk"], jax.Array)


def test_snapshots_are_rank0_only(monkeypatch, tmp_path):
    """Non-rank-0 processes must not write checkpoints: they would dump
    redundant copies into <model_dir>/None and collide on the same
    timestamped filename on shared pod storage."""
    from pemp_tpu.config import Config
    from pemp_tpu.core.trainer import Trainer, TrainState
    from types import SimpleNamespace

    cfg = Config(split=0, shot=1, query=1)
    cfg.g.model_dir = str(tmp_path)
    run = SimpleNamespace(_id=None, log_scalar=lambda *a, **k: None)
    state = TrainState({"w": np.zeros(2, np.float32)}, {}, None)
    lr_policy = SimpleNamespace(state_dict=lambda: {})
    tr = Trainer(cfg, run, state, train_step=None, lr_policy=lr_policy,
                 steps_per_epoch=1)

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert tr.try_snapshot(3, final=True) is None
    assert list(tmp_path.rglob("*.msgpack")) == []

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    path = tr.try_snapshot(3, final=True)
    assert path is not None and path.exists()


def test_broadcast_bytes_single_process():
    from pemp_tpu.parallel.mesh import broadcast_bytes_from_rank0
    assert broadcast_bytes_from_rank0(b"abc") == b"abc"
    assert broadcast_bytes_from_rank0(None) == b""


def test_launch_env_detection(monkeypatch):
    from pemp_tpu.parallel.mesh import _launch_env
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
                "TPU_WORKER_HOSTNAMES", "SLURM_JOB_NUM_NODES",
                "SLURM_NTASKS"):
        monkeypatch.delenv(var, raising=False)
    assert _launch_env() is None

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    assert _launch_env() is None           # single-host slice
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert _launch_env() == "auto"
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")

    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    import pytest
    with pytest.raises(RuntimeError):      # incomplete explicit config
        _launch_env()
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "0")
    assert _launch_env() == "explicit"


def _tiny_trainer(tmp_path):
    from pemp_tpu.config import Config
    from pemp_tpu.core.trainer import Trainer, TrainState
    from types import SimpleNamespace

    cfg = Config(split=0, shot=1, query=1)
    cfg.g.model_dir = str(tmp_path)
    run = SimpleNamespace(_id=None, log_scalar=lambda *a, **k: None)
    state = TrainState({"w": np.zeros(2, np.float32)}, {}, None)
    lr_policy = SimpleNamespace(state_dict=lambda: {})
    return Trainer(cfg, run, state, train_step=None, lr_policy=lr_policy,
                   steps_per_epoch=1)


def test_maybe_resume_rank0_read_error_raises(monkeypatch, tmp_path):
    """A rank-0 checkpoint READ error must raise on EVERY rank: an empty
    byte broadcast alone would silently restart the whole world from
    scratch despite a checkpoint being present (the live 2-process tests
    cover only the happy path)."""
    import pytest
    from pemp_tpu.parallel import mesh as mesh_lib

    tr = _tiny_trainer(tmp_path)
    tr.model_dir.mkdir(parents=True, exist_ok=True)
    (tr.model_dir / "ckpt.msgpack").write_bytes(b"present")
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    import pathlib

    def boom(self):
        raise OSError("disk error")
    monkeypatch.setattr(pathlib.Path, "read_bytes", boom)
    # identity: rank 0's own flag comes back to it
    monkeypatch.setattr(mesh_lib, "broadcast_scalar_from_rank0",
                        lambda v: v)
    with pytest.raises(RuntimeError, match="could not read"):
        tr.maybe_resume()

    # rank 1 holds no run dir and no error of its own — it must raise
    # purely from rank 0's broadcast failure flag
    monkeypatch.undo()
    tr = _tiny_trainer(tmp_path / "r1")
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(mesh_lib, "broadcast_scalar_from_rank0",
                        lambda v: 1)
    with pytest.raises(RuntimeError, match="could not read"):
        tr.maybe_resume()


def test_maybe_resume_multihost_no_ckpt_starts_fresh(monkeypatch,
                                                     tmp_path):
    """No checkpoint on rank 0: the empty broadcast means a clean fresh
    start (epoch 0) on every rank, no raise."""
    from pemp_tpu.parallel import mesh as mesh_lib

    for rank in (0, 1):
        tr = _tiny_trainer(tmp_path / f"r{rank}")
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(mesh_lib, "broadcast_scalar_from_rank0",
                            lambda v: 0)
        monkeypatch.setattr(mesh_lib, "broadcast_bytes_from_rank0",
                            lambda d: b"")
        assert tr.maybe_resume() == 0


def test_load_snapshot_broadcast_rank1(monkeypatch, tmp_path):
    """Non-rank-0 hosts restore snapshot weights purely from rank 0's
    byte broadcast (no filesystem access), and raise when the broadcast
    comes back empty (rank-0 miss)."""
    import pytest
    from types import SimpleNamespace

    from pemp_tpu.core import checkpoint as ckpt_lib
    from pemp_tpu.core import experiment as exp_lib

    weights = {"params": {"w": np.arange(4, dtype=np.float32)}}
    path = tmp_path / "snap.msgpack"
    ckpt_lib.save(path, weights)
    data = path.read_bytes()

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(exp_lib.mesh_lib, "broadcast_bytes_from_rank0",
                        lambda d: data)
    logger = SimpleNamespace(info=lambda *a, **k: None)
    target = {"params": {"w": np.zeros(4, np.float32)}}
    # cfg/exp_id/ckpt are rank-0-only inputs — rank 1 never touches them
    out = exp_lib.load_snapshot_broadcast(None, -1, "", target, logger)
    np.testing.assert_array_equal(out["params"]["w"],
                                  weights["params"]["w"])

    monkeypatch.setattr(exp_lib.mesh_lib, "broadcast_bytes_from_rank0",
                        lambda d: b"")
    with pytest.raises(FileNotFoundError):
        exp_lib.load_snapshot_broadcast(None, -1, "", target, logger)
