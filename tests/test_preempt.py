"""Preemption-safe graceful stop: SIGTERM mid-epoch exits the training
loop through a final snapshot that resumes exactly at the interrupted
epoch's boundary (TPU maintenance events / spot reclaims deliver SIGTERM
with a short grace window; the reference loses the whole run —
SURVEY.md section 5.4)."""

import os
import signal
import types

import jax.numpy as jnp
import numpy as np

from pemp_tpu.core import checkpoint as ckpt_lib
from pemp_tpu.core.solver import LRPolicy
from pemp_tpu.core.trainer import GracefulStop, Trainer, TrainState


class _TrCfg:
    lr = 0.1
    lr_end = 0.001
    lrp = "poly"
    power = 0.9
    lr_rate = 0.1
    lr_step = 2
    lr_boundaries = (2, 4)
    lr_min_delta = 0.0
    lr_patience = 1
    cool_down = 0
    total_epochs = 3
    ckpt_epoch = 0


class _Run:
    _id = 7

    def log_scalar(self, *a, **k):
        pass


class _DS:
    def sample_tasks(self):
        pass


class _Eval:
    def start_eval_loop(self, ds, loader, n):
        return 0.0, np.array([0.5]), np.array([0.5])


def _cfg(tmp_path):
    g = types.SimpleNamespace(model_dir=str(tmp_path))
    return types.SimpleNamespace(tag="t", seed=0, g=g, tr=_TrCfg(),
                                 te=types.SimpleNamespace(epochs=1))


STEPS_PER_EPOCH = 4


def _mk_trainer(tmp_path, kill_at=None):
    cfg = _cfg(tmp_path)
    calls = {"n": 0}

    def train_step(state, batch, lr, rng):
        calls["n"] += 1
        if kill_at is not None and calls["n"] == kill_at:
            os.kill(os.getpid(), signal.SIGTERM)
        return state, jnp.float32(0.0), None

    lr_policy = LRPolicy(cfg.tr,
                         max_steps=STEPS_PER_EPOCH * cfg.tr.total_epochs)
    state = TrainState(params={"w": jnp.zeros((2,))}, batch_stats={},
                       opt_state={"m": jnp.zeros((2,))})
    trainer = Trainer(cfg, _Run(), state, train_step, lr_policy,
                      STEPS_PER_EPOCH)
    return trainer, calls


def _loader():
    return [{"cls": np.zeros(1)} for _ in range(STEPS_PER_EPOCH)]


def test_graceful_stop_install_restore():
    prev = signal.getsignal(signal.SIGTERM)
    stop = GracefulStop().install()
    assert signal.getsignal(signal.SIGTERM) is not prev
    assert not stop.requested
    os.kill(os.getpid(), signal.SIGTERM)
    assert stop.requested                 # handler fired, process alive
    stop.restore()
    assert signal.getsignal(signal.SIGTERM) is prev


def test_sigterm_mid_epoch_snapshots_boundary_state(tmp_path):
    # SIGTERM at global step 6 = epoch 2, step 2 (epochs are 4 steps)
    trainer, calls = _mk_trainer(tmp_path, kill_at=6)
    prev = signal.getsignal(signal.SIGTERM)
    trainer.start_training_loop(_DS(), _loader(), _Eval(), None, None, 2)

    assert trainer.preempted
    assert calls["n"] == 6                # broke right after the signal
    assert signal.getsignal(signal.SIGTERM) is prev   # handler restored

    path = trainer.model_dir / "ckpt.msgpack"
    assert path.exists()
    _, _, epoch, extra = ckpt_lib.load(path, trainer._variables(),
                                       trainer.state.opt_state)
    assert epoch == 1                     # last COMPLETED epoch

    # the snapshot's LR state is the epoch-2 BOUNDARY (4 steps), not the
    # mid-epoch position (6 steps): the replayed epoch re-steps exactly
    boundary = LRPolicy(_TrCfg(), max_steps=12)
    for _ in range(STEPS_PER_EPOCH):
        boundary.step_step()
    restored = LRPolicy(_TrCfg(), max_steps=12)
    restored.load_state_dict(extra["lr_policy"])
    assert restored.lr == boundary.lr
    assert restored.lr != trainer.lr_policy.lr   # live state is ahead

    # resume: a fresh trainer picks the run up at epoch 2
    trainer2, calls2 = _mk_trainer(tmp_path)
    assert trainer2.maybe_resume() == 1
    assert trainer2.lr_policy.lr == boundary.lr
    trainer2.start_training_loop(_DS(), _loader(), _Eval(), None, None, 2,
                                 resume=True)
    assert not trainer2.preempted
    assert calls2["n"] == 2 * STEPS_PER_EPOCH    # epochs 2..3 replayed
    _, _, epoch, _ = ckpt_lib.load(path, trainer2._variables(),
                                   trainer2.state.opt_state)
    assert epoch == 3


def test_multihost_boundary_catch_without_in_loop_sync(tmp_path, monkeypatch):
    """With fewer than STOP_SYNC_STEPS steps per epoch the in-loop
    world-OR never fires — the epoch-boundary agreement must catch the
    signal (otherwise a small-epoch pod ignores SIGTERM entirely)."""
    import jax

    from pemp_tpu.parallel import mesh as mesh_lib

    calls_flag = []

    def fake_any_process_flag(flag):
        calls_flag.append(bool(flag))
        return bool(flag)        # world-OR of one honest rank

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(mesh_lib, "any_process_flag", fake_any_process_flag)

    # SIGTERM at step 2 of epoch 1; 4-step epochs < STOP_SYNC_STEPS
    trainer, calls = _mk_trainer(tmp_path, kill_at=2)
    trainer.start_training_loop(_DS(), _loader(), _Eval(), None, None, 2)

    assert trainer.preempted
    assert calls["n"] == STEPS_PER_EPOCH      # epoch 1 ran to its boundary
    assert calls_flag == [True]               # exactly one boundary check
    _, _, epoch, _ = ckpt_lib.load(trainer.model_dir / "ckpt.msgpack",
                                   trainer._variables(),
                                   trainer.state.opt_state)
    assert epoch == 0                         # epoch 1 replays on resume


def test_sigterm_under_fused_launches_stops_at_chunk_boundary(tmp_path):
    """The fused multi-step loop (tpu.fuse_steps) polls the stop flag at
    CHUNK boundaries: a SIGTERM landing inside a fused launch lets that
    launch finish, breaks before the next one, and exits through the
    same epoch-boundary snapshot the serial loop writes."""
    trainer, calls = _mk_trainer(tmp_path)
    fused_calls = {"n": 0}

    def fused(state, chunk, lrs, rng, first_idx):
        fused_calls["n"] += 1
        if fused_calls["n"] == 3:    # epoch 2, chunk 1 (2 chunks/epoch)
            os.kill(os.getpid(), signal.SIGTERM)
        return state, np.zeros(len(chunk), np.float32)

    trainer.train_step_fused = fused
    trainer.fuse_steps = 2
    trainer.start_training_loop(_DS(), _loader(), _Eval(), None, None, 2)

    assert trainer.preempted
    assert fused_calls["n"] == 3      # broke right after the signal chunk
    assert calls["n"] == 0            # serial step never ran (no tail)
    path = trainer.model_dir / "ckpt.msgpack"
    _, _, epoch, extra = ckpt_lib.load(path, trainer._variables(),
                                       trainer.state.opt_state)
    assert epoch == 1                 # last COMPLETED epoch
    # boundary LR state (4 steps), not the mid-epoch 6-step position
    boundary = LRPolicy(_TrCfg(), max_steps=12)
    for _ in range(STEPS_PER_EPOCH):
        boundary.step_step()
    restored = LRPolicy(_TrCfg(), max_steps=12)
    restored.load_state_dict(extra["lr_policy"])
    assert restored.lr == boundary.lr


def test_preempted_result_finishes_run_as_interrupted(tmp_path):
    """cli.run_commandline records a preempted training run with the
    INTERRUPTED status (like ctrl-C), not COMPLETED — run records must
    distinguish resumable runs from finished ones."""
    from pemp_tpu.config import Config, Experiment
    from pemp_tpu.models import registry

    cfg = Config()
    cfg.net = registry.net_config("pemp_stage1")
    cfg.g.model_dir = str(tmp_path)
    ex = Experiment("t", cfg)
    statuses = []

    class _Obs:
        def log_scalar(self, *a):
            pass

        def finish(self, status, result):
            statuses.append((status, result))

    @ex.command("probe")
    def probe(cfg, run):
        run.observers.append(_Obs())
        return "PREEMPTED"

    ex.run_commandline(["probe", "with", "split=0", "-u"])
    assert statuses == [("INTERRUPTED", "PREEMPTED")]


def test_completed_run_is_not_marked_preempted(tmp_path):
    trainer, calls = _mk_trainer(tmp_path)
    trainer.start_training_loop(_DS(), _loader(), _Eval(), None, None, 2)
    assert not trainer.preempted
    assert calls["n"] == STEPS_PER_EPOCH * trainer.cfg.tr.total_epochs
