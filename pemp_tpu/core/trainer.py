"""Training / evaluation loop drivers.

Behavioral counterpart of reference ``core/base_trainer.py``:
- ``Evaluator.start_eval_loop`` (:59-102): fix the test sampler once, run
  ``te.epochs`` rounds of freshly drawn episode sets, accumulate
  mIoU/bIoU/loss per round, report the 5-round mean and FPS,
- ``Trainer.start_training_loop`` (:183-210): per-epoch task sampling,
  train steps with per-step/per-epoch LR stepping (:217-234), periodic
  ``ckpt`` snapshots, best-mIoU ``bestckpt`` tracking (:286-293), console +
  run-scalar logging (:296-308).

TPU-native differences:
- the step functions are jitted closures supplied by the entry layer
  (donated state, device-side loss); the loop never syncs per step — the
  loss stays an async device value until the epoch summary,
- the eval path keeps logits at feature resolution on device and does the
  final variable-size ``align_corners`` resize + argmax + CE on host with
  the exact-resize numpy twin (SURVEY.md section 7.3 "exact eval parity"),
- checkpoints include optimizer state (resume support).
"""

from __future__ import annotations

import os
import signal
import time
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import numpy as np
from flax import struct

from pemp_tpu.core import checkpoint as ckpt_lib
from pemp_tpu.core.metrics import Accumulator, FewShotMetric
from pemp_tpu.ops.resize import resize_bilinear_align_corners_np
from pemp_tpu.utils import loggers
from pemp_tpu.utils.timer import Timer

C = loggers.C


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


# multi-host graceful-stop agreement interval: every rank must call the
# world-OR collective on the same step schedule, so a preemption signal
# landing on ONE host stops the whole world at the same step boundary
STOP_SYNC_STEPS = 50


class GracefulStop:
    """Preemption-safe stop request.

    TPU maintenance events and spot/preemptible reclaims deliver SIGTERM
    with a short grace window; ``install()`` hooks SIGTERM + SIGUSR1 to
    set a flag that the training loop polls at step boundaries, so the
    run exits through a final snapshot instead of dying mid-step (the
    reference cannot resume at all — SURVEY.md section 5.4). ``restore()``
    puts the previous handlers back. Off the main thread (where Python
    forbids installing handlers) it degrades to a manual flag."""

    SIGNALS = ("SIGTERM", "SIGUSR1")

    def __init__(self):
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.requested = True

    def install(self):
        for name in self.SIGNALS:
            sig = getattr(signal, name, None)
            if sig is None:
                continue
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:      # not the main thread
                break
        return self

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()


def fetch_global(x) -> np.ndarray:
    """Multi-host-safe device->host fetch (lazy import: parallel/ pulls
    this module in at import time, so the top-level import would cycle)."""
    from pemp_tpu.parallel.mesh import fetch_global as _fetch
    return _fetch(x)


def host_ce_loss(logits: np.ndarray, labels: np.ndarray) -> float:
    """Mean CE with ignore 255, numpy (eval loss on variable-size GT)."""
    logits = logits.astype(np.float64)
    valid = labels != 255
    if not valid.any():
        return 0.0
    safe = np.where(valid, labels, 0).astype(np.int64)
    m = logits.max(axis=-1)
    logz = m + np.log(np.exp(logits - m[..., None]).sum(axis=-1))
    ll = np.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    return float(((logz - ll) * valid).sum() / valid.sum())


class Evaluator:
    """mode: EVAL_ONLINE (during training) or EVAL (final 5-round eval)."""

    def __init__(self, cfg, eval_step: Callable, val_labels,
                 mode: str = "EVAL", logger_name: Optional[str] = None):
        if mode not in ("EVAL_ONLINE", "EVAL"):
            raise ValueError(f"Not supported evaluation mode {mode}")
        self.cfg = cfg
        self.mode = mode
        self.eval_step = eval_step
        # optional fully-on-device path for fixed-size GT (set by the
        # entry runtime): batch -> (counts [B,2,3], losses [B])
        self.fast_step = None
        # optional batched on-device path for VARIABLE-size GT at
        # test_bs>1 (padded per-episode resize matmuls); bs=1 keeps the
        # host-exact path as the oracle
        self.bucket_step = None
        self.val_labels = list(val_labels)
        self.logger = loggers.get_global_logger(logger_name)

    @staticmethod
    def fmt(array):
        array = np.asarray(array)
        if array.ndim == 0:
            return f"{float(array):5.2f}"
        return "[" + ", ".join(f"{x:5.2f}" for x in array) + "]"

    @staticmethod
    def _fixed_size(batch) -> bool:
        """Query GT at input resolution -> the on-device path is exact.
        Variable-size GT arrives as a LIST of per-episode arrays; fixed
        size as one ndarray (host loader) or jax.Array (DevicePrefetcher
        already moved it to the device)."""
        q = batch.get("qry_msk")
        return (isinstance(q, (np.ndarray, jax.Array))
                and tuple(q.shape[-2:]) == tuple(batch["qry_rgb"].shape[2:4]))

    def _episode_metrics(self, logits_feat, batch, fs_metric):
        """Host tail: per-episode exact resize -> argmax -> loss/metrics.
        logits_feat: [B, Q, h, w, 2] device array."""
        logits_feat = np.asarray(fetch_global(logits_feat), np.float32)
        b, n_qry = logits_feat.shape[:2]
        qry_msk = batch["qry_msk"]
        losses = []
        for i in range(b):
            label = np.asarray(qry_msk[i])
            label = label.reshape((-1,) + label.shape[-2:])  # [Q, H', W']
            assert label.shape[0] == n_qry, \
                f"GT has {label.shape[0]} queries, logits have {n_qry}"
            for q in range(n_qry):
                lg = resize_bilinear_align_corners_np(
                    logits_feat[i, q], label.shape[-2:])     # [H', W', 2]
                pred = lg.argmax(axis=-1).astype(np.uint8)
                losses.append(host_ce_loss(lg, label[q]))
                fs_metric.update(pred[None], label[q][None],
                                 [batch["cls"][i]])
        return float(np.mean(losses))

    def start_eval_loop(self, dataset, loader, num_classes: int):
        dataset.reset_sampler()
        timer = Timer()
        accum = Accumulator(loss=[], miou=[], biou=[])
        n_episodes = 0   # FPS = episodes/s, correct for any test_bs

        for round_i in range(1, self.cfg.te.epochs + 1):
            fs_metric = FewShotMetric(num_classes)
            inner = Accumulator(loss=[])
            dataset.sample_tasks()
            for batch in loader:
                bs = len(np.atleast_1d(np.asarray(batch["cls"])))
                n_episodes += bs
                with timer.start():
                    if self.fast_step is not None \
                            and self._fixed_size(batch):
                        counts, losses = self.fast_step(batch)
                        fs_metric.update_counts(fetch_global(counts),
                                                batch["cls"])
                        loss = float(np.mean(fetch_global(losses)))
                    elif self.bucket_step is not None and bs > 1:
                        counts, losses = self.bucket_step(batch)
                        fs_metric.update_counts(fetch_global(counts),
                                                batch["cls"])
                        loss = float(np.mean(fetch_global(losses)))
                    else:
                        logits = self.eval_step(batch)
                        loss = self._episode_metrics(logits, batch,
                                                     fs_metric)
                inner.update(loss=loss)

            miou, miou_mean = fs_metric.mIoU(self.val_labels)
            biou, biou_mean = fs_metric.mIoU(self.val_labels, binary=True)
            self.logger.info(
                f"[round {round_i}/{self.cfg.te.epochs}] "
                f"mIoU: {self.fmt(miou * 100)} -> {self.fmt(miou_mean * 100)}"
                f"  |  bIoU: {self.fmt(biou * 100)} -> "
                f"{self.fmt(biou_mean * 100)}")
            accum.update(loss=inner.mean("loss"), miou=miou, biou=biou)

        if self.mode == "EVAL":
            miou_r, biou_r = accum.mean(["miou", "biou"], axis=0)
            miou_avg, biou_avg = accum.mean(["miou", "biou"])
            self.logger.info("-" * 21 + " Final Results " + "-" * 21)
            self.logger.info(
                f"| mIoU mean: {self.fmt(miou_r * 100)} ==> "
                f"{self.fmt(miou_avg * 100)}")
            self.logger.info(
                f"| bIoU mean: {self.fmt(biou_r * 100)} ==> "
                f"{self.fmt(biou_avg * 100)}")
            fps = n_episodes / timer.total if timer.total else 0.0
            self.logger.info(f"| speed: {fps:5.2f} FPS")
            self.logger.info("-" * 57)

        return accum.mean(["loss", "miou", "biou"])


class Trainer:
    def __init__(self, cfg, run, state: TrainState, train_step: Callable,
                 lr_policy, steps_per_epoch: int,
                 logger_name: Optional[str] = None):
        self.cfg = cfg
        self.run = run
        self.state = state
        self.train_step = train_step
        self.lr_policy = lr_policy
        self.steps_per_epoch = steps_per_epoch
        self.logger = loggers.get_global_logger(logger_name)

        self.do_ckpt = run._id is not None
        if self.do_ckpt:
            self.model_dir = Path(cfg.g.model_dir) / str(cfg.tag) / str(run._id)
        else:
            self.model_dir = Path(cfg.g.model_dir) / "None"

        self.best_iou = -1.0
        self.best_epoch = -1
        self.preempted = False
        self._epoch_counter = 0
        # optional hook: post_step(aux, batch) after every train step
        # (CaNet's history-mask write-back uses this)
        self.post_step = None
        # optional multi-step fused launch (parallel/step.py
        # make_train_step_fused): runs fuse_steps train steps as one
        # jitted lax.scan program; epoch tails fall back to train_step.
        # A runtime with a per-step host hook rides it by ALSO providing
        # post_chunk(auxes, batches) — the fused step then returns every
        # step's aux stacked on a leading [k] axis and the hook flushes
        # once per chunk (legal whenever the host state has
        # epoch-snapshot read semantics, e.g. the CaNet HistoryStore).
        self.train_step_fused = None
        self.post_chunk = None
        self.fuse_steps = 1
        nd = len(str(cfg.tr.total_epochs))
        self.template = (f"Epoch: {{:{nd}d}}/{{:{nd}d}}"
                         " | LR: {:.2e} | Train {:7.5f} | Val {:7.5f}"
                         " | mIoU {:5.2f} | bIoU {:5.2f} | Speed: {:.2f}it/s")

    # --- snapshots ------------------------------------------------------
    def _variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def _resume_extra(self, lr_state=None):
        """Trainer state that must survive resume: without it a resumed
        run restarts the LR schedule and lets a worse epoch overwrite
        bestckpt.msgpack. ``lr_state`` overrides the live LR-schedule
        state (a preemption snapshot records the interrupted epoch's
        BOUNDARY state so the replayed epoch re-steps it exactly once)."""
        return {"best_iou": self.best_iou, "best_epoch": self.best_epoch,
                "lr_policy": (self.lr_policy.state_dict()
                              if lr_state is None else lr_state)}

    def try_snapshot(self, epoch=-1, final=False, lr_state=None):
        if jax.process_index() != 0:
            return   # rank-0-only recording: other hosts would write
            #          redundant copies to <model_dir>/None (and collide
            #          on the same timestamped filename)
        if final:
            if not self.do_ckpt:
                self.model_dir.mkdir(parents=True, exist_ok=True)
                postfix = time.strftime("%y%m%d-%H%M%S")
                path = self.model_dir / f"ckpt-{postfix}.msgpack"
            else:
                path = self.model_dir / "ckpt.msgpack"
            ckpt_lib.save(path, self._variables(), self.state.opt_state,
                          epoch, extra=self._resume_extra(lr_state))
            self.logger.info(C.c(f" \\_/ Save checkpoint to {path}", C.OKGREEN))
            return path
        if self.do_ckpt and self.cfg.tr.ckpt_epoch > 0 \
                and epoch % self.cfg.tr.ckpt_epoch == 0:
            path = self.model_dir / "ckpt.msgpack"
            ckpt_lib.save(path, self._variables(), self.state.opt_state,
                          epoch, extra=self._resume_extra(lr_state))
            return path

    def maybe_resume(self) -> int:
        """Resume from ``ckpt.msgpack`` in this run dir if present.

        Multi-host: rank 0's run dir decides for the WHOLE world (only
        rank 0 records runs, so the other hosts have no resumable dir);
        its checkpoint bytes are broadcast so every rank restores the
        identical state and epoch — resuming only rank 0 would run
        different epoch-loop lengths per rank and deadlock the
        synchronous collectives."""
        path = self.model_dir / "ckpt.msgpack"
        src = str(path)
        if jax.process_count() == 1:
            if not path.exists():
                return 0
            data = path.read_bytes()
        else:
            from pemp_tpu.parallel.mesh import (
                broadcast_bytes_from_rank0, broadcast_scalar_from_rank0)
            data, err = None, ""
            if jax.process_index() == 0 and path.exists():
                try:
                    data = path.read_bytes()
                except OSError as e:
                    err = f": {e}"
            # a rank-0 READ error must raise on every rank — an empty
            # broadcast alone would silently restart the world from
            # scratch despite a checkpoint being present
            failed = broadcast_scalar_from_rank0(1 if err else 0)
            if failed:
                raise RuntimeError("rank 0 found a resume checkpoint "
                                   "but could not read it" + err)
            data = broadcast_bytes_from_rank0(data)
            if jax.process_index() != 0:
                src = "rank 0's broadcast checkpoint"
        if not data:
            return 0
        variables, opt_state, epoch, extra = ckpt_lib.load_bytes(
            data, self._variables(), self.state.opt_state)
        self.state = self.state.replace(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=opt_state if opt_state is not None
            else self.state.opt_state)
        self.best_iou = float(extra.get("best_iou", self.best_iou))
        self.best_epoch = int(extra.get("best_epoch", self.best_epoch))
        if "lr_policy" in extra:
            self.lr_policy.load_state_dict(extra["lr_policy"])
        self.logger.info(f"Resumed from {src} at epoch {epoch} "
                         f"(lr {self.lr_policy.lr:.2e}, "
                         f"best mIoU {self.best_iou:.4f})")
        return epoch

    # --- loop -----------------------------------------------------------
    def start_training_loop(self, train_ds, train_loader, evaluator,
                            val_ds, val_loader, num_classes,
                            resume: bool = False):
        timer = Timer()
        if self.do_ckpt:
            self.model_dir.mkdir(parents=True, exist_ok=True)

        start_epoch = self.maybe_resume() if resume else 0
        # keep the epoch task stream aligned with the resumed position
        for _ in range(start_epoch):
            train_ds.sample_tasks()

        profile_dir = os.environ.get("PEMP_PROFILE_DIR")
        stop = GracefulStop().install()
        world = jax.process_count()

        try:
            for epoch in range(start_epoch + 1, self.cfg.tr.total_epochs + 1):
                profiling = profile_dir and epoch == start_epoch + 2
                if profiling:
                    # profile the second epoch (first is compile-heavy)
                    jax.profiler.start_trace(profile_dir)
                # the interrupted epoch replays in full on resume, so a
                # preemption snapshot must carry the epoch-BOUNDARY LR
                # state, not the mid-epoch one
                boundary_lr = self.lr_policy.state_dict()
                train_ds.sample_tasks()
                losses = []
                n_steps = 0
                step_rng = jax.random.PRNGKey(self.cfg.seed + epoch)
                if self.train_step_fused is None:
                    for step_i, batch in enumerate(train_loader):
                        with timer.start():
                            rng = jax.random.fold_in(step_rng, step_i)
                            self.state, loss, aux = self.train_step(
                                self.state, batch, self.lr_policy.lr, rng)
                            losses.append(loss)
                            if self.post_step is not None:
                                self.post_step(aux, batch)
                        n_steps += 1
                        self.step_lr()
                        # graceful stop: single-process breaks at any
                        # step; multi-process agrees via a world-OR on a
                        # FIXED step schedule (the collective is
                        # synchronous — polling the local flag alone
                        # would desync the world)
                        if world == 1:
                            self.preempted = stop.requested
                        elif (step_i + 1) % STOP_SYNC_STEPS == 0:
                            from pemp_tpu.parallel.mesh import \
                                any_process_flag
                            self.preempted = any_process_flag(
                                stop.requested)
                        if self.preempted:
                            break
                else:
                    n_steps = self._run_epoch_fused(train_loader, step_rng,
                                                    losses, timer, stop,
                                                    world)

                if profiling:
                    jax.profiler.stop_trace()

                # epoch-boundary catch: with fewer than STOP_SYNC_STEPS
                # steps per rank the in-loop world-OR never fires, and a
                # signal landing during the epoch tail (eval/snapshot)
                # must not wait out another full epoch. Runs on every
                # rank exactly once per epoch (fixed schedule), so the
                # collective stays world-consistent.
                if not self.preempted:
                    if world == 1:
                        self.preempted = stop.requested
                    else:
                        from pemp_tpu.parallel.mesh import any_process_flag
                        self.preempted = any_process_flag(stop.requested)

                if self.preempted:
                    self.try_snapshot(epoch - 1, final=True,
                                      lr_state=boundary_lr)
                    self.logger.info(C.c(
                        f"Graceful stop inside epoch {epoch} — snapshot "
                        f"records completed epoch {epoch - 1}; resume with "
                        "`train with resume=True exp_id=<id>`", C.WARNING))
                    return

                # fused chunks append [k]-vector losses, serial steps
                # append scalars — flatten before the epoch mean
                train_loss = float(np.mean(np.concatenate(
                    [np.atleast_1d(np.asarray(x))
                     for x in jax.device_get(losses)]))) if losses else 0.0
                # it/s counts optimizer STEPS for both loop shapes (a
                # fused timer call covers fuse_steps of them)
                speed = n_steps / timer.total if timer.total else 0.0
                self.try_snapshot(epoch)
                mloss, miou, biou, best = self.evaluation(
                    epoch, evaluator, val_ds, val_loader, num_classes)
                self.lr_policy.step_epoch(monitor_value=mloss)
                self.log_result(epoch, train_loss, mloss, miou, biou, best,
                                speed)
                timer.reset()
        finally:
            stop.restore()

        # record the reached epoch: a later `resume=True` with a larger
        # total_epochs continues from here instead of restarting at 0
        self.try_snapshot(self.cfg.tr.total_epochs, final=True)

    def _run_epoch_fused(self, train_loader, step_rng, losses, timer,
                         stop, world) -> int:
        """One epoch through the fused multi-step launch: full chunks of
        ``fuse_steps`` batches run as one jitted lax.scan program, the
        epoch tail (fewer than fuse_steps batches left) runs through the
        serial ``train_step`` so the fused program compiles exactly once.
        Per-step LR values are drawn from the live schedule before the
        launch — the schedule sequence is identical to the serial loop's.
        Returns the number of optimizer steps taken. Preemption is polled
        at chunk boundaries (granularity fuse_steps instead of 1): the
        multi-host world-OR fires whenever the step count crosses a
        STOP_SYNC_STEPS multiple, which every rank computes identically
        (equal-length loaders, equal fuse_steps)."""
        if self.post_step is not None and self.post_chunk is None:
            raise RuntimeError(
                "fused multi-step launches cannot run a per-step host "
                "hook (post_step) — provide post_chunk(auxes, batches) "
                "for a chunk-boundary flush (requires epoch-snapshot "
                "read semantics on the host state)")
        n_steps = 0
        last_sync = 0
        it = iter(train_loader)
        # the flush of chunk i's aux is DEFERRED until chunk i+1 has
        # been dispatched: post_chunk's host fetch blocks on launch i
        # finishing, and fetching before the next dispatch would
        # serialize host transfer with device compute (measured -19% on
        # the CaNet chip row). Legal because write-backs only need to be
        # in the store before next_epoch(); write ORDER is preserved
        # (chunks flush in sequence, and the serial tail flushes any
        # pending chunk before its own per-step writes). Timer caveat:
        # chunk i's flush runs inside chunk i+1's timed window and the
        # epoch-final flush (below) runs outside any window, so per-
        # epoch it/s attributes each flush one chunk late and omits the
        # last — a known, cosmetic skew of ~one flush per epoch.
        pending = None
        while True:
            chunk = []
            for _ in range(self.fuse_steps):
                try:
                    chunk.append(next(it))
                except StopIteration:
                    break
            if not chunk:
                break
            with timer.start():
                if len(chunk) == self.fuse_steps:
                    lrs = []
                    for _ in chunk:
                        lrs.append(self.lr_policy.lr)
                        self.step_lr()
                    if self.post_chunk is not None:
                        self.state, ls, auxes = self.train_step_fused(
                            self.state, chunk, lrs, step_rng, n_steps)
                        if pending is not None:
                            self.post_chunk(*pending)
                        pending = (auxes, chunk)
                    else:
                        self.state, ls = self.train_step_fused(
                            self.state, chunk, lrs, step_rng, n_steps)
                    losses.append(ls)
                else:           # epoch tail: serial single steps
                    if pending is not None:
                        self.post_chunk(*pending)
                        pending = None
                    for j, batch in enumerate(chunk):
                        rng = jax.random.fold_in(step_rng, n_steps + j)
                        self.state, loss, aux = self.train_step(
                            self.state, batch, self.lr_policy.lr, rng)
                        losses.append(loss)
                        if self.post_step is not None:
                            self.post_step(aux, batch)
                        self.step_lr()
            n_steps += len(chunk)
            if world == 1:
                self.preempted = stop.requested
            elif (n_steps // STOP_SYNC_STEPS) > (last_sync
                                                 // STOP_SYNC_STEPS):
                from pemp_tpu.parallel.mesh import any_process_flag
                self.preempted = any_process_flag(stop.requested)
                last_sync = n_steps
            if self.preempted:
                break
        if pending is not None:     # epoch end (or preemption break)
            self.post_chunk(*pending)
        return n_steps

    def step_lr(self):
        self.lr_policy.step_step()

    def evaluation(self, epoch, evaluator, val_ds, val_loader, num_classes):
        mloss, miou, biou = evaluator.start_eval_loop(
            val_ds, val_loader, num_classes)
        miou = float(np.mean(miou))
        biou = float(np.mean(biou))
        best = False
        if miou > self.best_iou:
            self.best_iou, self.best_epoch = miou, epoch
            # rank-0-only like try_snapshot: a non-zero rank handed an
            # observed run must still not write checkpoint files
            if self.do_ckpt and jax.process_index() == 0:
                ckpt_lib.save(self.model_dir / "bestckpt.msgpack",
                              self._variables(), self.state.opt_state, epoch)
                best = True
        return mloss, miou, biou, best

    def log_result(self, epoch, train_loss, val_loss, val_miou, val_biou,
                   best, speed, **extra):
        msg = self.template.format(
            epoch, self.cfg.tr.total_epochs, self.lr_policy.lr, train_loss,
            val_loss, val_miou * 100, val_biou * 100, speed)
        self.logger.info(C.c(msg + " (best)" * best, C.BOLD))
        self.run.log_scalar("train_loss", train_loss, epoch)
        self.run.log_scalar("val_loss", val_loss, epoch)
        self.run.log_scalar("val_mIoU", val_miou, epoch)
        self.run.log_scalar("val_bIoU", val_biou, epoch)
        for k, v in extra.items():
            self.run.log_scalar(k, float(v), epoch)
