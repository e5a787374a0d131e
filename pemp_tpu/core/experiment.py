"""Entry-layer runtime: wires a model into train/test commands.

This is the glue the reference repeats across its 7 entry files
(entry/baseline.py etc.): dataset loading, model construction, solver,
trainer/evaluator, checkpoint discovery, and the train->auto-test chain
(reference entry/baseline.py:65-107). Model-specific behavior (losses
with auxiliaries, priors, history masks) is supplied through overridable
hooks.
"""

from __future__ import annotations

import sys
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pemp_tpu.core import losses as loss_lib
from pemp_tpu.core import solver as solver_lib
from pemp_tpu.core import checkpoint as ckpt_lib
from pemp_tpu.core.trainer import Evaluator, Trainer, TrainState
from pemp_tpu.data import datasets
from pemp_tpu.models import registry
from pemp_tpu.parallel import mesh as mesh_lib
from pemp_tpu.parallel.step import device_batch, make_train_step
from pemp_tpu.utils import loggers, misc

INIT_HW = 33    # params are spatial-size independent; init on tiny maps


def load_snapshot_broadcast(cfg, exp_id, ckpt, variables, logger,
                            what="Model"):
    """``find_snapshot`` + restore, multi-host-safe. Rank 0 owns the run
    dirs (rank-0-only recording) and the other hosts may not share its
    filesystem: rank 0 reads the snapshot BYTES and broadcasts them so
    the whole world restores identical weights. Any rank-0 failure
    (missing file, bad path, IO error) broadcasts an empty payload first
    — every rank raises, instead of the others wedging inside the
    collective."""
    if jax.process_count() == 1:
        path = misc.find_snapshot(cfg, exp_id, ckpt)
        variables = ckpt_lib.load_variables(path, variables)
        logger.info(f"{what} initialized from {path}")
        return variables
    data, err = None, ""
    if jax.process_index() == 0:
        try:
            path = misc.find_snapshot(cfg, exp_id, ckpt)
            data = path.read_bytes()
            logger.info(f"{what} initialized from {path} "
                        "(broadcast to all hosts)")
        except (OSError, ValueError) as e:
            err = f": {e}"
    data = mesh_lib.broadcast_bytes_from_rank0(data)
    if not data:
        raise FileNotFoundError(
            f"rank 0 could not load a {what.lower()} snapshot" + err)
    return ckpt_lib.load_variables_bytes(data, variables)


class EntryRuntime:
    """One experiment run of a given model family."""

    name: str = "baseline"

    def __init__(self, cfg, run):
        self.cfg = cfg
        self.run = run
        self.logger = loggers.get_global_logger(self.name)
        self.model, self.frozen_patterns = registry.build(self.name, cfg)
        self.mesh = mesh_lib.resolve_mesh(cfg.tpu.mesh)
        # the loss needs the mesh: the cedt EDT kernel shard_maps over it
        self.loss_obj = loss_lib.get(cfg, mesh=self.mesh)
        # fused Pallas kernels on TPU for BOTH steps: eval runs the raw
        # forward kernels, the train step differentiates through the
        # custom-VJP wrappers (pemp_tpu/ops/pallas/mpm_vjp.py); under a
        # >1-device mesh the kernels shard_map over the batch axis
        # (pallas_mesh) since a bare pallas_call has no GSPMD rule.
        from pemp_tpu.ops.pallas.mpm import pallas_enabled
        if pallas_enabled(cfg) and hasattr(self.model, "use_pallas"):
            self.model = self.model.clone(use_pallas=True,
                                          pallas_mesh=self.mesh)
        self.eval_model = self.model

    # ---------------- hooks (override per model) -----------------------
    def example_inputs(self, hw: int) -> Tuple:
        """Positional model inputs for init (B=1, tiny spatial size)."""
        s, q = self.cfg.shot, self.cfg.query
        return (jnp.zeros((1, s, hw, hw, 3)),
                jnp.zeros((1, s, hw, hw, 2)),
                jnp.zeros((1, q, hw, hw, 3)))

    def init_rngs(self) -> Dict:
        return {"params": jax.random.PRNGKey(self.cfg.seed)}

    def wrap_data(self, ds, loader, train: bool):
        """Hook: wrap dataset/loader (CaNet's history adapter)."""
        return ds, loader

    post_step = None    # optional hook(aux, batch) after each train step
    # optional hook(auxes, batches) flushing a CHUNK of per-step aux at
    # fused-launch boundaries (every aux leaf carries a leading [k]
    # axis). A runtime that defines post_step AND post_chunk keeps its
    # per-step host state under tpu.fuse_steps>1 — legal whenever that
    # state has epoch-snapshot read semantics (CaNet's HistoryStore).
    post_chunk = None
    # fully-on-device eval for fixed-size GT; runtimes with per-episode
    # host side effects (CaNet history write-back) must disable it
    supports_fast_eval = True
    # Multi-host: rank-shard the train loader (each host loads its
    # strided slice of the episode stream). Runtimes with cross-episode
    # host state (CaNet's history store: an episode can land on a
    # DIFFERENT host next epoch, so per-host stores would fragment) set
    # this False — every host then loads the full stream and the global
    # batch is the plain replicated value.
    shard_train_loader = True

    def apply_train(self, variables, batch, rng):
        """Forward in train mode. Returns (logits [B,Q,H,W,2], mutated,
        aux_losses dict)."""
        logits, mutated = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=tuple(batch["qry_rgb"].shape[2:4]), train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        return logits, mutated, {}

    def apply_eval(self, variables, batch):
        """Forward in eval mode at FEATURE resolution (host resizes)."""
        return self.eval_model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=None, train=False)

    def compute_loss(self, logits, batch, aux: Dict):
        labels = batch["qry_msk"]
        labels = labels.reshape(-1, *labels.shape[-2:])
        logits = logits.reshape(-1, *logits.shape[-3:])
        return self.loss_obj(logits, labels)

    # ---------------- construction -------------------------------------
    def init_variables(self):
        # jit the init: one compiled executable instead of thousands of
        # eager op dispatches (pathologically slow on this backend)
        init_fn = jax.jit(lambda rngs, *args: self.model.init(rngs, *args))
        variables = init_fn(self.init_rngs(), *self.example_inputs(INIT_HW))
        variables = jax.tree_util.tree_map(np.asarray, variables)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.maybe_load_pretrained(params, batch_stats)
        return {"params": params, "batch_stats": batch_stats}

    def maybe_load_pretrained(self, params, batch_stats):
        """Backbone init from converted torchvision weights when present
        (reference loads resnet50-19c8e357.pth etc.; see
        pemp_tpu/utils/torch_convert.py)."""
        from pemp_tpu.utils import torch_convert
        torch_convert.try_load_backbone(
            self.name, self.cfg, params, batch_stats, self.logger)

    def make_loss_fn(self):
        def loss_fn(params, batch_stats, batch, rng):
            variables = {"params": params, "batch_stats": batch_stats}
            logits, mutated, aux = self.apply_train(variables, batch, rng)
            loss = self.compute_loss(logits, batch, aux)
            return loss, (mutated.get("batch_stats", batch_stats), aux)
        return loss_fn

    def make_eval_step(self):
        from pemp_tpu.parallel.step import unpack_batch
        jit_apply = jax.jit(lambda variables, batch:
                            self.apply_eval(variables, unpack_batch(batch)))
        shard = (mesh_lib.batch_sharding(self.mesh)
                 if self.mesh is not None else None)

        def step(batch):
            return jit_apply(self._variables, device_batch(
                batch, shard, self.cfg.tpu.compact_wire))
        return step

    def make_fast_eval_step(self, with_logits: bool = False):
        """Fully on-device eval for fixed-size GT: feature-res logits
        (any model's ``apply_eval``) -> align_corners resize -> argmax ->
        TP/FP/FN counts + per-episode CE, one small fetch per batch.
        The Evaluator uses this automatically when the query GT matches
        the input size (SYNTH, or bucketed real data); variable-size GT
        keeps the host-exact path.

        ``with_logits=True`` additionally returns the FEATURE-resolution
        logits (third element) — runtimes with a per-episode host side
        effect (CaNet's history write-back) wrap this to flush state
        while keeping the metric math on device."""
        from pemp_tpu.core.losses import per_episode_cross_entropy
        from pemp_tpu.core.metrics import tp_fp_fn
        from pemp_tpu.models.common import output_resize
        from pemp_tpu.parallel.step import unpack_batch

        def full(variables, wire_batch):
            batch = unpack_batch(wire_batch)
            feat = self.apply_eval(variables, batch)         # [B,Q,h,w,2]
            out_hw = tuple(batch["qry_rgb"].shape[2:4])
            logits = output_resize(feat, out_hw)             # [B,Q,H,W,2]
            labels = batch["qry_msk"]                        # [B,Q,H,W]
            b, nq = logits.shape[:2]
            lg = logits.reshape(b, nq, -1, 2)
            lb = labels.reshape(b, nq, -1)
            losses = per_episode_cross_entropy(lg, lb)
            # all Q queries contribute counts (same fg class per episode,
            # so TP/FP/FN simply add across the episode's queries)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B,Q,H,W]
            counts = jax.vmap(jax.vmap(tp_fp_fn))(pred, labels).sum(axis=1)
            if with_logits:
                return counts, losses, feat
            return counts, losses

        jit_full = jax.jit(full)
        shard = (mesh_lib.batch_sharding(self.mesh)
                 if self.mesh is not None else None)

        def step(batch):
            return jit_full(self._variables, device_batch(
                batch, shard, self.cfg.tpu.compact_wire))
        return step

    def make_bucketed_eval_step(self):
        """Batched fully-on-device eval for VARIABLE-size query GT —
        lifts the reference's test_bs=1 protocol constraint (reference
        data_kits/pascal_voc.py:229 forces bs=1 because each query GT
        keeps its original resolution).

        Each episode's exact ``align_corners`` resize to its own GT size
        is a pair of per-episode interpolation matmuls whose matrices are
        zero-padded to a bucketed [Hm, Wm] (static shapes for XLA; a few
        bucket sizes -> a few compilations). Padded label pixels are 255,
        which both the TP/FP/FN counts and the CE ignore, so the metrics
        are exactly the host path's (tests/test_bucketed_eval.py)."""
        from pemp_tpu.core.losses import per_episode_cross_entropy
        from pemp_tpu.core.metrics import tp_fp_fn
        from pemp_tpu.ops.resize import _interp_matrix
        from pemp_tpu.parallel.step import unpack_batch

        hi = jax.lax.Precision.HIGHEST

        def full(variables, wire_batch, rh, rw, labels):
            batch = unpack_batch(wire_batch)
            logits = self.apply_eval(variables, batch)      # [B,Q,h,w,2]
            logits = logits.astype(jnp.float32)
            up = jnp.einsum("bHh,bqhwc->bqHwc", rh, logits, precision=hi)
            up = jnp.einsum("bWw,bqHwc->bqHWc", rw, up, precision=hi)
            b, nq = up.shape[:2]
            losses = per_episode_cross_entropy(
                up.reshape(b, nq, -1, 2), labels.reshape(b, nq, -1))
            pred = jnp.argmax(up, axis=-1).astype(jnp.int32)
            counts = jax.vmap(jax.vmap(tp_fp_fn))(pred, labels).sum(axis=1)
            return counts, losses

        jit_full = jax.jit(full)
        shard = (mesh_lib.batch_sharding(self.mesh)
                 if self.mesh is not None else None)
        mats: Dict = {}
        feat_hw: Dict = {}

        def bucket(n, step=64):
            return -(-n // step) * step

        def step(batch):
            labels = [np.asarray(q) for q in batch["qry_msk"]]
            labels = [q.reshape((-1,) + q.shape[-2:]) for q in labels]
            b, nq = len(labels), labels[0].shape[0]
            wire = device_batch(batch, shard, self.cfg.tpu.compact_wire)

            sig = tuple(batch["qry_rgb"].shape)
            if sig not in feat_hw:                 # shapes only, no FLOPs
                out = jax.eval_shape(
                    lambda v, wb: self.apply_eval(v, unpack_batch(wb)),
                    self._variables, wire)
                feat_hw[sig] = out.shape[2:4]
            h, w = feat_hw[sig]

            hm = bucket(max(q.shape[-2] for q in labels))
            wm = bucket(max(q.shape[-1] for q in labels))
            rh = np.zeros((b, hm, h), np.float32)
            rw = np.zeros((b, wm, w), np.float32)
            lab = np.full((b, nq, hm, wm), 255, np.int32)
            for i, q in enumerate(labels):
                hh, ww = q.shape[-2:]
                if (hh, h) not in mats:     # setdefault would rebuild the
                    mats[(hh, h)] = _interp_matrix(h, hh)   # matrix eagerly
                if (ww, w) not in mats:
                    mats[(ww, w)] = _interp_matrix(w, ww)
                rh[i, :hh] = mats[(hh, h)]
                rw[i, :ww] = mats[(ww, w)]
                lab[i, :, :hh, :ww] = q
            # mesh-indivisible batches (test_bs tails) replicate, exactly
            # like device_batch just did for the wire arrays — a
            # batch-sharded put of an indivisible leading axis raises
            s = shard
            if s is not None and b % s.mesh.size != 0:
                s = mesh_lib.replicate(s.mesh)
            put = (lambda a: mesh_lib.put_global(a, s)) \
                if s is not None else jnp.asarray
            return jit_full(self._variables, wire,
                            put(rh), put(rw), put(lab))
        return step

    # ---------------- commands ------------------------------------------
    def train(self):
        cfg, run = self.cfg, self.run
        self.logger.info("Run: " + " ".join(sys.argv))
        misc.set_seed(cfg.seed)

        train_ds, train_loader, _ = datasets.load(cfg, "train")
        val_ds, val_loader, num_classes = datasets.load(cfg, "eval_online")
        train_ds, train_loader = self.wrap_data(train_ds, train_loader, True)
        if not self.shard_train_loader:
            train_loader.shard_by_process = False
        val_ds, val_loader = self.wrap_data(val_ds, val_loader, False)
        val_loader = self._maybe_prefetch_eval(val_loader)

        variables = self.init_variables()
        # per-PROCESS optimizer steps: the train loader is host-sharded,
        # so global train_n//bs would stretch per-step LR schedules by
        # process_count under multi-host
        steps_per_epoch = len(train_loader)
        max_steps = cfg.tr.total_epochs * steps_per_epoch
        tx, opt_state, lr_policy, _ = solver_lib.get(
            cfg.tr, variables["params"], self.frozen_patterns, max_steps)

        state = TrainState(variables["params"], variables["batch_stats"],
                           opt_state)
        if self.mesh is not None:
            from pemp_tpu.parallel.step import replicate_state
            state = replicate_state(state, self.mesh)

        # an UNSHARDED train loader (shard_train_loader=False, e.g.
        # CaNet's serial history pipeline) re-augments every episode on
        # every host through the python-global ``random`` stream, so its
        # host batches are NOT byte-equal across processes — replicated
        # placements (mesh-indivisible bs) must broadcast rank 0's bytes
        divergent = (not self.shard_train_loader
                     and jax.process_count() > 1)
        train_step = make_train_step(self.make_loss_fn(), tx, self.mesh,
                                     compact_wire=cfg.tpu.compact_wire,
                                     divergent_hosts=divergent)
        # overlap host->device transfer with compute (double-buffered);
        # tpu.prefetch=0 keeps the serial loader (debugging, A/B timing)
        # EXCEPT for a rank-sharded multi-host loader: only the
        # prefetcher path declares the host batch process-local for
        # global-batch assembly (an unsharded loader yields the full
        # replicated value, which the serial path places correctly)
        # a host-sharded train loader yields this process's SHARD of
        # the global batch (global = bs * world); an unsharded one
        # (shard_train_loader=False) yields the full value on every
        # host, which is plain replicated device_put semantics
        # multi-step fused launches (tpu.fuse_steps > 1): k train steps
        # per device launch via lax.scan — amortizes per-launch dispatch
        # (docs/DESIGN.md "Train-step device profile"). Runtimes with a
        # per-step host hook need a chunk-boundary flush (post_chunk) to
        # ride the scan — without one they keep the serial loop. Resolve
        # the EFFECTIVE fuse before sizing the prefetch queue — a runtime
        # that ignores the flag must not pin fuse_steps batches in HBM
        # for a loop that consumes one at a time.
        fuse = int(cfg.tpu.fuse_steps)
        if fuse > 1 and self.post_step is not None \
                and self.post_chunk is None:
            self.logger.info(
                "tpu.fuse_steps ignored: this runtime runs a "
                "per-step host hook (post_step) without a "
                "chunk-boundary flush (post_chunk)")
            fuse = 1
        # fused launches drain fuse_steps batches per launch: the
        # prefetch queue must hold a full chunk or the host stalls the
        # chunk assembly (the default depth=2 would burst-starve it)
        train_loader = self._maybe_prefetch(
            train_loader, process_local=self.shard_train_loader,
            force=jax.process_count() > 1 and self.shard_train_loader,
            divergent_hosts=divergent,
            depth=max(cfg.tpu.prefetch, fuse))
        trainer = Trainer(cfg, run, state, train_step, lr_policy,
                          steps_per_epoch, self.name)
        trainer.post_step = self.post_step
        if fuse > 1:
            from pemp_tpu.parallel.step import make_train_step_fused
            trainer.post_chunk = self.post_chunk
            trainer.train_step_fused = make_train_step_fused(
                self.make_loss_fn(), tx, fuse, self.mesh,
                compact_wire=cfg.tpu.compact_wire,
                divergent_hosts=divergent,
                with_aux=self.post_chunk is not None)
            trainer.fuse_steps = fuse
        self._variables = None   # bound lazily by eval step
        evaluator = self._make_evaluator("EVAL_ONLINE")

        # the evaluator reads the trainer's live state
        trainer_self = trainer

        def live_eval_step(batch):
            self._variables = {"params": trainer_self.state.params,
                               "batch_stats": trainer_self.state.batch_stats}
            return self._raw_eval_step(batch)

        self._raw_eval_step = self.make_eval_step()
        evaluator.eval_step = live_eval_step
        if self.supports_fast_eval:
            raw_fast = self.make_fast_eval_step()
            raw_bucket = self.make_bucketed_eval_step()

            def live_fast_step(batch):
                self._variables = {
                    "params": trainer_self.state.params,
                    "batch_stats": trainer_self.state.batch_stats}
                return raw_fast(batch)

            def live_bucket_step(batch):
                self._variables = {
                    "params": trainer_self.state.params,
                    "batch_stats": trainer_self.state.batch_stats}
                return raw_bucket(batch)

            # a runtime may opt out of one path (CaNet keeps the
            # host-exact path for variable-size GT: its eval wrapper
            # carries the history write-back)
            if raw_fast is not None:
                evaluator.fast_step = live_fast_step
            if raw_bucket is not None:
                evaluator.bucket_step = live_bucket_step

        self.logger.info("Start training.")
        trainer.start_training_loop(train_ds, train_loader, evaluator,
                                    val_ds, val_loader, num_classes,
                                    resume=cfg.resume)
        if trainer.preempted:
            # every rank agreed on the stop flag (world-OR on a fixed
            # step schedule), so skipping the auto-test chain here is
            # world-consistent — no rank is left inside its collectives
            self.logger.info(
                f"========== Training preempted (id {run._id}) ==========")
            return "PREEMPTED"
        self.logger.info(
            f"========== Ending training with id {run._id} ==========")
        rid = run._id if run._id is not None else -1
        if jax.process_count() > 1:
            # only rank 0 records runs/allocates ids, but the auto-test's
            # jitted eval programs contain collectives over the GLOBAL
            # mesh — every process must enter test() or the pod deadlocks
            rid = mesh_lib.broadcast_scalar_from_rank0(rid)
        if rid >= 0:
            self.cfg.exp_id = rid
            return self.test()

    def test(self):
        cfg = self.cfg
        misc.set_seed(cfg.seed)
        test_ds, test_loader, num_classes = datasets.load(cfg, "test")
        test_ds, test_loader = self.wrap_data(test_ds, test_loader, False)
        test_loader = self._maybe_prefetch_eval(test_loader)

        variables = self.init_variables()
        variables = self._load_test_snapshot(variables)
        self._variables = variables
        self._raw_eval_step = self.make_eval_step()

        evaluator = self._make_evaluator("EVAL")
        evaluator.eval_step = lambda batch: self._raw_eval_step(batch)
        if self.supports_fast_eval:
            # either may be None — a runtime's explicit opt-out of one
            # path (the Evaluator treats None as "use the next path")
            evaluator.fast_step = self.make_fast_eval_step()
            evaluator.bucket_step = self.make_bucketed_eval_step()
        self.logger.info("Start testing.")
        loss, miou, biou = evaluator.start_eval_loop(
            test_ds, test_loader, num_classes)
        miou, biou = float(np.mean(miou)), float(np.mean(biou))
        result = f"Loss: {loss:.4f}, mIoU: {miou * 100:.2f}, " \
                 f"bIoU: {biou * 100:.2f}"
        self.logger.info(result)
        return result

    def _load_test_snapshot(self, variables):
        cfg = self.cfg
        return load_snapshot_broadcast(cfg, cfg.exp_id, cfg.ckpt,
                                       variables, self.logger)

    def _maybe_prefetch(self, loader, process_local=False, force=False,
                        divergent_hosts=False, depth=None):
        """Wrap ``loader`` in the DevicePrefetcher (overlap host loading +
        H2D with device compute). ``tpu.prefetch=0`` keeps the serial
        loader (debugging, A/B timing) unless ``force`` — a rank-sharded
        multi-host train loader MUST go through the prefetcher because
        only its ``device_batch(process_local=True)`` path assembles the
        global batch from per-process shards.

        ``divergent_hosts`` (an unsharded multi-host train loader, whose
        replicated placements must BROADCAST rank 0's bytes — see
        ``put_global``) forces the serial loader: the broadcast is a
        collective, and issuing collectives from the prefetcher's
        background thread would interleave unpredictably with the main
        thread's collectives (stop-flag allgathers, eval fetches) in a
        different order on each rank — a world deadlock. The serial path
        places batches on the main thread in loop order, identical on
        every rank."""
        if divergent_hosts:
            return loader
        if self.cfg.tpu.prefetch <= 0 and not force:
            return loader
        from pemp_tpu.parallel.step import DevicePrefetcher
        shard = (mesh_lib.batch_sharding(self.mesh)
                 if self.mesh is not None else None)
        return DevicePrefetcher(loader, shard,
                                depth=depth or self.cfg.tpu.prefetch,
                                compact_wire=self.cfg.tpu.compact_wire,
                                process_local=process_local)

    def _maybe_prefetch_eval(self, loader):
        """Eval-side prefetch — the TPU-native analog of the reference's
        pinned-memory DataLoader at eval time. Safe even for CaNet's
        history-fed episodes: reads come from the round's epoch snapshot
        (HistoryStore.next_epoch — the reference's worker re-fork), so
        what a prefetched episode sees is independent of prefetch depth.
        A runtime that still cannot tolerate read-ahead opts out with
        ``supports_fast_eval=False``."""
        if not self.supports_fast_eval:
            return loader
        return self._maybe_prefetch(loader)

    def _make_evaluator(self, mode):
        val_labels = datasets.get_val_labels(self.cfg, self.cfg.split)
        return Evaluator(self.cfg, None, val_labels, mode, self.name)


def run_command(runtime_cls, command: str, cfg, run):
    rt = runtime_cls(cfg, run)
    return getattr(rt, command)()
