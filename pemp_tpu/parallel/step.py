"""Jitted train/eval step factories (single-chip and sharded).

The entry layer supplies a ``loss_fn(params, batch_stats, batch, rng) ->
(loss, (new_batch_stats, aux))`` closure per model; this module wraps it
into a donated-state jitted train step (replacing the reference's
``Trainer.train_step`` + backward + ``optimizer.step`` sequence,
entry/baseline.py:55-62) and handles device placement / sharding of the
host batch.

Under a mesh, params/opt-state are replicated and batch arrays shard
their leading episode axis; GSPMD inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from pemp_tpu.core.solver import apply_updates
from pemp_tpu.core.trainer import TrainState
from pemp_tpu.parallel.mesh import (batch_sharding, put_global, replicate,
                                    spans_processes)

ARRAY_KEYS = ("sup_rgb", "sup_mask", "qry_rgb", "qry_msk",
              "history", "qry_prior")   # 'cls' stays host-side (metrics)

# Host->device wire format: images travel as f16 and masks as uint8 —
# 2.4x fewer bytes per step. On tunneled chips the H2D transfer dominates
# the train step (measured 14x), and even on a real TPU VM it halves the
# PCIe traffic. ``unpack_batch`` restores compute dtypes inside the jit.
WIRE_DTYPES = {
    "sup_rgb": np.float16, "qry_rgb": np.float16,
    "sup_mask": np.uint8, "qry_msk": np.uint8,
    "history": np.float16, "qry_prior": np.uint8,
    "cls": np.int32,
}
UNPACK_DTYPES = {
    "sup_rgb": jnp.float32, "qry_rgb": jnp.float32,
    "sup_mask": jnp.float32, "qry_msk": jnp.int32,
    "history": jnp.float32, "qry_prior": jnp.float32,
    "cls": jnp.int32,
}


def device_batch(batch: Dict, sharding=None, compact_wire: bool = True,
                 process_local: bool = False,
                 divergent_hosts: bool = False) -> Dict:
    """numpy batch -> device arrays (optionally sharded on episodes).
    Already-on-device arrays pass through untouched.

    ``divergent_hosts=True`` declares that the (non-process-local) host
    batch may differ byte-wise across processes — train-time augmentation
    draws from the python-global ``random`` stream, so an UNSHARDED train
    loader (``shard_train_loader=False``, e.g. CaNet) yields per-host-
    different pixels for the same episodes. Replicated placements then
    broadcast rank 0's bytes instead of trusting local ones (see
    ``put_global``); eval loaders replay an augmentation-free seeded
    stream and stay on the cheap equality-by-construction path.

    ``process_local=True`` declares the host arrays to be THIS process's
    shard of the global batch (rank-sharded loaders): under a multi-host
    mesh the global array is assembled from every process's local data
    (global batch = local_bs * process_count). With the default
    ``process_local=False`` the host array is the full global value,
    identical on every process (eval loaders replay the same seeded
    episode stream everywhere) — ``put_global`` then places each
    process's addressable rows (NOT ``jax.device_put``: its per-call
    cross-host value check is the allgather put_global exists to avoid).
    Confusing the two silently trains on a mix of half-read batches,
    hence the explicit flag."""
    multihost = sharding is not None and spans_processes(sharding.mesh)
    # variable-size eval GT that happens to stack (same original
    # resolution != input size) is host-side metric data: the bucket and
    # host-exact eval paths index it on host, which a non-addressable
    # globally-sharded array refuses — keep it off the device
    q, r = batch.get("qry_msk"), batch.get("qry_rgb")
    gt_mismatch = (isinstance(q, np.ndarray) and isinstance(r, np.ndarray)
                   and tuple(q.shape[-2:]) != tuple(r.shape[2:4]))
    out = {}
    for k in ARRAY_KEYS:
        if k not in batch:
            continue
        if k == "qry_msk" and gt_mismatch:
            continue
        v = batch[k]
        if isinstance(v, np.ndarray):
            if compact_wire and k in WIRE_DTYPES:
                v = v.astype(WIRE_DTYPES[k])
            if multihost and process_local:
                n_local = sharding.mesh.local_mesh.size
                if v.shape[0] % n_local != 0:
                    raise ValueError(
                        f"multi-host train batch: local batch {v.shape[0]} "
                        f"({k}) must divide the {n_local} local devices — "
                        "pick data.bs = k * local_device_count")
                # global batch = local batch x hosts. The explicit
                # global_shape is load-bearing: with global_shape=None
                # and local.shape[0] == a legal global size, jax treats
                # the LOCAL array as the full global value and quietly
                # builds a world-batch of local size.
                ratio = sharding.mesh.size // n_local
                gshape = (v.shape[0] * ratio,) + v.shape[1:]
                out[k] = jax.make_array_from_process_local_data(
                    sharding, v, gshape)
                continue
            s = sharding
            if s is not None and v.shape[0] % s.mesh.size != 0:
                # mesh-indivisible batches (test_bs=1 eval, tail batches)
                # cannot split their episode axis — replicate them over
                # the mesh instead of crashing device_put; the in-model
                # pallas shard_map gating already handles the compute side
                s = replicate(s.mesh)
            out[k] = put_global(v, s,
                                broadcast_replicated=divergent_hosts) \
                if s is not None else jnp.asarray(v)
        elif isinstance(v, jax.Array):
            out[k] = v
    return out


def unpack_batch(batch: Dict) -> Dict:
    """Traced: restore compute dtypes from the wire format (no-op cost
    under jit — fuses into the first consumers)."""
    return {k: (v.astype(UNPACK_DTYPES[k]) if k in UNPACK_DTYPES else v)
            for k, v in batch.items()}


def make_train_step(loss_fn: Callable, tx,
                    mesh: Optional[Mesh] = None,
                    compact_wire: bool = True,
                    divergent_hosts: bool = False) -> Callable:
    """Returns ``step(state, host_batch, lr, rng) -> (state, loss)``.
    ``divergent_hosts``: see ``device_batch`` (unsharded train loaders)."""

    def _step(state: TrainState, batch, lr, rng):
        batch = unpack_batch(batch)

        def lf(params):
            return loss_fn(params, state.batch_stats, batch, rng)

        (loss, (new_bs, aux)), grads = jax.value_and_grad(
            lf, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = apply_updates(state.params, updates, lr)
        return TrainState(params, new_bs, new_opt), loss, aux

    jit_step = jax.jit(_step, donate_argnums=(0,))
    shard = batch_sharding(mesh) if mesh is not None else None

    def step(state, host_batch, lr, rng):
        batch = device_batch(host_batch, shard, compact_wire,
                             divergent_hosts=divergent_hosts)
        return jit_step(state, batch, jnp.float32(lr), rng)

    # exposed for tooling (tools/bench_train_zoo.py lowers the inner jit
    # for XLA cost analysis; the wrapper itself is not a jax.stages object)
    step.jit_step = jit_step
    step.sharding = shard
    return step


def make_train_step_fused(loss_fn: Callable, tx, fuse_steps: int,
                          mesh: Optional[Mesh] = None,
                          compact_wire: bool = True,
                          divergent_hosts: bool = False,
                          with_aux: bool = False) -> Callable:
    """Multi-step fused launch: ``fused(state, host_batches, lrs, rng,
    first_idx) -> (state, losses[k])`` runs ``k = len(host_batches) ==
    fuse_steps`` train steps as ONE jitted ``lax.scan`` program.

    Why: each train step is a separate device launch in the serial loop,
    and per-launch dispatch/sync costs real wall time (measured 199
    device vs 170 wall eps/s on the flagship step — docs/DESIGN.md). The
    reference cannot amortize this (its loop syncs on ``loss.item()``
    every step, entry/baseline.py:55-62); on TPU the natural fix is to
    keep k steps device-resident. Numerics are the serial loop's exactly:
    the scan body is the same ``_step`` graph, per-step LR values arrive
    as a [k] vector, and the per-step rng is ``fold_in(rng, first_idx+j)``
    — the identical fold the serial loop applies.

    ``with_aux=True`` additionally stacks each step's aux dict as scan
    outputs and returns ``(state, losses[k], auxes)`` where every aux
    leaf gains a leading [k] axis. This is how runtimes with per-step
    HOST state ride the fused launch: CaNet's history write-back needs
    each step's feature-res query softmax, and its epoch-snapshot read
    semantics (pemp_tpu/data/history.py — write-backs only become
    visible at ``next_epoch()``, the reference's worker re-fork,
    reference entry/canet.py:137-140) make a chunk-boundary flush
    indistinguishable from per-step writes.

    Constraints: the caller must pass exactly ``fuse_steps`` batches
    (one compiled program; epoch tails run through the serial step);
    per-step host hooks (``post_step``) need ``with_aux`` + a
    chunk-boundary flush (``Trainer.post_chunk``)."""

    def _fused(state: TrainState, batches, lrs, rng, first_idx):
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *batches)
        idx = first_idx + jnp.arange(len(batches), dtype=jnp.int32)

        def body(st, xs):
            batch, lr, i = xs
            batch = unpack_batch(batch)
            step_rng = jax.random.fold_in(rng, i)

            def lf(params):
                return loss_fn(params, st.batch_stats, batch, step_rng)

            (loss, (new_bs, aux)), grads = jax.value_and_grad(
                lf, has_aux=True)(st.params)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            params = apply_updates(st.params, updates, lr)
            ys = (loss, aux) if with_aux else loss
            return TrainState(params, new_bs, new_opt), ys

        state, ys = jax.lax.scan(body, state, (stacked, lrs, idx))
        if with_aux:
            losses, auxes = ys
            return state, losses, auxes
        return state, ys

    jit_fused = jax.jit(_fused, donate_argnums=(0,))
    shard = batch_sharding(mesh) if mesh is not None else None
    warmed = [jax.process_count() == 1]

    def _warm_multihost(state, dev, lrs, rng, first_idx):
        """Compile on every rank FIRST, then barrier on the
        already-warmed context, so the fused program's first collective
        executes with the ranks aligned. Without this, the program's
        Gloo communicator context is created mid-run on the first
        execution; cross-rank COMPILE skew (4 ranks cold-compiling a
        k-step scan concurrently can differ by minutes on a loaded
        host) then exceeds the backend's hard 30s context-rendezvous
        window — the slow rank dies with DEADLINE_EXCEEDED and the
        rest hang forever inside the collective (observed live,
        stack-dumped: every rank wedged in the epoch-boundary
        allgather queued behind the poisoned fused program)."""
        from pemp_tpu.parallel.mesh import any_process_flag
        # CACHE-SHARING ASSUMPTION (load-bearing): this relies on
        # ``jit.lower(args).compile()`` populating the same executable
        # cache the subsequent ``jit_fused(*args)`` dispatch hits — true
        # for current jaxlib (the AOT path and the dispatch path share
        # the pjit C++ cache; validated live by the 4-proc fused test,
        # which wedges within 30s if a rank recompiles mid-run). If a
        # jax upgrade ever separates the AOT and dispatch caches, every
        # rank would silently recompile INSIDE the first real call —
        # after the barrier — reopening the Gloo rendezvous window this
        # function exists to close. ``fused()`` times the first real
        # call and logs loudly when it smells like a compile, so the
        # regression is visible before it wedges a production world.
        jit_fused.lower(state, dev, lrs, rng, first_idx).compile()
        any_process_flag(False)     # rides the init-time warmed context

    def fused(state, host_batches, lrs, rng, first_idx):
        if len(host_batches) != fuse_steps:
            raise ValueError(
                f"fused step compiled for {fuse_steps} batches, got "
                f"{len(host_batches)} — run epoch tails through the "
                "serial step")
        dev = tuple(device_batch(b, shard, compact_wire,
                                 divergent_hosts=divergent_hosts)
                    for b in host_batches)
        args = (state, dev, jnp.asarray(lrs, jnp.float32), rng,
                jnp.int32(first_idx))
        if not warmed[0]:
            warmed[0] = True
            import time
            _warm_multihost(*args)
            t0 = time.monotonic()
            out = jit_fused(*args)
            took = time.monotonic() - t0
            if took > 30.0:     # compile-scale, not execute-scale
                import logging
                logging.getLogger("pemp_tpu").warning(
                    "fused step: first post-warm dispatch took %.1fs — "
                    "the AOT compile may no longer share the dispatch "
                    "cache (see _warm_multihost); multi-host worlds "
                    "risk the mid-run Gloo rendezvous wedge", took)
            return out
        return jit_fused(*args)

    fused.jit_step = jit_fused
    fused.sharding = shard
    return fused


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    rep = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, rep), state)


class DevicePrefetcher:
    """Wraps a host batch iterator: a background thread device_puts the
    next batches while the current step computes, hiding the host->device
    transfer (which dominates the step on tunneled chips and costs real
    PCIe time on TPU VMs). The train step receives device-resident
    batches and skips its own transfer."""

    def __init__(self, loader, sharding=None, depth: int = 2,
                 compact_wire: bool = True, process_local: bool = False):
        self.loader = loader
        self.sharding = sharding
        self.depth = max(1, depth)
        self.compact_wire = compact_wire
        self.process_local = process_local

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def safe_put(item):
            # stop-aware: a blocking put would wedge the daemon thread
            # forever (holding device-resident batches) when the consumer
            # abandons the generator with the queue full
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return
                except queue.Full:
                    continue

        def produce():
            try:
                for host_batch in self.loader:
                    if stop.is_set():
                        return
                    dev = dict(host_batch)
                    dev.update(device_batch(host_batch, self.sharding,
                                            self.compact_wire,
                                            self.process_local))
                    safe_put(dev)
            except BaseException as e:
                safe_put(e)
                return
            safe_put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
