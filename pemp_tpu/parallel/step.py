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

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from pemp_tpu.core.solver import apply_updates
from pemp_tpu.core.trainer import TrainState
from pemp_tpu.parallel.mesh import batch_sharding, replicate

ARRAY_KEYS = ("sup_rgb", "sup_mask", "qry_rgb", "qry_msk", "cls",
              "history", "qry_prior")


def device_batch(batch: Dict, sharding=None) -> Dict:
    """numpy batch -> device arrays (optionally sharded on episodes)."""
    out = {}
    for k in ARRAY_KEYS:
        if k in batch and isinstance(batch[k], np.ndarray):
            out[k] = jax.device_put(batch[k], sharding) \
                if sharding is not None else jnp.asarray(batch[k])
    return out


def make_train_step(loss_fn: Callable, tx,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Returns ``step(state, host_batch, lr, rng) -> (state, loss)``."""

    def _step(state: TrainState, batch, lr, rng):
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
        batch = device_batch(host_batch, shard)
        return jit_step(state, batch, jnp.float32(lr), rng)

    return step


def make_eval_step(apply_fn: Callable, mesh: Optional[Mesh] = None) -> Callable:
    """Wrap a jittable ``apply_fn(variables, batch) -> outputs`` with
    device placement. Entries close over variables."""
    jit_apply = jax.jit(apply_fn)
    shard = batch_sharding(mesh) if mesh is not None else None

    def step(variables, host_batch):
        return jit_apply(variables, device_batch(host_batch, shard))

    return step


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    rep = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
