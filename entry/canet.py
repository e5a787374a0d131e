#!/usr/bin/env python
"""CaNet entry: dense comparison + history-mask iterative refinement.

Counterpart of reference ``entry/canet.py``: every episode carries the
query's previous 1/8-resolution softmax prediction (``history_mask``);
after each train/eval step the new softmax is written back (reference
:77-80, :137-140). The reference mutates the dataset object across
DataLoader forks; this rebuild uses an explicit episode-keyed
``HistoryStore`` (pemp_tpu/data/history.py).

Train loss: CE on the feature-res logits bilinearly upsampled to the
label size (reference :109-112).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax.numpy as jnp
import numpy as np

from pemp_tpu.config import Config, Experiment
from pemp_tpu.core.experiment import EntryRuntime
from pemp_tpu.data.history import CaNetDataAdapter, HistoryStore
from pemp_tpu.data.loader import EpisodeLoader
from pemp_tpu.models import registry
from pemp_tpu.models.common import output_resize
from pemp_tpu.parallel.mesh import fetch_global

NAME = "canet"

base_cfg = Config(tag=NAME, ckpt="bestckpt.msgpack")
base_cfg.net = registry.net_config(NAME)
ex = Experiment(NAME, base_cfg)


def _softmax_np(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


class CaNetRuntime(EntryRuntime):
    name = NAME
    # Fast eval IS supported (r4): reads come from the round's epoch
    # snapshot (HistoryStore.next_epoch — the reference's worker
    # re-fork, reference entry/canet.py:137-140), so the fast step only
    # needs to return the feature-res logits for the write-back; the
    # metric math stays on device and eval episodes prefetch safely.
    supports_fast_eval = True
    # the history store is per-host memory and an episode can land on a
    # DIFFERENT host next epoch (tasks are resampled every epoch): a
    # rank-sharded loader would fragment the store, so every host loads
    # the full episode stream and writes back the full global batch
    shard_train_loader = False

    def __init__(self, cfg, run):
        super().__init__(cfg, run)
        h8 = (cfg.data.height - 1) // 8 + 1
        w8 = (cfg.data.width - 1) // 8 + 1
        self.h8, self.w8 = h8, w8
        self.store = HistoryStore(h8, w8, seed=cfg.seed)

    def wrap_data(self, ds, loader, train):
        adapter = CaNetDataAdapter(ds, self.store, train)
        wrapped = EpisodeLoader(
            adapter, loader.batch_size, loader.num_workers,
            loader.prefetch, loader.drop_last,
            # preserve the sharding flag of the loader being replaced;
            # EntryRuntime.train() then applies this class's
            # shard_train_loader=False policy (history consistency)
            shard_by_process=loader.shard_by_process)
        return adapter, wrapped

    def test(self):
        # the auto-test after train must start from virgin history like
        # a standalone `test` run (the store still holds eval_online
        # entries for the val split otherwise)
        self.store.clear()
        return super().test()

    def example_inputs(self, hw: int):
        s, q = self.cfg.shot, self.cfg.query
        f = (hw - 1) // 8 + 1
        return (jnp.zeros((1, s, hw, hw, 3)), jnp.zeros((1, s, hw, hw, 2)),
                jnp.zeros((1, q, hw, hw, 3)), jnp.zeros((1, q, f, f, 2)))

    def apply_train(self, variables, batch, rng):
        logits, mutated = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            batch["history"], out_hw=None, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        # aux: feature-res logits for the history write-back
        return logits, mutated, {"feat_logits": logits}

    def compute_loss(self, logits, batch, aux):
        out_hw = tuple(batch["qry_msk"].shape[-2:])
        up = output_resize(logits, out_hw)
        return super().compute_loss(up, batch, aux)

    def apply_eval(self, variables, batch):
        return self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            batch["history"], out_hw=None, train=False)

    def _write_history(self, feat_logits, batch):
        soft = _softmax_np(np.asarray(feat_logits, np.float32))
        for i in range(soft.shape[0]):
            for j, name in enumerate(batch["qry_names"][i]):
                self.store.put(batch["cls"][i], name, soft[i, j])

    def post_step(self, aux, batch):
        # shard_train_loader=False: batch names cover the FULL batch on
        # every host, so fetch the full logits (multi-host: allgather)
        self._write_history(fetch_global(aux["feat_logits"]), batch)

    def post_chunk(self, auxes, batches):
        # fused-launch flush (tpu.fuse_steps>1): the scan stacks every
        # step's feature-res logits on a leading [k] axis; flushing them
        # here IN STEP ORDER leaves the live store byte-identical to the
        # serial loop's per-step writes (last-write-wins for a sample
        # hit twice), and reads never see the difference — they come
        # from the epoch snapshot either way (data/history.py).
        feat = np.asarray(fetch_global(auxes["feat_logits"]), np.float32)
        for j, batch in enumerate(batches):
            self._write_history(feat[j], batch)

    def make_fast_eval_step(self):
        raw = super().make_fast_eval_step(with_logits=True)

        def step(batch):
            counts, losses, feat = raw(batch)
            # eval loaders are unsharded: names cover the full batch, so
            # gather the full logits for the write-back (multi-host:
            # allgather, on the main thread)
            self._write_history(
                np.asarray(fetch_global(feat), np.float32), batch)
            return counts, losses
        return step

    def make_bucketed_eval_step(self):
        # variable-size GT at test_bs>1 keeps the host-exact path: its
        # eval wrapper (make_eval_step) already carries the write-back
        return None

    def make_eval_step(self):
        raw = super().make_eval_step()

        def step(batch):
            logits = raw(batch)
            # eval loaders are unsharded (identical episode stream on
            # every host): batch names cover the FULL batch, so gather
            # the full logits before writing history. Return the gathered
            # numpy value — the evaluator's metric tail re-fetches its
            # input, and handing it the device array would pay the
            # cross-host allgather a second time for identical bytes.
            gathered = np.asarray(fetch_global(logits), np.float32)
            self._write_history(gathered, batch)
            return gathered
        return step


@ex.command
def train(cfg, run):
    return CaNetRuntime(cfg, run).train()


@ex.command
def test(cfg, run):
    return CaNetRuntime(cfg, run).test()


if __name__ == "__main__":
    ex.run_commandline()
