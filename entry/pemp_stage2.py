#!/usr/bin/env python
"""PEMP stage-2 entry: prior-enhanced cascade.

Counterpart of reference ``entry/pemp_stage2.py``: loads a FROZEN trained
stage-1 (config scope ``s1.{id,ckpt,tag}``, reference :39-42); every step
runs stage-1 -> argmax -> query prior channel -> stage-2 (reference
:58-65, :73-84). Gradient clip 1.1 applies only for the vgg16 backbone
(reference :80-82). Both stages run fused inside one jitted step on TPU.

Note on stage-1 mode: the reference leaves stage-1 in torch train mode
even at stage-2 test time (DropBlock active). Here stage-1 runs
train-mode (with dropout rngs) during training and deterministic eval
mode at test time.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import dataclasses

import jax
import jax.numpy as jnp

from pemp_tpu.config import Config, Experiment
from pemp_tpu.core.experiment import (EntryRuntime, INIT_HW,
                                      load_snapshot_broadcast)
from pemp_tpu.models import registry
from pemp_tpu.models.pemp_stage1 import PEMPStage1

NAME = "pemp_stage2"

base_cfg = Config(tag=NAME, ckpt="bestckpt.msgpack")
base_cfg.net = registry.net_config(NAME)
ex = Experiment(NAME, base_cfg)


class Stage2Runtime(EntryRuntime):
    name = NAME

    def __init__(self, cfg, run):
        if (cfg.net.backbone2 or cfg.net.backbone) == "vgg16":
            cfg.tr.grad_clip = 1.1      # reference :80-82
        super().__init__(cfg, run)
        self.stage1 = PEMPStage1(
            backbone=cfg.net.backbone, out_channels=cfg.net.out_channels,
            protos=cfg.net.protos, drop_rate=cfg.net.drop_rate,
            block_size=cfg.net.block_size, dist_scalar=cfg.net.dist_scalar,
            dtype=registry.DTYPES[cfg.tpu.precision])
        self.s1_variables = self._load_stage1()
        from pemp_tpu.ops.pallas.mpm import pallas_enabled
        if pallas_enabled(cfg):
            # custom-VJP kernels are safe inside the grad closure too
            # (the prior is argmax'd, so no cotangent reaches stage-1)
            self.stage1 = self.stage1.clone(use_pallas=True,
                                            pallas_mesh=self.mesh)
        self.stage1_eval = self.stage1

    def _load_stage1(self):
        cfg = self.cfg
        s, q, hw = cfg.shot, cfg.query, INIT_HW
        variables = self.stage1.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, s, hw, hw, 3)), jnp.zeros((1, s, hw, hw, 2)),
            jnp.zeros((1, q, hw, hw, 3)), out_hw=None)
        variables = {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}
        s1cfg = dataclasses.replace(cfg, tag=cfg.s1.tag or "pemp_stage1")
        # multi-host: rank 0 reads + broadcasts the snapshot bytes (the
        # other hosts may not share its run-dir filesystem)
        return load_snapshot_broadcast(s1cfg, cfg.s1.id, cfg.s1.ckpt,
                                       variables, self.logger,
                                       what="Stage-1 (frozen)")

    def _prior(self, batch, out_hw, train, rng):
        """Frozen stage-1 argmax prediction as the query prior channel."""
        kwargs = dict(out_hw=out_hw)
        if train:
            logits, _ = self.stage1.apply(
                self.s1_variables, batch["sup_rgb"], batch["sup_mask"],
                batch["qry_rgb"], train=True,
                rngs={"dropout": jax.random.fold_in(rng, 7)},
                mutable=["batch_stats"], **kwargs)   # mutations discarded
        else:
            logits = self.stage1_eval.apply(
                self.s1_variables, batch["sup_rgb"], batch["sup_mask"],
                batch["qry_rgb"], train=False, **kwargs)
        return jnp.argmax(logits, axis=-1).astype(jnp.float32)  # [B,Q,H,W]

    def example_inputs(self, hw: int):
        s, q = self.cfg.shot, self.cfg.query
        return (jnp.zeros((1, s, hw, hw, 3)), jnp.zeros((1, s, hw, hw, 2)),
                jnp.zeros((1, q, hw, hw, 3)), jnp.zeros((1, q, hw, hw)))

    def apply_train(self, variables, batch, rng):
        out_hw = tuple(batch["qry_rgb"].shape[2:4])
        prior = self._prior(batch, out_hw, True, rng)
        logits, mutated = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            prior, out_hw=out_hw, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        return logits, mutated, {}

    def apply_eval(self, variables, batch):
        out_hw = tuple(batch["qry_rgb"].shape[2:4])
        prior = self._prior(batch, out_hw, False, None)
        return self.eval_model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            prior, out_hw=None, train=False)

    def apply_visualize(self, variables, batch):
        out_hw = tuple(batch["qry_rgb"].shape[2:4])
        prior = self._prior(batch, out_hw, False, None)
        return self.eval_model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            prior, out_hw=None, ret_ind=True, train=False)


@ex.command
def train(cfg, run):
    return Stage2Runtime(cfg, run).train()


@ex.command
def test(cfg, run):
    return Stage2Runtime(cfg, run).test()


@ex.command
def visualize(cfg, run):
    from pemp_tpu.core.visualize import evaluate_and_save
    return evaluate_and_save(Stage2Runtime(cfg, run))


if __name__ == "__main__":
    ex.run_commandline()
