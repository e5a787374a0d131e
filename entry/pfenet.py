#!/usr/bin/env python
"""PFENet entry: training-free prior + feature enrichment.

Counterpart of reference ``entry/pfenet.py``: train loss is
``CE(main) + loss_coef * aux`` where aux is the mean per-scale CE over
the pyramid heads (reference :66-72, networks/pfenet.py:276-284).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from pemp_tpu.config import Config, Experiment
from pemp_tpu.core.experiment import EntryRuntime
from pemp_tpu.core.losses import pfenet_aux_loss
from pemp_tpu.models import registry

NAME = "pfenet"

base_cfg = Config(tag=NAME, ckpt="bestckpt.msgpack")
base_cfg.net = registry.net_config(NAME)
ex = Experiment(NAME, base_cfg)


class PFENetRuntime(EntryRuntime):
    name = NAME

    def apply_train(self, variables, batch, rng):
        out_hw = tuple(batch["qry_rgb"].shape[2:4])
        (out, aux_outs), mutated = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=out_hw, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        return out, mutated, {"aux_outs": aux_outs}

    def compute_loss(self, logits, batch, aux):
        labels = batch["qry_msk"]
        labels = labels.reshape(-1, *labels.shape[-2:])
        main = super().compute_loss(logits, batch, aux)
        return main + self.cfg.loss_coef * pfenet_aux_loss(
            aux["aux_outs"], labels)

    def apply_eval(self, variables, batch):
        out, _aux = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=None, train=False)
        return out


@ex.command
def train(cfg, run):
    return PFENetRuntime(cfg, run).train()


@ex.command
def test(cfg, run):
    return PFENetRuntime(cfg, run).test()


if __name__ == "__main__":
    ex.run_commandline()
