#!/usr/bin/env python
"""PANet entry: prototype alignment regularization.

Counterpart of reference ``entry/panet.py``: the train loss is
``CE + loss_coef * align_loss`` (reference :112); eval reports the main
CE and the aux loss separately.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from pemp_tpu.config import Config, Experiment
from pemp_tpu.core.experiment import EntryRuntime
from pemp_tpu.models import registry

NAME = "panet"

base_cfg = Config(tag=NAME, ckpt="bestckpt.msgpack")
base_cfg.net = registry.net_config(NAME)
ex = Experiment(NAME, base_cfg)


class PANetRuntime(EntryRuntime):
    name = NAME

    def apply_train(self, variables, batch, rng):
        out_hw = tuple(batch["qry_rgb"].shape[2:4])
        (logits, align), mutated = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=out_hw, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        return logits, mutated, {"align_loss": align}

    def compute_loss(self, logits, batch, aux):
        base = super().compute_loss(logits, batch, aux)
        return base + self.cfg.loss_coef * aux["align_loss"]

    def apply_eval(self, variables, batch):
        logits, _align = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=None, train=False)
        return logits


@ex.command
def train(cfg, run):
    return PANetRuntime(cfg, run).train()


@ex.command
def test(cfg, run):
    return PANetRuntime(cfg, run).test()


if __name__ == "__main__":
    ex.run_commandline()
