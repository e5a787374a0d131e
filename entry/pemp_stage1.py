#!/usr/bin/env python
"""PEMP stage-1 entry (meta-prototypes).

Counterpart of reference ``entry/pemp_stage1.py``: ``train`` / ``test`` /
``visualize`` commands; gradient-norm clip 1.1 during training
(reference :63); the ``visualize`` command dumps predictions + response
maps into ``http/static/`` for the result viewer (reference :170-219).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from pemp_tpu.config import Config, Experiment
from pemp_tpu.core.experiment import EntryRuntime
from pemp_tpu.models import registry

NAME = "pemp_stage1"

base_cfg = Config(tag=NAME, ckpt="bestckpt.msgpack")
base_cfg.net = registry.net_config(NAME)
base_cfg.tr.grad_clip = 1.1     # reference entry/pemp_stage1.py:63
ex = Experiment(NAME, base_cfg)


class Stage1Runtime(EntryRuntime):
    name = NAME

    def apply_visualize(self, variables, batch):
        """Forward with response maps (ret_ind) at feature resolution."""
        return self.eval_model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"],
            batch["qry_rgb"], out_hw=None, ret_ind=True, train=False)

    def visualize(self):
        from pemp_tpu.core.visualize import evaluate_and_save
        return evaluate_and_save(self)


@ex.command
def train(cfg, run):
    return Stage1Runtime(cfg, run).train()


@ex.command
def test(cfg, run):
    return Stage1Runtime(cfg, run).test()


@ex.command
def visualize(cfg, run):
    return Stage1Runtime(cfg, run).visualize()


if __name__ == "__main__":
    ex.run_commandline()
