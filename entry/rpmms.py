#!/usr/bin/env python
"""RPMMs entry: residual prototype mixture models.

Counterpart of reference ``entry/rpmms.py``: the model owns its 3-term
loss (CE over the pyramid outputs upsampled to label size, reference
networks/rpmms.py:289-311) and predictions come from the final output
(get_pred :313-319). The EM's fresh random mu per forward becomes an
explicit ``pmm`` rng stream: folded per train step; a fixed key at eval
(deterministic eval, unlike the reference's unseeded randomness).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax

from pemp_tpu.config import Config, Experiment
from pemp_tpu.core.experiment import EntryRuntime
from pemp_tpu.core.losses import rpmms_loss
from pemp_tpu.models import registry
from pemp_tpu.models.common import output_resize

NAME = "rpmms"

base_cfg = Config(tag=NAME, ckpt="bestckpt.msgpack")
base_cfg.net = registry.net_config(NAME)
ex = Experiment(NAME, base_cfg)


class RPMMsRuntime(EntryRuntime):
    name = NAME

    def init_rngs(self):
        return {"params": jax.random.PRNGKey(self.cfg.seed),
                "pmm": jax.random.PRNGKey(self.cfg.seed + 1)}

    def apply_train(self, variables, batch, rng):
        outs, mutated = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=None, train=True,
            rngs={"dropout": rng, "pmm": jax.random.fold_in(rng, 99)},
            mutable=["batch_stats"])
        return outs, mutated, {}

    def compute_loss(self, outs, batch, aux):
        out_hw = tuple(batch["qry_msk"].shape[-2:])
        labels = batch["qry_msk"].reshape(-1, *out_hw)
        ups = [output_resize(o, out_hw) for o in outs]
        total, _, _ = rpmms_loss(ups, labels)
        return total

    def apply_eval(self, variables, batch):
        outs = self.model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=None, train=False,
            rngs={"pmm": jax.random.PRNGKey(0)})
        return outs[-1]     # final pyramid output drives the prediction


@ex.command
def train(cfg, run):
    return RPMMsRuntime(cfg, run).train()


@ex.command
def test(cfg, run):
    return RPMMsRuntime(cfg, run).test()


if __name__ == "__main__":
    ex.run_commandline()
