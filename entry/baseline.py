#!/usr/bin/env python
"""Baseline entry: masked-average-prototype few-shot segmentation.

Counterpart of reference ``entry/baseline.py``: commands ``train`` (which
auto-runs ``test`` under the same run id) and ``test``; config surface
``tag/shot/query/split/seed/ckpt/exp_id/loss/sigma`` plus the scoped
``g/tpu/data/net/tr/te`` namespaces, overridable as
``python entry/baseline.py train with split=0 net.backbone=vgg16``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from pemp_tpu.config import Config, Experiment
from pemp_tpu.core.experiment import EntryRuntime
from pemp_tpu.models import registry

NAME = "baseline"

base_cfg = Config(tag=NAME, ckpt="bestckpt.msgpack")
base_cfg.net = registry.net_config(NAME)
ex = Experiment(NAME, base_cfg)


class BaselineRuntime(EntryRuntime):
    name = NAME


@ex.command
def train(cfg, run):
    return BaselineRuntime(cfg, run).train()


@ex.command
def test(cfg, run):
    return BaselineRuntime(cfg, run).test()


if __name__ == "__main__":
    ex.run_commandline()
