"""COCO-20i golden seeded-sampler test against the REFERENCE constants.

The exact reproducibility-gate values from the reference
(data_kits/coco_test.py:57-73): with the test sampler seed, split=0,
the first five test episodes must be these (class, support image id,
query image id) triples. Requires the real COCO dataset on disk;
skipped otherwise (portable sampler-stream goldens: tests/test_sampler.py,
miniature on-disk loader e2e: tests/test_coco_loader.py).
"""

from pathlib import Path

import pytest

from pemp_tpu.config import Config
from pemp_tpu.models import registry

DATA_ROOT = Path("data/COCO")

# reference data_kits/coco_test.py:59-65 (class, support id, query id)
GOLDEN_FIRST_5 = [
    (19, [69914], [581501]),
    (6, [35594], [53345]),
    (11, [187348], [143445]),
    (6, [457217], [315352]),
    (12, [177489], [85803]),
]

pytestmark = pytest.mark.skipif(
    not (DATA_ROOT / "annotations").exists(),
    reason="COCO dataset not on disk")


def test_reference_golden_episodes():
    from pemp_tpu.data.coco import COCO20i

    cfg = Config()
    cfg.net = registry.net_config("baseline")
    cfg.data.dataset = "COCO"
    cfg.data.base_dir = str(DATA_ROOT)
    cfg.data.test_n = 1000
    ds = COCO20i(cfg, train=False, split=0, shot=1, query=1)
    ds.reset_sampler()
    ds.sample_tasks()
    for i, (cls, sup_ids, qry_ids) in enumerate(GOLDEN_FIRST_5):
        got_cls, names = ds.sampler.tasks[i]
        assert (got_cls, list(names[:1]), list(names[1:])) == \
            (cls, sup_ids, qry_ids), f"episode {i}"
