"""Entry runtime end-to-end on the REAL COCO-20i loader (miniature
on-disk tree): exercises the JSON index, the one-time filtered
file-list generation, the native polygon rasterizer, interleaved-split
episodic sampling, and the original-resolution test-GT protocol inside
the full train -> online eval -> auto-test chain (the loader tests
cover these pieces in isolation; SYNTH e2e never touches them)."""

import json

import numpy as np
import pytest

from pemp_tpu.data.coco import CV_SPLIT
from tests.fixtures import make_fake_coco


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_e2e")
    # ALL 80 categories, 2 images each: the entry chain samples freely
    # over the split's full class list (train = 60 cats from the other
    # 3 splits, val = this split's 20), so every class needs samples;
    # varied original sizes exercise the variable-size test-GT protocol
    make_fake_coco(root, cats=[c for s in range(4) for c in CV_SPLIT[s]],
                   per_cat=2, seed=3,
                   size=lambda cat, i: (56 + 2 * i, 72 + 4 * i))
    return root


def test_coco_train_then_autotest(coco_root, tmp_path):
    import entry.baseline as eb
    cfg, run = eb.ex.assemble("train", {
        "split": "0", "data.dataset": "COCO",
        "data.base_dir": str(coco_root), "data.height": "33",
        "data.width": "33", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "3", "data.num_workers": "2", "te.epochs": "1",
        "tr.total_epochs": "1", "net.backbone": "vgg16",
        "g.model_dir": str(tmp_path),
    })
    result = eb.BaselineRuntime(cfg, run).train()
    assert result is not None and "mIoU" in result

    # the one-time filtered file lists were generated on first load
    assert (coco_root / "train2014_list_16.json").exists()
    assert (coco_root / "val2014_list_0.json").exists()

    run_dir = tmp_path / cfg.tag / "1"
    assert (run_dir / "ckpt.msgpack").exists()
    metrics = json.loads((run_dir / "metrics.json").read_text())
    for key in ("train_loss", "val_loss", "val_mIoU", "val_bIoU"):
        assert key in metrics and len(metrics[key]) == 1
    assert np.all(np.isfinite(metrics["val_mIoU"][0]))
