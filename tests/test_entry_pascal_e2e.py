"""Entry runtime end-to-end on the REAL PASCAL-5i loader (miniature
on-disk VOC tree): every other e2e test drives SYNTH, so the
decode/augment/smart-crop pipeline, the variable-size test-GT protocol
(query GT stays at ORIGINAL resolution, reference pascal_voc.py:229),
and the episodic class-split sampling were never exercised inside the
full train -> eval -> auto-test chain."""

import json

import numpy as np
import pytest

from tests.fixtures import make_fake_voc


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_e2e")
    # varied ORIGINAL sizes: the eval protocol must resize logits to
    # each query's own GT resolution
    make_fake_voc(root, seed=7,
                  size=lambda cls, i: (48 + cls + 3 * i, 64 + 2 * i))
    return root


def test_pascal_train_then_autotest(voc_root, tmp_path):
    import entry.baseline as eb
    cfg, run = eb.ex.assemble("train", {
        "split": "0", "data.dataset": "PASCAL",
        "data.base_dir": str(voc_root), "data.height": "41",
        "data.width": "41", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "3", "data.num_workers": "2", "te.epochs": "1",
        "tr.total_epochs": "1", "net.backbone": "vgg16",
        "g.model_dir": str(tmp_path),
    })
    result = eb.BaselineRuntime(cfg, run).train()
    assert result is not None and "mIoU" in result

    run_dir = tmp_path / cfg.tag / "1"
    assert (run_dir / "ckpt.msgpack").exists()
    metrics = json.loads((run_dir / "metrics.json").read_text())
    for key in ("train_loss", "val_loss", "val_mIoU", "val_bIoU"):
        assert key in metrics and len(metrics[key]) == 1
    # val mIoU is a real number computed over variable-size GTs
    assert np.all(np.isfinite(metrics["val_mIoU"][0]))
