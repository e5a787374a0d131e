"""COCO-20i loader end-to-end on a generated miniature dataset:
JSON index + native polygon rasterization + file-list generation +
episodic sampling + augmentation, no pycocotools."""

import numpy as np
import pytest

from pemp_tpu.config import Config
from pemp_tpu.data.coco import CV_SPLIT, NEW_INDEX, COCO20i
from pemp_tpu.data.loader import EpisodeLoader
from pemp_tpu.models import registry
from tests.fixtures import make_fake_coco


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    # 4 categories (one per split), 3 images each, 60x80 with a box object
    make_fake_coco(root, cats=[CV_SPLIT[s][0] for s in range(4)],
                   per_cat=3, size=(60, 80))
    return root


def make_cfg(root):
    cfg = Config()
    cfg.net = registry.net_config("baseline")
    cfg.data.dataset = "COCO"
    cfg.data.base_dir = str(root)
    cfg.data.height = cfg.data.width = 33
    cfg.data.train_n = 4
    cfg.data.test_n = 3
    return cfg


def test_train_episodes(coco_root):
    cfg = make_cfg(coco_root)
    # only 4 of the 80 categories have samples in the fixture; pin the
    # sampler to one populated train class
    cfg.data.one_cls = CV_SPLIT[1][0]
    ds = COCO20i(cfg, train=True, split=0, shot=1, query=1)
    # split 0 held out -> train classes come from splits 1-3
    assert all(c not in CV_SPLIT[0] for c in ds.classes)
    # file-list generation ran and cached
    assert (coco_root / "train2014_list_16.json").exists()
    ds.sample_tasks()
    batch = next(iter(EpisodeLoader(ds, 2, num_workers=2, drop_last=True)))
    assert batch["sup_rgb"].shape == (2, 1, 33, 33, 3)
    assert batch["sup_mask"].shape == (2, 1, 33, 33, 2)
    assert set(np.unique(batch["sup_mask"])) <= {0.0, 1.0}
    assert batch["qry_msk"].shape == (2, 1, 33, 33)
    # episodes report the contiguous remapped class id (1..80)
    assert all(1 <= c <= 80 for c in batch["cls"])


def test_test_episodes_keep_original_gt_size(coco_root):
    cfg = make_cfg(coco_root)
    cfg.data.one_cls = CV_SPLIT[1][0]
    ds = COCO20i(cfg, train=False, split=1, shot=1, query=1)
    assert ds.classes == CV_SPLIT[1]
    ds.sample_tasks()
    ep = ds.get_episode(0)
    # query GT at the ORIGINAL image resolution (reference coco.py:341)
    assert ep["qry_msk"].shape == (1, 60, 80)
    assert ep["cls"] == NEW_INDEX[CV_SPLIT[1][0]]
    assert ep["sup_rgb"].shape == (1, 33, 33, 3)


def test_rasterized_mask_matches_polygon_box(coco_root):
    cfg = make_cfg(coco_root)
    ds = COCO20i(cfg, train=False, split=2, shot=1, query=1)
    cat = CV_SPLIT[2][0]
    img_id = ds.samples_by_class[cat][0]
    mask = np.array(ds.get_label(cat, img_id))
    assert mask.shape == (60, 80)
    assert set(np.unique(mask)) <= {0, 255}
    assert 25 * 30 * 0.8 < (mask == 255).sum() < 25 * 30 * 1.2
