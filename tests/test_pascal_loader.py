"""PASCAL-5i loader end-to-end on a generated miniature dataset:
Binary_map_aug layout, class lists, augmentation + smart crop, and the
variable-size test-GT contract — without the real dataset."""

import numpy as np
import pytest

from pemp_tpu.config import Config
from pemp_tpu.data.loader import EpisodeLoader
from pemp_tpu.data.pascal import PascalVOC
from pemp_tpu.models import registry
from tests.fixtures import make_fake_voc


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    # classes 1-20, 3 samples each, both subsets, varied original sizes
    make_fake_voc(root, size=lambda cls, i: (50 + cls, 70 + i))
    return root


def make_cfg(root):
    cfg = Config()
    cfg.net = registry.net_config("baseline")
    cfg.data.dataset = "PASCAL"
    cfg.data.base_dir = str(root)
    cfg.data.height = cfg.data.width = 41
    cfg.data.train_n = 4
    cfg.data.test_n = 3
    cfg.data.cache = False
    return cfg


def test_train_contract_and_augmentation(voc_root):
    import random
    random.seed(0)
    cfg = make_cfg(voc_root)
    ds = PascalVOC(cfg, train=True, split=0, shot=1, query=1)
    assert sorted(ds.classes) == list(range(6, 21))   # split 0 held out
    ds.sample_tasks()
    batch = next(iter(EpisodeLoader(ds, 2, num_workers=2, drop_last=True)))
    assert batch["sup_rgb"].shape == (2, 1, 41, 41, 3)
    assert batch["sup_mask"].shape == (2, 1, 41, 41, 2)
    np.testing.assert_allclose(batch["sup_mask"].sum(-1), 1.0)
    assert batch["qry_msk"].shape == (2, 1, 41, 41)
    assert all(c in range(6, 21) for c in batch["cls"])
    # smart crop guarantees some foreground in the support crop
    assert batch["sup_mask"][..., 0].sum() > 0


def test_test_contract_variable_gt(voc_root):
    cfg = make_cfg(voc_root)
    ds = PascalVOC(cfg, train=False, split=2, shot=1, query=1)
    assert ds.classes == [11, 12, 13, 14, 15]
    ds.sample_tasks()
    ep = ds.get_episode(0)
    cls = ep["cls"]
    # query GT at ORIGINAL resolution (reference pascal_voc.py:229)
    assert ep["qry_msk"].shape[1] == 50 + cls
    assert ep["sup_rgb"].shape == (1, 41, 41, 3)
    assert set(np.unique(ep["qry_msk"])) <= {0, 1}


def test_seeded_stream_reproducible(voc_root):
    cfg = make_cfg(voc_root)
    a = PascalVOC(cfg, train=False, split=0, shot=1, query=1)
    b = PascalVOC(cfg, train=False, split=0, shot=1, query=1)
    a.sample_tasks()
    b.sample_tasks()
    assert a.sampler.tasks == b.sampler.tasks


def test_cached_labels_are_eagerly_decoded(voc_root):
    """The module-level PIL caches must only hold FULLY-DECODED images:
    Image.open is lazy, and two loader threads racing the first load of
    a shared lazy object crash inside PIL (PngImagePlugin load_end).
    Found by tools/bench_input.py with the default cache=True."""
    cfg = make_cfg(voc_root)
    cfg.data.cache = True
    ds = PascalVOC(cfg, train=True, split=0, shot=1, query=1)
    cls = ds.classes[0]
    name = ds.samples_by_class[cls][0]
    lab = ds.get_label(cls, name)
    assert getattr(lab, "im", None) is not None, "cached label is lazy"
    img = ds.get_image(name)
    assert getattr(img, "im", None) is not None, "cached image is lazy"
