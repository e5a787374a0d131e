"""PASCAL-5i episodic dataset.

Behavioral counterpart of reference ``data_kits/pascal_voc.py``:
- 4x5 class split (``cv_split``, reference :13-16): split s holds out
  classes 5s+1..5s+5 for val; train uses the other 15,
- class sample lists from ``Binary_map_aug/{train,val}/<cls>.txt``
  (reference :151), images from ``JPEGImages``, binary masks from
  ``Binary_map_aug/{train,val}/<cls>/<name>.png`` (values {0, 255}),
- pre-sampled seeded episodes (pemp_tpu/data/sampler.py, identical draw
  semantics -> the golden seeded-sampler tests apply, reference
  pascal_voc_test.py:59-75),
- train episodes: support = random-scale (1-1.5x) resize + ColorJitter +
  shared-flag hflip + smart crop; query = fixed-size resize + jitter +
  flip; masks // 255 -> {0, 1}, support mask stacked as [fg, 1-fg]
  (reference :184-240),
- test episodes: deterministic resize; query GT left at its ORIGINAL
  resolution (reference :229 — the driver's variable-size eval contract).

Output is channels-last (TPU-native): see SyntheticDataset's contract.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List

import numpy as np
from PIL import Image

from pemp_tpu.data import transforms as T
from pemp_tpu.data.sampler import EpisodeSampler

CV_SPLIT = [[1, 2, 3, 4, 5],
            [6, 7, 8, 9, 10],
            [11, 12, 13, 14, 15],
            [16, 17, 18, 19, 20]]
CLASS_NAMES = [
    ["aeroplane", "bicycle", "bird", "boat", "bottle"],
    ["bus", "car", "cat", "chair", "cow"],
    ["diningtable", "dog", "horse", "motorbike", "person"],
    ["potted plant", "sheep", "sofa", "train", "tv/monitor"],
]

# keyed by (directory, name): bare names collide across dataset roots
# (e.g. two miniature trees in one test process) and across subsets
_image_cache: Dict[tuple, Image.Image] = {}
_label_cache: Dict[tuple, Image.Image] = {}


class PascalVOC:
    """Unified train/test dataset; ``train`` controls class split,
    episode count, seed and augmentation (reference has two classes)."""

    def __init__(self, cfg, train: bool, split: int, shot: int, query: int,
                 ret_name: bool = False):
        self.cfg = cfg
        self.train = train
        self.split = split
        self.shot = shot
        self.query = query
        self.ret_name = ret_name
        self.cache = cfg.data.cache
        self.height = cfg.data.height
        self.width = cfg.data.width

        base = Path(cfg.data.base_dir)
        self.img_dir = base / "JPEGImages"
        subset = "train" if train else "val"
        self.lab_dir = base / "Binary_map_aug" / subset

        if train:
            self.classes = sorted(
                set(range(1, 21)) - set(CV_SPLIT[split]))
            n, seed = cfg.data.train_n, cfg.data.seed
        else:
            self.classes = list(CV_SPLIT[split])
            n, seed = cfg.data.test_n, cfg.data.test_seed

        self.samples_by_class = {
            c: (self.lab_dir / f"{c}.txt").read_text().strip().splitlines()
            for c in self.classes}
        self.sampler = EpisodeSampler(
            self.classes, self.samples_by_class, n, shot, query, seed,
            one_cls=cfg.data.one_cls)

    # --- reference dataset surface -------------------------------------
    def reset_sampler(self):
        self.sampler.reset()

    def sample_tasks(self):
        self.sampler.sample_tasks()

    def __len__(self):
        return len(self.sampler)

    @property
    def num_classes(self):
        return 20

    # --- IO -------------------------------------------------------------
    def get_image(self, name: str) -> Image.Image:
        if self.cache:
            key = (str(self.img_dir), name)
            if key not in _image_cache:
                _image_cache[key] = Image.open(
                    self.img_dir / f"{name}.jpg").convert("RGB")
            return _image_cache[key]
        return Image.open(self.img_dir / f"{name}.jpg").convert("RGB")

    def get_label(self, cls: int, name: str) -> Image.Image:
        key = (str(self.lab_dir), cls, name)
        if self.cache:
            if key not in _label_cache:
                img = Image.open(self.lab_dir / str(cls) / f"{name}.png")
                # force the decode BEFORE publishing to the cache:
                # Image.open is lazy, and two loader threads racing the
                # first load of a shared lazy object crash in PIL's
                # load_end (found by tools/bench_input.py with the
                # default cache=True + num_workers>1)
                img.load()
                _label_cache[key] = img
            return _label_cache[key]
        return Image.open(self.lab_dir / str(cls) / f"{name}.png")

    # --- episode assembly ----------------------------------------------
    def _support(self, cls: int, name: str):
        hw = (self.height, self.width)
        if self.train:
            factor = random.uniform(1, 1.5)
            scaled = (int(self.height * factor), int(self.width * factor))
            flip = random.random() >= 0.5
            img = T.resize_image(self.get_image(name), scaled)
            img = T.color_jitter(img)
            if flip:
                img = T.hflip_image(img)
            msk = T.resize_mask(self.get_label(cls, name), scaled)
            if flip:
                msk = T.hflip_image(msk)
            msk = np.array(msk, np.uint8)
            # crop BEFORE normalizing: normalize is elementwise, so the
            # result is bit-identical and the scale-jittered border
            # pixels (up to 1.5^2 x) are never normalized at all
            arr = np.asarray(img.convert("RGB"))
            arr, msk = T.smart_crop(arr, msk, self.height, self.width)
            rgb = T.normalize(arr, self.cfg.data.mean, self.cfg.data.std)
        else:
            rgb = T.normalize(T.resize_image(self.get_image(name), hw),
                              self.cfg.data.mean, self.cfg.data.std)
            msk = np.array(T.resize_mask(self.get_label(cls, name), hw),
                           np.uint8)
        fg = (msk // 255).astype(np.float32)
        return rgb, np.stack([fg, 1.0 - fg], axis=-1)

    def _query(self, cls: int, name: str):
        hw = (self.height, self.width)
        if self.train:
            flip = random.random() >= 0.5
            img = T.resize_image(self.get_image(name), hw)
            img = T.color_jitter(img)
            if flip:
                img = T.hflip_image(img)
            rgb = T.normalize(img, self.cfg.data.mean, self.cfg.data.std)
            msk = T.resize_mask(self.get_label(cls, name), hw)
            if flip:
                msk = T.hflip_image(msk)
            msk = np.array(msk, np.uint8)
        else:
            rgb = T.normalize(T.resize_image(self.get_image(name), hw),
                              self.cfg.data.mean, self.cfg.data.std)
            # query GT stays at the ORIGINAL resolution (reference :229)
            msk = np.array(self.get_label(cls, name), np.uint8)
        return rgb, (msk // 255).astype(np.int32)

    def get_episode(self, idx: int) -> Dict:
        cls, names = self.sampler.tasks[idx]
        sup_names, qry_names = names[:self.shot], names[self.shot:]

        sup = [self._support(cls, n) for n in sup_names]
        qry = [self._query(cls, n) for n in qry_names]
        ep = {
            "sup_rgb": np.stack([s[0] for s in sup]).astype(np.float32),
            "sup_mask": np.stack([s[1] for s in sup]).astype(np.float32),
            "qry_rgb": np.stack([q[0] for q in qry]).astype(np.float32),
            "qry_msk": np.stack([q[1] for q in qry]),
            "cls": cls,
        }
        if self.ret_name:
            ep["sup_names"] = sup_names
            ep["qry_names"] = qry_names
        return ep


def get_val_labels(split: int) -> List[int]:
    """Classes evaluated for split s (reference datasets.py:83-104)."""
    return list(CV_SPLIT[split])


def get_class_name(cls: int) -> str:
    return CLASS_NAMES[(cls - 1) // 5][(cls - 1) % 5]
