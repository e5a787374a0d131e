"""COCO-20i episodic dataset.

Behavioral counterpart of reference ``data_kits/coco.py``:
- interleaved 4x20 class split over the 80 categories (reference :16-19);
  the sampler draws ORIGINAL COCO category ids and episodes report the
  remapped contiguous id ``new_index`` in 1..80 (reference :35-38, :352),
- one-time file-list generation filtering images whose class mask has
  < 16 fg px (train) / < 0 (val), cached as ``train2014_list_16.json`` /
  ``val2014_list_0.json`` (reference :131-172, :124, :369),
- masks rasterized on the fly from polygon/RLE annotations, union over
  instances, values {0, 255} (reference :240-270),
- corrupt-label fallback: a fake centered box mask keeps training alive
  (reference :307-319),
- train-time augmentation identical to PASCAL (scale, jitter, shared-flag
  flip, smart crop); test query GT at original resolution.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Dict, List

import numpy as np
from PIL import Image

from pemp_tpu.data import transforms as T
from pemp_tpu.data.sampler import EpisodeSampler

CV_SPLIT = [
    [1, 5, 9, 14, 18, 22, 27, 33, 37, 41, 46, 50, 54, 58, 62, 67, 74, 78, 82, 87],
    [2, 6, 10, 15, 19, 23, 28, 34, 38, 42, 47, 51, 55, 59, 63, 70, 75, 79, 84, 88],
    [3, 7, 11, 16, 20, 24, 31, 35, 39, 43, 48, 52, 56, 60, 64, 72, 76, 80, 85, 89],
    [4, 8, 13, 17, 21, 25, 32, 36, 40, 44, 49, 53, 57, 61, 65, 73, 77, 81, 86, 90],
]
CLASS_NAMES = [
    ["person", "airplane", "boat", "parking meter", "dog", "elephant",
     "backpack", "suitcase", "sports ball", "skateboard", "wine glass",
     "spoon", "sandwich", "hot dog", "chair", "dining table", "mouse",
     "microwave", "refrigerator", "scissors"],
    ["bicycle", "bus", "traffic light", "bench", "horse", "bear",
     "umbrella", "frisbee", "kite", "surfboard", "cup", "bowl", "orange",
     "pizza", "couch", "toilet", "remote", "oven", "book", "teddy bear"],
    ["car", "train", "fire hydrant", "bird", "sheep", "zebra", "handbag",
     "skis", "baseball bat", "tennis racket", "fork", "banana", "broccoli",
     "donut", "potted plant", "tv", "keyboard", "toaster", "clock",
     "hair drier"],
    ["motorcycle", "truck", "stop sign", "cat", "cow", "giraffe", "tie",
     "snowboard", "baseball glove", "bottle", "knife", "apple", "carrot",
     "cake", "bed", "laptop", "cell phone", "sink", "vase", "toothbrush"],
]

# original category id -> contiguous 1..80 (reference :35-38)
NEW_INDEX = {CV_SPLIT[i][j]: i * 20 + j + 1
             for i in range(4) for j in range(20)}

# keyed by (image dir, id): bare ids collide across dataset roots and
# across the train2014/val2014 subsets
_image_cache: Dict[tuple, Image.Image] = {}
_label_cache: Dict[tuple, np.ndarray] = {}


def class_name(new_cls: int) -> str:
    i, j = (new_cls - 1) // 20, (new_cls - 1) % 20
    return CLASS_NAMES[i][j]


class COCO20i:
    def __init__(self, cfg, train: bool, split: int, shot: int, query: int,
                 ret_name: bool = False):
        # our own COCO index + native C++ mask rasterizer replaces
        # pycocotools (see pemp_tpu/data/coco_index.py, native/coco_mask.cpp)
        from pemp_tpu.data.coco_index import COCOIndex as COCOApi

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
        subset = "train2014" if train else "val2014"
        self.img_dir = base / subset
        self.coco = COCOApi(str(base / "annotations" /
                                f"instances_{subset}.json"))
        threshold = 16 if train else 0
        self.threshold = threshold
        self.list_path = base / f"{subset}_list_{threshold}.json"

        if train:
            others = sorted({0, 1, 2, 3} - {split})
            self.classes = (CV_SPLIT[others[0]] + CV_SPLIT[others[1]]
                            + CV_SPLIT[others[2]])
            n, seed = cfg.data.train_n, cfg.data.seed
        else:
            self.classes = list(CV_SPLIT[split])
            n, seed = cfg.data.test_n, cfg.data.test_seed

        sample_list = self._load_file_list()
        self.samples_by_class = {c: sample_list[str(c)] for c in self.classes}
        self.sampler = EpisodeSampler(
            self.classes, self.samples_by_class, n, shot, query, seed,
            one_cls=cfg.data.one_cls)

    # --- file list -------------------------------------------------------
    def _load_file_list(self):
        if self.list_path.exists():
            with self.list_path.open() as f:
                return json.load(f)
        print("No sample list found. Generating now "
              f"(threshold={self.threshold}) ...")
        sample_by_class = {}
        removed = 0
        for split_classes in CV_SPLIT:
            for cls in split_classes:
                keep = []
                for img_id in self.coco.getImgIds(catIds=cls):
                    label = self._rasterize(cls, img_id)
                    if np.count_nonzero(255 - label) < self.threshold:
                        removed += 1       # too small background
                    elif np.count_nonzero(label) < self.threshold:
                        removed += 1       # too small foreground
                    else:
                        keep.append(img_id)
                sample_by_class[str(cls)] = keep
        print(f"{removed} samples are removed.")
        with self.list_path.open("w") as f:
            json.dump(sample_by_class, f)
        return sample_by_class

    # --- reference dataset surface --------------------------------------
    def reset_sampler(self):
        self.sampler.reset()

    def sample_tasks(self):
        self.sampler.sample_tasks()

    def __len__(self):
        return len(self.sampler)

    @property
    def num_classes(self):
        return 80

    # --- IO --------------------------------------------------------------
    def get_image(self, img_id) -> Image.Image:
        img_id = int(img_id)
        key = (str(self.img_dir), img_id)
        if self.cache and key in _image_cache:
            return _image_cache[key]
        meta = self.coco.loadImgs(img_id)[0]
        img = Image.open(self.img_dir / meta["file_name"]).convert("RGB")
        if self.cache:
            _image_cache[key] = img
        return img

    def _rasterize(self, cls: int, img_id: int) -> np.ndarray:
        """Union of instance masks of ``cls`` as {0, 255} uint8
        (reference :240-270)."""
        meta = self.coco.loadImgs(img_id)[0]
        sem = np.zeros((meta["height"], meta["width"]), np.uint8)
        for ann in self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id)):
            if ann["category_id"] != cls:
                continue
            sem[self.coco.annToMask(ann) == 1] = 255
        return sem

    def get_label(self, cls, img_id, new_label: bool = False) -> Image.Image:
        cls, img_id = int(cls), int(img_id)
        if new_label:   # contiguous id -> original category id
            cls = CV_SPLIT[(cls - 1) // 20][(cls - 1) % 20]
        key = (str(self.img_dir), cls, img_id)
        if self.cache and key in _label_cache:
            return Image.fromarray(_label_cache[key])
        sem = self._rasterize(cls, img_id)
        if self.cache:
            _label_cache[key] = sem
        return Image.fromarray(sem)

    # --- episode assembly ------------------------------------------------
    def _support(self, cls: int, img_id):
        hw = (self.height, self.width)
        if self.train:
            factor = random.uniform(1, 1.5)
            scaled = (int(self.height * factor), int(self.width * factor))
            flip = random.random() >= 0.5
            img = T.resize_image(self.get_image(img_id), scaled)
            img = T.color_jitter(img)
            if flip:
                img = T.hflip_image(img)
            msk = T.resize_mask(self.get_label(cls, img_id), scaled)
            if flip:
                msk = T.hflip_image(msk)
            msk = np.array(msk, np.uint8)
            # crop BEFORE normalizing (bit-identical, elementwise —
            # see pascal.py): the jittered border is never normalized
            arr = np.asarray(img.convert("RGB"))
            try:
                arr, msk = T.smart_crop(arr, msk, self.height, self.width)
            except (ValueError, IndexError):
                # corrupt label: fake centered box (reference :307-319)
                meta = self.coco.loadImgs(int(img_id))[0]
                print(f"error pic name {img_id}, class is {cls}, "
                      f"({meta.get('coco_url', '')})")
                msk = np.zeros(scaled, np.uint8)
                h_, w_ = msk.shape
                msk[h_ // 2 - h_ // 8:h_ // 2 + h_ // 8,
                    w_ // 2 - w_ // 8:w_ // 2 + w_ // 8] = 1
                arr, msk = T.smart_crop(arr, msk, self.height, self.width)
            rgb = T.normalize(arr, self.cfg.data.mean, self.cfg.data.std)
        else:
            rgb = T.normalize(T.resize_image(self.get_image(img_id), hw),
                              self.cfg.data.mean, self.cfg.data.std)
            msk = np.array(T.resize_mask(self.get_label(cls, img_id), hw),
                           np.uint8)
        fg = (msk // 255).astype(np.float32)
        return rgb, np.stack([fg, 1.0 - fg], axis=-1)

    def _query(self, cls: int, img_id):
        hw = (self.height, self.width)
        if self.train:
            flip = random.random() >= 0.5
            img = T.resize_image(self.get_image(img_id), hw)
            img = T.color_jitter(img)
            if flip:
                img = T.hflip_image(img)
            rgb = T.normalize(img, self.cfg.data.mean, self.cfg.data.std)
            msk = T.resize_mask(self.get_label(cls, img_id), hw)
            if flip:
                msk = T.hflip_image(msk)
            msk = np.array(msk, np.uint8)
        else:
            rgb = T.normalize(T.resize_image(self.get_image(img_id), hw),
                              self.cfg.data.mean, self.cfg.data.std)
            msk = np.array(self.get_label(cls, img_id), np.uint8)
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
            "cls": NEW_INDEX[cls],     # contiguous id (reference :352)
        }
        if self.ret_name:
            ep["sup_names"] = [int(n) for n in sup_names]
            ep["qry_names"] = [int(n) for n in qry_names]
        return ep
