"""Shared miniature-dataset generators for tests and host-side tools.

One PASCAL-shaped tree builder (Binary_map_aug/<subset>/<cls>/ mask PNGs,
JPEGImages/, per-class .txt lists — the layout pemp_tpu/data/pascal.py
reads, reference data_kits/pascal_voc.py:151) shared by
tests/test_pascal_loader.py, tests/test_entry_pascal_e2e.py and
tools/bench_input.py, and one COCO-shaped tree builder
(annotations/instances_{subset}.json + {subset}/ JPEGs — the layout
pemp_tpu/data/coco_index.py reads, reference data_kits/coco.py:124)
shared by tests/test_coco_loader.py and tests/test_entry_coco_e2e.py —
so a loader-layout change has exactly one fixture to update.
"""

import json
from pathlib import Path

import numpy as np


def make_fake_voc(root: Path, per_class: int = 3, classes=range(1, 21),
                  seed: int = 0, size=(48, 64), smooth: bool = False,
                  quality=None) -> None:
    """Generate a miniature VOC tree under ``root``.

    - ``size``: fixed ``(h, w)``, or a callable ``(cls, i) -> (h, w)``
      for varied original resolutions (exercises the variable-size
      test-GT protocol, reference pascal_voc.py:229).
    - ``smooth``: natural-image-statistics JPEGs (low-res noise
      upsampled) instead of white noise — noise JPEGs decode ~2x slower
      than photos and would overstate a decode benchmark.
    - ``quality``: JPEG save quality (None = PIL default).

    The foreground box is fraction-based (rows [h/5, 3h/5), cols
    [w/5, 13w/20)) so any image size gets a non-empty, non-full mask.
    """
    from PIL import Image

    rng = np.random.RandomState(seed)
    (root / "JPEGImages").mkdir(parents=True, exist_ok=True)
    for subset in ("train", "val"):
        for cls in classes:
            cdir = root / "Binary_map_aug" / subset / str(cls)
            cdir.mkdir(parents=True, exist_ok=True)
            names = []
            for i in range(per_class):
                name = f"{subset}_{cls:02d}_{i}"
                names.append(name)
                h, w = size(cls, i) if callable(size) else size
                if smooth:
                    low = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
                    img = np.asarray(Image.fromarray(low).resize(
                        (w, h), Image.BILINEAR))
                else:
                    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                kw = {} if quality is None else {"quality": quality}
                Image.fromarray(img).save(
                    root / "JPEGImages" / f"{name}.jpg", **kw)
                mask = np.zeros((h, w), np.uint8)
                mask[h // 5:3 * h // 5, w // 5:13 * w // 20] = 255
                Image.fromarray(mask).save(cdir / f"{name}.png")
            (root / "Binary_map_aug" / subset / f"{cls}.txt").write_text(
                "\n".join(names) + "\n")


def make_fake_coco(root: Path, cats, per_cat: int = 3, size=(60, 80),
                   seed: int = 0) -> None:
    """Generate a miniature COCO-20i tree under ``root``.

    - ``cats``: original COCO category ids to populate (both subsets get
      ``per_cat`` images per category, each with one in-bounds box
      polygon of that category).
    - ``size``: fixed ``(h, w)``, or a callable ``(cat, i) -> (h, w)``
      for varied original resolutions (exercises the variable-size
      test-GT protocol).

    Image ids are assigned 1..N per subset in (cat, i) order — the
    loaders key caches by (directory, id), so equal ids across subsets
    or across two generated trees are safe.
    """
    from PIL import Image

    rng = np.random.RandomState(seed)
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    for subset in ("train2014", "val2014"):
        (root / subset).mkdir(exist_ok=True)
        images, annotations = [], []
        ann_id = img_id = 1
        for cat in cats:
            for i in range(per_cat):
                h, w = size(cat, i) if callable(size) else size
                name = f"COCO_{subset}_{img_id:012d}.jpg"
                arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(root / subset / name)
                images.append({"id": img_id, "height": h, "width": w,
                               "file_name": name})
                # one 30x25 box polygon, kept inside any (h, w) >= (36, 41)
                x0 = rng.randint(5, max(6, w - 31))
                y0 = rng.randint(5, max(6, h - 26))
                poly = [x0, y0, x0 + 30, y0, x0 + 30, y0 + 25, x0, y0 + 25]
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": cat,
                    "segmentation": [poly]})
                ann_id += 1
                img_id += 1
        blob = {"images": images, "annotations": annotations,
                "categories": [{"id": c} for c in cats]}
        (root / "annotations" / f"instances_{subset}.json").write_text(
            json.dumps(blob))
