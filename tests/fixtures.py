"""Shared miniature-dataset generators for tests and host-side tools.

One PASCAL-shaped tree builder (Binary_map_aug/<subset>/<cls>/ mask PNGs,
JPEGImages/, per-class .txt lists — the layout pemp_tpu/data/pascal.py
reads, reference data_kits/pascal_voc.py:151) shared by
tests/test_pascal_loader.py, tests/test_entry_pascal_e2e.py and
tools/bench_input.py, so a loader-layout change has exactly one fixture
to update.
"""

from pathlib import Path

import numpy as np


def make_fake_voc(root: Path, per_class: int = 3, classes=range(1, 21),
                  seed: int = 0, size=(None, None), smooth: bool = False,
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
