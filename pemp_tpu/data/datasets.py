"""Dataset registry + loader factory.

Counterpart of reference ``data_kits/datasets.py``:
- ``load(cfg, mode)`` dispatch over {PASCAL, COCO, SYNTH} x
  {train, test, eval_online, visualize} (reference :53-72),
- dataset root resolution with a helpful error (reference :34-50),
- ``get_val_labels`` / ``get_class_name`` (reference :83-117).

``SYNTH`` is an addition: a procedural dataset with the same contract so
the stack runs without PASCAL/COCO on disk (tests, benchmarks).
"""

from __future__ import annotations

from pathlib import Path
from typing import List

from pemp_tpu.data.loader import EpisodeLoader

DEFAULT_ROOTS = {
    "PASCAL": "data/VOCdevkit/VOC2012",
    "COCO": "data/COCO",
}


def resolve_base_dir(cfg) -> str:
    name = cfg.data.dataset.upper()
    if name == "SYNTH":
        return ""
    base = cfg.data.base_dir or DEFAULT_ROOTS.get(name, "")
    if not base or not Path(base).exists():
        raise FileNotFoundError(
            f"Dataset root for {name} not found at '{base}'. Set "
            f"data.base_dir=<path> (expected layout like the reference: "
            f"{DEFAULT_ROOTS.get(name)}).")
    return base


def load(cfg, mode: str):
    """Returns (dataset, loader, num_classes).

    mode: 'train' | 'eval_online' | 'test' | 'visualize'
    """
    name = cfg.data.dataset.upper()
    train = mode == "train"
    ret_name = mode == "visualize"

    if name == "SYNTH":
        from pemp_tpu.data.synthetic import SyntheticDataset
        ds = SyntheticDataset(cfg, train, cfg.split, cfg.shot, cfg.query,
                              ret_name=ret_name)
    elif name == "PASCAL":
        from pemp_tpu.data.pascal import PascalVOC
        cfg.data.base_dir = resolve_base_dir(cfg)
        ds = PascalVOC(cfg, train, cfg.split, cfg.shot, cfg.query,
                       ret_name=ret_name)
    elif name == "COCO":
        from pemp_tpu.data.coco import COCO20i
        cfg.data.base_dir = resolve_base_dir(cfg)
        ds = COCO20i(cfg, train, cfg.split, cfg.shot, cfg.query,
                     ret_name=ret_name)
    else:
        raise ValueError(f"Unknown dataset '{cfg.data.dataset}'. "
                         "[PASCAL, COCO, SYNTH]")

    bs = cfg.data.bs if train else cfg.data.test_bs
    loader = EpisodeLoader(ds, bs, num_workers=cfg.data.num_workers,
                           prefetch=cfg.tpu.prefetch,
                           drop_last=train,
                           shard_by_process=train)  # multi-host training
    return ds, loader, ds.num_classes


def get_val_labels(cfg, split: int) -> List[int]:
    name = cfg.data.dataset.upper()
    if name == "COCO":
        return list(range(split * 20 + 1, split * 20 + 21))
    return list(range(split * 5 + 1, split * 5 + 6))


def get_class_name(cls: int, dataset: str) -> str:
    if dataset.upper() == "COCO":
        from pemp_tpu.data.coco import class_name
        return class_name(cls)
    from pemp_tpu.data.pascal import get_class_name as pascal_name
    return pascal_name(int(cls))
