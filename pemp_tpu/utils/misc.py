"""Misc utilities: seeding and checkpoint discovery.

Counterpart of the reference's ``utils/misc.py``:
- ``set_seed`` (reference :16-20) seeds the host RNGs (episode sampling and
  augmentation are host-side numpy streams; device randomness uses explicit
  ``jax.random`` keys threaded through the models).
- ``find_snapshot`` (reference :123-148) resolves a checkpoint path from
  ``model_dir/<tag>/<exp_id>/{<ckpt>, bestckpt.*, ckpt.*}`` with cross-tag
  glob and max-id fallbacks.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Optional

import numpy as np

CKPT_SUFFIXES = (".msgpack", ".npz", ".pth")


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def _existing(path: Path) -> Optional[Path]:
    if path.exists():
        return path
    return None


def find_snapshot(cfg, exp_id: int = -1, ckpt: str = "") -> Path:
    """Locate a checkpoint file.

    Resolution order (mirrors reference utils/misc.py:123-148):
    1. ``ckpt`` as an absolute/relative existing path.
    2. ``model_dir/<tag>/<exp_id>/<ckpt>``.
    3. ``model_dir/<tag>/<exp_id>/{bestckpt,ckpt}.msgpack``.
    4. Cross-tag glob ``model_dir/*/<exp_id>/...`` .
    5. The run with the largest id under ``model_dir/<tag>``.
    """
    model_dir = Path(cfg.g.model_dir)
    tag = str(cfg.tag)

    if ckpt:
        p = Path(ckpt)
        if p.exists():
            return p

    def search(run_dir: Path) -> Optional[Path]:
        if ckpt:
            cand = _existing(run_dir / ckpt)
            if cand:
                return cand
        for stem in ("bestckpt", "ckpt"):
            for suf in CKPT_SUFFIXES:
                cand = _existing(run_dir / f"{stem}{suf}")
                if cand:
                    return cand
        return None

    if exp_id >= 0:
        found = search(model_dir / tag / str(exp_id))
        if found:
            return found
        for other in sorted(model_dir.glob(f"*/{exp_id}")):
            found = search(other)
            if found:
                return found

    tag_dir = model_dir / tag
    if tag_dir.exists():
        run_ids = sorted((int(p.name) for p in tag_dir.iterdir()
                          if p.name.isdigit()), reverse=True)
        for rid in run_ids:
            found = search(tag_dir / str(rid))
            if found:
                return found

    raise FileNotFoundError(
        f"No checkpoint found under {model_dir}/{tag} (exp_id={exp_id}, "
        f"ckpt='{ckpt}')")
