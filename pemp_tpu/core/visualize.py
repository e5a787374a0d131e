"""Visualization dump for the result viewer.

Counterpart of reference ``core/base_trainer.py:311-403``
(``evaluate_and_save``): runs inference with response maps over the test
stream (or a single user-chosen episode, ``p.cls/p.sup/p.qry``) and
writes images / masks / binary predictions / colorized response maps +
``data.json`` into ``http/static/<eid>_<ds>_<shot>shot_<tag>_s<split>/``
per episode, which the Flask viewer (http/backend.py) serves.

The 6-color response palette matches the reference's BGR table
(:352-354), stored here as RGB for PIL.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from PIL import Image

from pemp_tpu.core import checkpoint as ckpt_lib
from pemp_tpu.data import datasets
from pemp_tpu.ops.resize import resize_bilinear_align_corners_np
from pemp_tpu.utils import misc

# reference colors are BGR (base_trainer.py:352-354); flipped to RGB
RESPONSE_COLORS = np.array([
    [25, 70, 147], [30, 116, 179], [112, 172, 207],
    [100, 11, 12], [193, 32, 38], [247, 178, 78],
], np.uint8)


def _denorm(rgb: np.ndarray, cfg) -> np.ndarray:
    """Invert the loader normalization with the CONFIGURED mean/std
    (cfg.data.mean/std — the values the episodes were normalized with,
    not hard-coded ImageNet constants)."""
    mean = np.asarray(cfg.data.mean, np.float32)
    std = np.asarray(cfg.data.std, np.float32)
    img = (rgb * std + mean) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def _save(path: Path, arr: np.ndarray):
    Image.fromarray(arr).save(str(path))


def evaluate_and_save(runtime, max_episodes: int = 50):
    cfg = runtime.cfg
    eid = cfg.exp_id if cfg.exp_id >= 0 else 0
    # anchor on the package (override with PEMP_HTTP_STATIC): the viewer
    # serves http/static relative to ITS file, so a CWD-relative path
    # would make artifacts invisible when running from elsewhere
    import os
    static_root = Path(os.environ.get(
        "PEMP_HTTP_STATIC", Path(__file__).parents[2] / "http" / "static"))
    http_dir = static_root / (
        f"{eid}_{cfg.data.dataset.lower()}_{cfg.shot}shot_{cfg.tag}"
        f"_s{cfg.split}{'_misc' if cfg.p.cls > 0 else ''}"
        + (f"_c{cfg.data.one_cls}" if cfg.data.one_cls > 0 else ""))

    ds, loader, _ = datasets.load(cfg, "visualize")
    ds.reset_sampler()
    ds.sample_tasks()
    if cfg.p.cls > 0:
        # single-episode mode (reference OneExampleLoader,
        # data_kits/pascal_voc.py:540-558); the loader iterates
        # len(dataset) indices, so the episode count must shrink with
        # the task list or index 1 raises in the producer thread
        sup = [s for s in str(cfg.p.sup).split(",") if s]
        ds.sampler.tasks = [(cfg.p.cls, sup + [cfg.p.qry])]
        ds.sampler.n_episodes = 1

    variables = runtime.init_variables()
    path = misc.find_snapshot(cfg, cfg.exp_id, cfg.ckpt)
    variables = ckpt_lib.load_variables(path, variables)
    runtime.logger.info(f"Model initialized from {path}")
    runtime._variables = variables

    from pemp_tpu.parallel.step import device_batch, unpack_batch
    # unpack_batch restores the f32 compute dtypes from the f16/uint8
    # wire format, exactly like the train/eval steps do — without it the
    # dumped predictions could differ from the test path's on borderline
    # pixels
    jit_vis = jax.jit(
        lambda v, b: runtime.apply_visualize(v, unpack_batch(b)))

    wire = cfg.tpu.compact_wire
    for i, batch in enumerate(loader):
        if i >= max_episodes or i >= len(ds.sampler.tasks):
            break
        cls = int(batch["cls"][0])
        cname = datasets.get_class_name(cls, cfg.data.dataset)

        logits, response = jit_vis(
            variables, device_batch(batch, compact_wire=wire))
        logits = np.asarray(logits, np.float32)[0, 0]       # [h, w, 2]
        response = np.asarray(response)[0, 0]               # [h, w]

        label = batch["qry_msk"]
        label = np.asarray(label[0] if isinstance(label, list) else label[0])
        label = label.reshape(label.shape[-2:]).astype(np.float32)

        lg = resize_bilinear_align_corners_np(logits, label.shape)
        pred = lg.argmax(axis=-1).astype(np.float32)
        # nearest-resize response to GT size
        ry = (np.arange(label.shape[0]) * response.shape[0]
              // label.shape[0]).clip(0, response.shape[0] - 1)
        rx = (np.arange(label.shape[1]) * response.shape[1]
              // label.shape[1]).clip(0, response.shape[1] - 1)
        resp_full = response[np.ix_(ry, rx)]
        color = RESPONSE_COLORS[np.clip(resp_full, 0, 5)]

        acc = float((pred * label).sum() * 2
                    / max(pred.sum() + label.sum(), 1e-6))
        save = http_dir / f"{i:03d}_{cls:02d}"
        save.mkdir(parents=True, exist_ok=True)

        sup_names = [str(n) for n in batch["sup_names"][0]]
        qry_name = str(batch["qry_names"][0][0])
        data = {"acc": str(round(acc, 3)), "cls_id": cls, "cls_name": cname,
                "qry": qry_name}
        if cfg.shot == 1:
            data["sup"] = sup_names[0]
        else:
            for j, n in enumerate(sup_names):
                data[f"sup{j + 1}"] = n
        with open(save / "data.json", "w") as f:
            json.dump(data, f)

        for j, n in enumerate(sup_names):
            _save(save / f"{cname}_sup_img_{n}.jpg",
                  _denorm(batch["sup_rgb"][0, j], cfg))
            _save(save / f"{cname}_sup_msk_{n}.png",
                  (batch["sup_mask"][0, j, :, :, 0] * 255).astype(np.uint8))
        _save(save / f"{cname}_qry_img_{qry_name}.jpg",
              _denorm(batch["qry_rgb"][0, 0], cfg))
        _save(save / f"{cname}_qry_msk_{qry_name}.png",
              (label * 255).astype(np.uint8))
        _save(save / f"{cname}_qry_pred_{qry_name}.png",
              (pred * 255).astype(np.uint8))
        _save(save / f"{cname}_qry_color_{qry_name}.png", color)
        print(f"[{i:03d}][{cls:02d}] Accuracy: {acc:.3f}")

    runtime.logger.info(f"Visualization saved to {http_dir}")
    return str(http_dir)
