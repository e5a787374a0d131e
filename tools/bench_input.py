#!/usr/bin/env python
"""Host input-pipeline roofline: can the TPU-VM host keep the chip fed?

The device side of this framework sustains ~170 train eps/s and
~830 eval eps/s per v5e chip (docs/DESIGN.md perf summary). Episodes
are produced on the HOST: JPEG/PNG decode -> scale-jitter -> color
jitter -> shared-flag flip -> smart crop -> normalize -> collate
(pemp_tpu/data/pascal.py + transforms.py; reference
data_kits/pascal_voc.py:184-240 does the same work in forked
DataLoader workers). This tool measures that pipeline in isolation —
episodes/s and host-CPU ms/episode at several worker counts — and
reports how many host cores one chip's demand costs.

It generates a miniature on-disk VOC tree (PASCAL-sized 500x375 JPEGs,
mask PNGs) by default, or points at a real VOCdevkit layout via
``--root`` for exact numbers.

Usage:
  python tools/bench_input.py [--root DIR] [--hw 401] [--episodes 300]
                              [--workers 1,2,4] [--shot 1] [--bs 4]

Output: a table per (mode, workers) + ONE JSON summary line.

Caveats (single-core CI hosts): thread-scaling numbers only mean
something on a multi-core machine; ms/episode at workers=1 is the
portable metric (PIL decode + numpy augment release the GIL, so
threads scale on real TPU-VM hosts with dozens of vCPUs).
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def make_fake_voc(root: Path, per_class: int = 4) -> None:
    """PASCAL-shaped tree at typical PASCAL size (375x500), photo-like
    JPEG entropy (see tests/fixtures.py — the shared generator)."""
    from tests.fixtures import make_fake_voc as shared
    shared(root, per_class=per_class, size=(375, 500), smooth=True,
           quality=90)


def run_pass(ds, bs: int, workers: int):
    """Drain one full EpisodeLoader epoch; wall s and CPU s."""
    from pemp_tpu.data.loader import EpisodeLoader

    loader = EpisodeLoader(ds, bs, num_workers=workers, prefetch=2)
    n = 0
    t0, c0 = time.perf_counter(), time.process_time()
    for batch in loader:
        n += int(np.shape(batch["qry_rgb"])[0])
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0
    return n, wall, cpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="", help="real VOCdevkit-layout dir; "
                    "default generates a miniature tree")
    ap.add_argument("--hw", type=int, default=401)
    ap.add_argument("--episodes", type=int, default=300)
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--shot", type=int, default=1)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the decoded-PIL cache (the reference "
                    "caches too, data.cache; default keeps it, so the "
                    "steady-state cost is augment-only after epoch 1)")
    args = ap.parse_args()

    from pemp_tpu.config import Config
    from pemp_tpu.data.pascal import PascalVOC
    from pemp_tpu.models import registry

    tmp = None
    if args.root:
        root = Path(args.root)
    else:
        tmp = tempfile.TemporaryDirectory(prefix="pemp_bench_voc_")
        root = Path(tmp.name)
        make_fake_voc(root)

    cfg = Config()
    cfg.net = registry.net_config("pemp_stage1")
    cfg.data.dataset = "PASCAL"
    cfg.data.base_dir = str(root)
    cfg.data.height = cfg.data.width = args.hw
    cfg.data.train_n = args.episodes
    cfg.data.test_n = args.episodes
    cfg.data.cache = not args.no_cache

    worker_list = [int(w) for w in args.workers.split(",")]
    results = []
    print(f"# input pipeline @ {args.hw}x{args.hw}, shot={args.shot}, "
          f"bs={args.bs}, {args.episodes} episodes/pass, "
          f"cache={'on' if cfg.data.cache else 'off'}, nproc={os.cpu_count()}")
    print(f"{'mode':8} {'workers':>7} {'eps/s':>8} {'ms/ep wall':>11} "
          f"{'ms/ep cpu':>10}")
    for train in (True, False):
        mode = "train" if train else "test"
        ds = PascalVOC(cfg, train=train, split=0, shot=args.shot, query=1)
        ds.sample_tasks()
        if cfg.data.cache:
            run_pass(ds, args.bs, workers=max(worker_list))  # warm cache
        for w in worker_list:
            if train:
                ds.sample_tasks()   # fresh epoch draw, like the trainer
            n, wall, cpu = run_pass(ds, args.bs if train else 1, w)
            results.append({"mode": mode, "workers": w,
                            "eps_per_s": round(n / wall, 1),
                            "ms_per_ep_wall": round(1e3 * wall / n, 2),
                            "ms_per_ep_cpu": round(1e3 * cpu / n, 2)})
            r = results[-1]
            print(f"{mode:8} {w:>7} {r['eps_per_s']:>8} "
                  f"{r['ms_per_ep_wall']:>11} {r['ms_per_ep_cpu']:>10}")

    # cores one chip costs: device demand x host CPU-ms per episode
    # (taken at the smallest measured worker count — per-episode CPU
    # cost is what divides across cores)
    w_min = min(worker_list)
    base = {r["mode"]: r["ms_per_ep_cpu"] for r in results
            if r["workers"] == w_min}
    demand = {"train": 170.0, "test": 830.0}   # v5e eps/s, DESIGN.md
    cores = {m: round(demand[m] * base[m] / 1e3, 2) for m in base}
    summary = {"metric": "input_pipeline_cores_per_chip", "cores": cores,
               "ms_per_episode_cpu": base, "results": results,
               "synthetic_tree": not bool(args.root)}
    print(json.dumps(summary))
    if tmp:
        tmp.cleanup()


if __name__ == "__main__":
    main()
