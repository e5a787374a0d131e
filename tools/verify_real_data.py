#!/usr/bin/env python
"""One-command real-data closure runbook (VERDICT r3 #5).

The mIoU-parity north star (reference README.md:139-155) is env-blocked
in the development image: no PASCAL/COCO datasets, no pretrained/trained
``.pth`` files, no pycocotools. Every proxy is already in place —
converters with bit-exact round-trips, the eval protocol, golden
sampler fixtures, 7-family forward+gradient parity. This tool runs the
FULL closure checklist in dependency order the day data lands, with
zero new engineering:

  1. inventory     — what's on disk (datasets, backbone + trained .pth)
  2. goldens       — the reference's hard-coded episode triples
                     (reference data_kits/pascal_voc_test.py:59-75,
                     coco_test.py:57-73) against the real samplers
  3. rasterizer    — native/coco_mask.cpp vs the pycocotools binary on
                     real annotations (bitwise), if pycocotools imports
  4. convert       — torchvision backbones map completely; trained
                     checkpoints round-trip .pth -> msgpack -> .pth
                     bit-exactly
  5. miou          — the 5-round x 1000-episode protocol per
                     (family, split, shot) vs the published tables,
                     PASS iff within ±0.2 points (BASELINE.md)

Default is a DRY RUN for phase 5 (it is hours of TPU compute): the
exact command matrix is printed. ``--eval`` executes it.

Usage:
  python tools/verify_real_data.py                       # phases 1-4 + plan
  python tools/verify_real_data.py --eval                # + phase 5
  python tools/verify_real_data.py --ckpt-dir ckpts \
      --families pemp_stage1,pemp_stage2 --splits 0 --shots 1

Trained-checkpoint naming convention in --ckpt-dir:
  <family>_<dataset>_split<k>_shot<s>.pth     e.g.
  pemp_stage1_pascal_split0_shot1.pth (PEMP needs stage1 AND stage2).
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OK, FAIL, SKIP = "OK", "FAIL", "SKIP"

# Published mIoU tables, reference README.md:139-155 (ResNet-50).
# "pemp" rows are the deployed stage-1 -> stage-2 cascade.
PUBLISHED = {
    ("pascal", "baseline", 1): [45.48, 59.97, 51.35, 43.31],
    ("pascal", "rpmms", 1): [53.86, 66.45, 52.76, 51.31],
    ("pascal", "pemp", 1): [55.74, 65.88, 54.12, 50.34],
    ("pascal", "baseline", 5): [52.47, 66.31, 59.85, 51.02],
    ("pascal", "rpmms", 5): [56.28, 67.34, 54.52, 51.00],
    ("pascal", "pemp", 5): [58.59, 69.10, 60.31, 53.01],
    ("coco", "rpmms", 1): [29.53, 36.82, 28.94, 27.02],
    ("coco", "pemp", 1): [29.28, 34.09, 29.64, 30.36],
    ("coco", "rpmms", 5): [33.82, 41.96, 32.99, 33.33],
    ("coco", "pemp", 5): [39.08, 44.59, 39.54, 41.42],
}
TOLERANCE = 0.2         # BASELINE.md north star: within 0.2 mIoU points

# Golden episode triples (class, support names, query names) — the
# reference's reproducibility gate values.
PASCAL_GOLDEN_FIRST = (5, ["2010_001367"], ["2009_004324"])
COCO_GOLDEN_FIRST_5 = [
    (19, [69914], [581501]),
    (6, [35594], [53345]),
    (11, [187348], [143445]),
    (6, [457217], [315352]),
    (12, [177489], [85803]),
]

BACKBONE_PTH = ("vgg16-397923af.pth", "resnet50-19c8e357.pth",
                "resnet101-5d3b4d8f.pth", "resnet50_v2.pth")


def _cfg(dataset: str, root: Path, split=0, shot=1, query=1,
         family="baseline"):
    from pemp_tpu.config import Config
    from pemp_tpu.models import registry
    cfg = Config()
    cfg.net = registry.net_config(family)
    cfg.split, cfg.shot, cfg.query = split, shot, query
    cfg.data.test_n = 1000
    if dataset == "coco":
        cfg.data.dataset = "COCO"
        cfg.data.base_dir = str(root / "COCO")
    else:
        cfg.data.base_dir = str(root / "VOCdevkit" / "VOC2012")
    return cfg


# ---------------------------------------------------------------- phases
def phase_inventory(root: Path):
    found = {
        "pascal": (root / "VOCdevkit" / "VOC2012"
                   / "Binary_map_aug").exists(),
        "coco": (root / "COCO" / "annotations").exists(),
    }
    for name in BACKBONE_PTH:
        found[name] = (root / name).exists()
    detail = ", ".join(f"{k}={'yes' if v else 'NO'}"
                       for k, v in found.items())
    status = OK if any(found.values()) else SKIP
    return status, detail, found


def phase_goldens(root: Path, found):
    """Seeded-sampler golden triples vs the reference constants."""
    results = []
    if found["pascal"]:
        from pemp_tpu.data.pascal import PascalVOC
        ds = PascalVOC(_cfg("pascal", root), train=False, split=0,
                       shot=1, query=1)
        ds.reset_sampler()
        ds.sample_tasks()
        cls, names = ds.sampler.tasks[0]
        got = (cls, list(names[:1]), list(names[1:]))
        if got != PASCAL_GOLDEN_FIRST:
            return FAIL, (f"PASCAL golden episode mismatch: got {got}, "
                          f"want {PASCAL_GOLDEN_FIRST}")
        results.append("pascal golden ok")
    if found["coco"]:
        from pemp_tpu.data.coco import COCO20i
        ds = COCO20i(_cfg("coco", root), train=False, split=0,
                     shot=1, query=1)
        ds.reset_sampler()
        ds.sample_tasks()
        for i, want in enumerate(COCO_GOLDEN_FIRST_5):
            cls, names = ds.sampler.tasks[i]
            got = (cls, list(names[:1]), list(names[1:]))
            if got != want:
                return FAIL, (f"COCO golden episode {i} mismatch: "
                              f"got {got}, want {want}")
        results.append("coco goldens ok")
    if not results:
        return SKIP, "no dataset on disk"
    return OK, "; ".join(results)


def phase_rasterizer(root: Path, found, n=500, seed=0):
    """native/coco_mask.cpp vs the actual pycocotools binary, bitwise,
    on n randomly sampled REAL annotations (the in-repo randomized diff
    runs against an independent oracle; this closes the loop against
    the official C extension — reference data_kits/coco.py:240-270)."""
    if not found["coco"]:
        return SKIP, "no COCO on disk"
    try:
        from pycocotools.coco import COCO as PyCOCO
    except ImportError:
        return SKIP, "pycocotools not installed in this image"
    import numpy as np
    from pemp_tpu.data.coco_index import COCOIndex

    ann_file = str(root / "COCO" / "annotations"
                   / "instances_train2014.json")
    ours, theirs = COCOIndex(ann_file), PyCOCO(ann_file)
    rng = np.random.RandomState(seed)
    ann_ids = theirs.getAnnIds()
    sample = rng.choice(len(ann_ids), size=min(n, len(ann_ids)),
                        replace=False)
    for i in sample:
        ann = theirs.loadAnns([ann_ids[i]])[0]
        a = ours.annToMask(ann)
        b = theirs.annToMask(ann)
        if not np.array_equal(a.astype(np.uint8), b.astype(np.uint8)):
            return FAIL, (f"rasterizer mismatch on ann {ann['id']} "
                          f"(img {ann['image_id']}): "
                          f"{int((a != b).sum())} px differ")
    return OK, f"{len(sample)} annotations bit-identical to pycocotools"


def phase_convert(root: Path, found, ckpt_dir: Path | None):
    """Backbone .pth files convert completely; trained checkpoints
    round-trip bit-exactly through convert_reference_ckpt.py +
    export_reference_ckpt.py."""
    notes = []
    did = False
    import numpy as np
    import torch

    for name in BACKBONE_PTH:
        if not found.get(name):
            continue
        did = True
        sd = torch.load(root / name, map_location="cpu",
                        weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        notes.append(f"{name}: {len(sd)} tensors load")

    if ckpt_dir and ckpt_dir.is_dir():
        for pth in sorted(ckpt_dir.glob("*.pth")):
            m = re.match(r"(\w+?)_(pascal|coco)_split(\d)_shot(\d)",
                         pth.stem)
            if not m:
                notes.append(f"{pth.name}: SKIP (name convention)")
                continue
            family, _ds, _split, shot = m.group(1), m.group(2), \
                int(m.group(3)), int(m.group(4))
            did = True
            with tempfile.TemporaryDirectory() as td:
                msg = Path(td) / "ckpt.msgpack"
                back = Path(td) / "back.pth"
                for cmd in (
                    [sys.executable, "tools/convert_reference_ckpt.py",
                     "--model", family, "--ckpt", str(pth),
                     "--out", str(msg), "--shot", str(shot)],
                    [sys.executable, "tools/export_reference_ckpt.py",
                     "--model", family, "--ckpt", str(msg),
                     "--out", str(back), "--shot", str(shot)],
                ):
                    r = subprocess.run(cmd, cwd=ROOT,
                                       capture_output=True, text=True)
                    if r.returncode != 0:
                        return FAIL, (f"{pth.name}: {' '.join(cmd[1:3])} "
                                      f"rc={r.returncode}: "
                                      f"{r.stderr[-500:]}")
                a = torch.load(pth, map_location="cpu",
                               weights_only=True)
                b = torch.load(back, map_location="cpu",
                               weights_only=True)
                a = a.get("state_dict", a)
                b = b.get("state_dict", b)
                bad = [k for k in a
                       if not np.array_equal(np.asarray(a[k]),
                                             np.asarray(b.get(k)))]
                if bad:
                    return FAIL, (f"{pth.name}: round-trip differs on "
                                  f"{len(bad)} tensors: {bad[:4]}")
                notes.append(f"{pth.name}: round-trip bit-exact")
    if not did:
        return SKIP, "no .pth files on disk"
    return OK, "; ".join(notes)


def _miou_plan(root: Path, ckpt_dir: Path | None, families, splits,
               shots, datasets, model_dir: Path):
    """Expand the (family, dataset, split, shot) command matrix; each
    entry carries the exact entry-CLI invocation and the published
    target (None when the reference table has no row)."""
    plan = []
    for ds in datasets:
        for fam in families:
            table_key = "pemp" if fam == "pemp_stage2" else fam
            for shot in shots:
                pub = PUBLISHED.get((ds, table_key, shot))
                for split in splits:
                    ck, s1ck = None, None
                    if ckpt_dir:
                        c = ckpt_dir / (f"{fam}_{ds}_split{split}"
                                        f"_shot{shot}.pth")
                        ck = c if c.exists() else None
                        if fam == "pemp_stage2":
                            c1 = ckpt_dir / (f"pemp_stage1_{ds}_split"
                                             f"{split}_shot{shot}.pth")
                            s1ck = c1 if c1.exists() else None
                    data_over = ["data.dataset=COCO",
                                 f"data.base_dir={root / 'COCO'}"] \
                        if ds == "coco" else \
                        [f"data.base_dir={root / 'VOCdevkit' / 'VOC2012'}"]
                    # stage-2 is a cascade: the frozen stage-1 prior
                    # source rides s1.id (reference entry/pemp_stage2.py)
                    s1_over = ["s1.id=100"] if fam == "pemp_stage2" \
                        else []
                    cmd = [sys.executable, f"entry/{fam}.py", "test",
                           "with", f"split={split}", f"shot={shot}",
                           "data.test_n=1000", "te.epochs=5",
                           f"g.model_dir={model_dir}",
                           *data_over, *s1_over, "-u"]
                    plan.append({"family": fam, "dataset": ds,
                                 "split": split, "shot": shot,
                                 "published": (pub[split] if pub else
                                               None),
                                 "ckpt": ck, "s1_ckpt": s1ck,
                                 "cmd": cmd})
    return plan


def phase_miou(root: Path, ckpt_dir, families, splits, shots, datasets,
               run_eval: bool):
    model_dir = Path(tempfile.mkdtemp(prefix="verify_miou_"))
    plan = _miou_plan(root, ckpt_dir, families, splits, shots, datasets,
                      model_dir)
    if not run_eval:
        print("\n--- phase 5 plan (run with --eval to execute) ---")
        for p in plan:
            tgt = (f"target {p['published']}±{TOLERANCE}"
                   if p["published"] is not None else "no published row")
            ck = p["ckpt"].name if p["ckpt"] else "<needs trained .pth>"
            print(f"  [{p['dataset']}/{p['family']} split{p['split']} "
                  f"shot{p['shot']}] ckpt={ck} {tgt}")
            print("    " + " ".join(str(c) for c in p["cmd"])
                  + " ckpt=<converted.msgpack>")
        return SKIP, f"dry run: {len(plan)} protocol rows printed"

    def convert(family, pth, run_id, shot):
        run_dir = model_dir / family / str(run_id)
        run_dir.mkdir(parents=True, exist_ok=True)
        return subprocess.run(
            [sys.executable, "tools/convert_reference_ckpt.py",
             "--model", family, "--ckpt", str(pth),
             "--out", str(run_dir / "bestckpt.msgpack"),
             "--shot", str(shot)],
            cwd=ROOT, capture_output=True, text=True).returncode == 0

    rows, failures = [], []
    for p in plan:
        if p["ckpt"] is None:
            rows.append((p, None, "no checkpoint"))
            continue
        if p["family"] == "pemp_stage2":
            if p["s1_ckpt"] is None:
                rows.append((p, None, "no stage-1 checkpoint"))
                continue
            if not convert("pemp_stage1", p["s1_ckpt"], 100, p["shot"]):
                failures.append(f"{p['s1_ckpt'].name}: convert failed")
                continue
        run_id = 101
        if not convert(p["family"], p["ckpt"], run_id, p["shot"]):
            failures.append(f"{p['ckpt'].name}: convert failed")
            continue
        cmd = p["cmd"] + [f"exp_id={run_id}"]
        r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
        m = re.search(r"mIoU: (\d+\.\d+)", r.stdout + r.stderr)
        if r.returncode != 0 or not m:
            failures.append(f"{p['family']} split{p['split']} "
                            f"shot{p['shot']}: eval failed "
                            f"(rc={r.returncode})")
            continue
        got = float(m.group(1))
        rows.append((p, got, None))
        if p["published"] is not None \
                and abs(got - p["published"]) > TOLERANCE:
            failures.append(
                f"{p['dataset']}/{p['family']} split{p['split']} "
                f"shot{p['shot']}: {got:.2f} vs published "
                f"{p['published']:.2f} (> ±{TOLERANCE})")

    print("\n--- phase 5 results ---")
    for p, got, note in rows:
        tgt = p["published"]
        verdict = ("--" if got is None or tgt is None else
                   "PASS" if abs(got - tgt) <= TOLERANCE else "FAIL")
        print(f"  [{p['dataset']}/{p['family']} split{p['split']} "
              f"shot{p['shot']}] got={got} published={tgt} {verdict} "
              f"{note or ''}")
    if failures:
        return FAIL, "; ".join(failures)
    done = [r for r in rows if r[1] is not None]
    if not done:
        return SKIP, "no trained checkpoints to evaluate"
    return OK, f"{len(done)} protocol rows within ±{TOLERANCE}"


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Real-data closure checklist (see module docstring)")
    ap.add_argument("--data-root", default=str(ROOT / "data"))
    ap.add_argument("--ckpt-dir", default=None,
                    help="reference-trained .pth files "
                         "(<family>_<dataset>_split<k>_shot<s>.pth)")
    ap.add_argument("--families", default="baseline,rpmms,pemp_stage1,"
                                          "pemp_stage2")
    ap.add_argument("--splits", default="0,1,2,3")
    ap.add_argument("--shots", default="1,5")
    ap.add_argument("--datasets", default="pascal,coco")
    ap.add_argument("--rasterizer-n", type=int, default=500)
    ap.add_argument("--eval", action="store_true",
                    help="actually run the 5-round mIoU protocol "
                         "(hours of compute); default prints the plan")
    args = ap.parse_args(argv)

    root = Path(args.data_root)
    ckpt_dir = Path(args.ckpt_dir) if args.ckpt_dir else None
    families = args.families.split(",")
    splits = [int(s) for s in args.splits.split(",")]
    shots = [int(s) for s in args.shots.split(",")]
    datasets = args.datasets.split(",")

    results = []
    status, detail, found = phase_inventory(root)
    results.append(("1 inventory", status, detail))
    for name, fn in (
        ("2 goldens", lambda: phase_goldens(root, found)),
        ("3 rasterizer", lambda: phase_rasterizer(root, found,
                                                  args.rasterizer_n)),
        ("4 convert", lambda: phase_convert(root, found, ckpt_dir)),
        ("5 miou", lambda: phase_miou(root, ckpt_dir, families, splits,
                                      shots, datasets, args.eval)),
    ):
        try:
            st, det = fn()
        except Exception as e:        # a crash is a FAIL, not an abort
            st, det = FAIL, f"{type(e).__name__}: {e}"
        results.append((name, st, det))

    print("\n=== real-data closure checklist ===")
    failed = False
    for name, st, det in results:
        print(f"  [{st:4s}] {name}: {det}")
        failed |= st == FAIL
    print("=== " + ("FAIL" if failed else "ok (skips are env gaps, "
                    "not failures)") + " ===")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
