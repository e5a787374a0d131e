#!/usr/bin/env python
"""Capture a jax.profiler trace of the headline EVAL step (bench.py's
protocol: PEMP-s1 r50 1-shot, input-resolution logits + argmax + device
TP/FP/FN counts) and report the device-side decomposition.

The train step got this treatment in r3 (tools/profile_train.py found a
9.2 ms scalar-unit gather in the CE loss); the eval step — the metric
bench.py reports — had never been traced. Same xplane parsing.

Usage:
  python tools/profile_eval.py [--bs 256] [--hw 401] [--launches 4]
          [--no-pallas] [--shot 1]
Prints one JSON summary line (plus a readable top-op table on stderr).
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_train import GROUPS, device_plane_ops


def build(args):
    from pemp_tpu.core.metrics import tp_fp_fn
    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    hw, bs, s = args.hw, args.bs, args.shot

    model = PEMPStage1(backbone="resnet50", dtype=dtype,
                      use_pallas=on_tpu and not args.no_pallas)
    rng = np.random.RandomState(0)
    sup = jnp.asarray(rng.randn(bs, s, hw, hw, 3).astype(np.float32))
    fg = (rng.rand(bs, s, hw, hw, 1) > 0.5).astype(np.float32)
    msk = jnp.asarray(np.concatenate([fg, 1 - fg], axis=-1))
    qry = jnp.asarray(rng.randn(bs, 1, hw, hw, 3).astype(np.float32))
    ref = jnp.asarray(rng.randint(0, 2, (bs, hw, hw)).astype(np.int32))

    variables = jax.jit(
        lambda s_, m_, q_: model.init({"params": jax.random.PRNGKey(0)},
                                      s_, m_, q_, out_hw=None))(
        sup[:1], msk[:1], qry[:1])

    @jax.jit
    def eval_batch(variables, sup, msk, qry, ref):
        logits = model.apply(variables, sup, msk, qry, out_hw=(hw, hw),
                             train=False)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        refs = jnp.repeat(ref, pred.shape[1], axis=0)
        return jax.vmap(tp_fp_fn)(pred.reshape(-1, hw, hw), refs).sum(axis=0)

    return eval_batch, variables, (sup, msk, qry, ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=401)
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--shot", type=int, default=1)
    ap.add_argument("--launches", type=int, default=4)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--outdir", default="")
    args = ap.parse_args()

    eval_batch, variables, batch = build(args)
    for _ in range(2):                                   # warmup/compile
        total = eval_batch(variables, *batch)
    np.asarray(total)

    outdir = args.outdir or tempfile.mkdtemp(prefix="pemp_prof_eval_")
    tic = time.perf_counter()
    with jax.profiler.trace(outdir):
        total = jnp.zeros((2, 3), jnp.int32)
        for _ in range(args.launches):
            total = total + eval_batch(variables, *batch)
        np.asarray(total)                                # close the window
    wall = time.perf_counter() - tic

    xplanes = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    ops, step_ns, n_steps = device_plane_ops(
        xplanes[-1], module_prefix="jit_eval_batch",
        fallback_steps=args.launches)
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:20]

    grouped = defaultdict(float)
    for name, ns in ops.items():
        for pat, label in GROUPS:
            if pat in name:
                grouped[label] += ns
                break
        else:
            grouped["other"] += ns

    dev_ms = step_ns / 1e6 / n_steps
    wall_ms = wall * 1e3 / args.launches
    for name, ns in top:
        print(f"  {ns / 1e6 / n_steps:8.3f} ms/launch  {name[:90]}",
              file=sys.stderr)
    print(json.dumps({
        "bs": args.bs, "hw": args.hw, "shot": args.shot,
        "pallas": not args.no_pallas,
        "launches_traced": args.launches,
        "wall_ms_per_launch": round(wall_ms, 2),
        "device_ms_per_launch": round(dev_ms, 2),
        "device_eps": round(args.bs / (dev_ms / 1e3), 1) if dev_ms else None,
        "wall_eps": round(args.bs / (wall_ms / 1e3), 1),
        "groups_ms_per_launch": {k: round(v / 1e6 / n_steps, 2)
                                 for k, v in sorted(grouped.items(),
                                                    key=lambda kv: -kv[1])},
        "trace_dir": outdir,
    }))


if __name__ == "__main__":
    main()
