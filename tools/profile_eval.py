#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench.py eval batch (PEMP-s1 r50
1-shot, 401x401, argmax + TP/FP/FN counts) and report the DEVICE-side
decomposition — the eval path is the headline benchmark and had never
been traced (the train step was traced in r3, tools/profile_train.py).

Usage:
  python tools/profile_eval.py --batch 256 [--hw 401] [--launches 4]
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

from tools.profile_train import device_plane_ops, GROUPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=401)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--launches", type=int, default=4)
    ap.add_argument("--shots", type=int, default=1)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--outdir", default="")
    args = ap.parse_args()

    from pemp_tpu.models.pemp_stage1 import PEMPStage1
    from pemp_tpu.core.metrics import tp_fp_fn

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    hw, batch, S = args.hw, args.batch, args.shots

    model = PEMPStage1(backbone="resnet50", dtype=dtype,
                       use_pallas=on_tpu and not args.no_pallas)

    rng = np.random.RandomState(0)
    sup = jnp.asarray(rng.randn(batch, S, hw, hw, 3).astype(np.float32))
    fg = (rng.rand(batch, S, hw, hw, 1) > 0.5).astype(np.float32)
    msk = jnp.asarray(np.concatenate([fg, 1 - fg], axis=-1))
    qry = jnp.asarray(rng.randn(batch, 1, hw, hw, 3).astype(np.float32))
    ref = jnp.asarray(rng.randint(0, 2, (batch, hw, hw)).astype(np.int32))

    variables = jax.jit(
        lambda s, m, q: model.init({"params": jax.random.PRNGKey(0)},
                                   s, m, q, out_hw=None))(
        sup[:1], msk[:1], qry[:1])

    @jax.jit
    def eval_batch(variables, sup, msk, qry, ref):
        logits = model.apply(variables, sup, msk, qry, out_hw=(hw, hw),
                             train=False)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        refs = jnp.repeat(ref, pred.shape[1], axis=0)
        return jax.vmap(tp_fp_fn)(pred.reshape(-1, hw, hw), refs).sum(axis=0)

    for _ in range(2):                                   # warmup/compile
        np.asarray(eval_batch(variables, sup, msk, qry, ref))

    outdir = args.outdir or tempfile.mkdtemp(prefix="pemp_prof_eval_")
    tic = time.perf_counter()
    with jax.profiler.trace(outdir):
        total = jnp.zeros((2, 3), jnp.int32)
        for _ in range(args.launches):
            total = total + eval_batch(variables, sup, msk, qry, ref)
        np.asarray(total)                                # close the window
    wall = time.perf_counter() - tic

    xplanes = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    ops, step_ns, n_steps = device_plane_ops(
        xplanes[-1], module_prefix="jit_eval_batch",
        fallback_steps=args.launches)
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]

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
        "batch": batch, "hw": hw, "shots": S,
        "pallas": on_tpu and not args.no_pallas,
        "launches_traced": args.launches,
        "wall_ms_per_launch": round(wall_ms, 2),
        "device_ms_per_launch": round(dev_ms, 2),
        "device_eps": round(batch / (dev_ms / 1e3), 1) if dev_ms else None,
        "wall_eps": round(batch / (wall_ms / 1e3), 1),
        "groups_ms_per_launch": {k: round(v / 1e6 / n_steps, 2)
                                 for k, v in sorted(grouped.items(),
                                                    key=lambda kv: -kv[1])},
        "trace_dir": outdir,
    }))


if __name__ == "__main__":
    main()
