#!/usr/bin/env python
"""Capture a jax.profiler trace of the PEMP-s1 train step and report the
DEVICE-side step decomposition (VERDICT r2 item 4: the r2 step timings
were wall-clock subtraction; this is the trace-backed version).

Parses the xplane with jax.profiler.ProfileData (no tensorboard UI
needed): per-op device self-times from the TPU "XLA Ops" line,
aggregated by op, plus the device busy time per step — which separates
the chip's actual compute from the tunnel's dispatch floor (the r2
"bs=16 buys nothing" observation).

Usage:
  python tools/profile_train.py --bs 4 --steps 6 [--hw 401] [--loss cedt]
  python tools/profile_train.py --family rpmms   # any zoo family at its
                                                 # reference preset
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
sys.path.insert(0, str(Path(__file__).parent))   # bench_train_zoo import
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax


def build(args):
    from bench_train import make_bench_setup

    step, _tx, params, batch_stats, opt_state, batch, bs, hw = (
        make_bench_setup(args, args.pallas))
    return step, params, batch_stats, opt_state, batch, bs, hw


def device_plane_ops(xplane_path, module_prefix="jit_step",
                     fallback_steps=1):
    """(ops, step_ns, n_steps): per-op self-times from the device
    'XLA Ops' line (the 'Async XLA Ops' line holds OVERLAPPED DMA spans
    and must NOT be summed — that double-counts the async copies), plus
    the per-execution device duration of the step module from the
    'XLA Modules' line. Falls back to the CPU client line off-chip —
    those events span ALL traced steps, so the caller-supplied
    fallback_steps keeps the per-step division honest there."""
    from jax.profiler import ProfileData
    pd = ProfileData.from_file(xplane_path)
    device_planes = [p for p in pd.planes if p.name.startswith("/device:")
                     and "CUSTOM" not in p.name]
    ops = defaultdict(float)
    step_ns, n_steps = 0.0, 0
    for p in device_planes:
        for line in p.lines:
            lname = line.name.lower()
            if lname == "xla ops":
                for e in line.events:
                    ops[e.name] += e.duration_ns
            elif lname == "xla modules":
                for e in line.events:
                    if e.name.startswith(module_prefix):
                        step_ns += e.duration_ns
                        n_steps += 1
    if not device_planes:       # CPU fallback: the PjRt client thread line
        for p in pd.planes:
            if p.name != "/host:CPU":
                continue
            for line in p.lines:
                if "PjRtCpuClient" not in line.name:
                    continue
                for e in line.events:
                    if not e.name.startswith("end:"):
                        ops[e.name] += e.duration_ns
                        step_ns += e.duration_ns
        n_steps = fallback_steps
    return dict(ops), step_ns, max(n_steps, 1)


GROUPS = (
    ("convolution", "conv"), ("fusion", "fusion"), ("dot", "matmul"),
    ("custom-call", "custom-call/pallas"), ("reduce-window", "pool"),
    ("all-reduce", "collective"), ("copy", "copy"), ("scatter", "scatter"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=401)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--loss", default="cedt")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--family", default="",
                    help="profile a zoo family's production train step at "
                         "its reference preset (tools/bench_train_zoo.py "
                         "rows) instead of the flagship bench_train step")
    ap.add_argument("--outdir", default="")
    args = ap.parse_args()

    if args.family:
        from bench_train_zoo import make_family_setup
        on_tpu = jax.devices()[0].platform == "tpu"
        with tempfile.TemporaryDirectory() as mdir:
            fstep, state, batch, lr, key, bs, hw = make_family_setup(
                args.family, on_tpu, mdir)

        def step(state, _bs, _opt, batch, rng):
            new_state, loss, _aux = fstep(state, batch, lr, rng)
            return new_state, None, None, loss

        params, batch_stats, opt_state = state, None, None
        args.loss = "preset"
        args.pallas = on_tpu   # family steps follow cfg.tpu.use_pallas
    else:
        step, params, batch_stats, opt_state, batch, bs, hw = build(args)
    key = jax.random.PRNGKey(1)
    for i in range(3):                                   # warmup/compile
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, batch, jax.random.fold_in(key, i))
    float(loss)

    outdir = args.outdir or tempfile.mkdtemp(prefix="pemp_prof_")
    tic = time.perf_counter()
    with jax.profiler.trace(outdir):
        for i in range(args.steps):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, batch,
                jax.random.fold_in(key, 100 + i))
        float(loss)                                      # close the window
    wall = time.perf_counter() - tic

    xplanes = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    ops, step_ns, n_steps = device_plane_ops(
        xplanes[-1], fallback_steps=args.steps,
        # make_train_step's inner jit is named _step -> "jit__step";
        # bench_train's is named step -> "jit_step"
        module_prefix="jit__step" if args.family else "jit_step")
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
    wall_ms = wall * 1e3 / args.steps
    for name, ns in top:
        print(f"  {ns / 1e6 / n_steps:8.3f} ms/step  {name[:90]}",
              file=sys.stderr)
    print(json.dumps({
        "family": args.family or "pemp_stage1(bench_train)",
        "bs": bs, "hw": hw, "loss": args.loss,
        "pallas": bool(args.pallas),
        "steps_traced": args.steps,
        "wall_ms_per_step": round(wall_ms, 2),
        "device_ms_per_step": round(dev_ms, 2),
        "device_eps": round(bs / (dev_ms / 1e3), 1) if dev_ms else None,
        "dispatch_gap_ms_per_step": round(wall_ms - dev_ms, 2),
        "groups_ms_per_step": {k: round(v / 1e6 / n_steps, 2)
                               for k, v in sorted(grouped.items(),
                                                  key=lambda kv: -kv[1])},
        "trace_dir": outdir,
    }))


if __name__ == "__main__":
    main()
