#!/usr/bin/env python
"""A/B sweep of XLA:TPU compiler flags on the production train step.

Motivation (docs/DESIGN.md "Train-step device profile"): the PEMP-s1
train step saturates at bs=4 — at bs=8/16 the 51-square backward conv
fusions spill VMEM and per-episode device time RISES (5.0 -> 6.0 ms).
The spill is a compiler scheduling/fusion decision, so before accepting
MFU 0.33 as the ceiling we A/B the public XLA:TPU knobs that move it:

- ``--xla_tpu_scoped_vmem_limit_kib``: the VMEM budget the fusion
  sizer assumes; raising it lets bigger fusions stay resident, lowering
  it forces splits (either direction can win — the cliff is a working-
  set-vs-locality tradeoff).
- ``--xla_tpu_enable_latency_hiding_scheduler``: overlap-oriented
  schedule (mainly collectives, but also reorders copies).

Each arm runs in a SUBPROCESS because XLA_FLAGS is parsed once at
backend initialization; arms that the current backend rejects are
recorded as errors, not fatal (flag names drift between releases).
Timing discipline follows bench_train.py (device-resident batch,
value-fetch window close, best-of-rounds).

NOTE (this dev image): the tunneled PJRT plugin's local flag parser
rejects libtpu-side --xla_tpu_* flags (docs/DESIGN.md "Train-step
device profile"), so the non-base arms error here by construction —
run this on a real TPU VM, where XLA_FLAGS reaches the XLA:TPU
compiler. The harness records per-arm errors and still reports any
arms that ran.

Usage:  python tools/exp_xla_flags.py [--bs 4 8] [--budget 90]
Off-chip smoke: JAX_PLATFORMS=cpu python tools/exp_xla_flags.py --smoke
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).parents[1]

ARMS = {
    "base": "",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem8m": "--xla_tpu_scoped_vmem_limit_kib=8192",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem64m+lhs": ("--xla_tpu_scoped_vmem_limit_kib=65536 "
                    "--xla_tpu_enable_latency_hiding_scheduler=true"),
}

_RUNNER = r"""
import argparse, json, sys
sys.path.insert(0, {root!r})
import bench_train
args = argparse.Namespace(hw=401, bs={bs}, loss="cedt")
r = bench_train.bench_one(True, args, budget_s={budget})
print("RESULT " + json.dumps(r))
"""


def run_arm(name: str, flags: str, bs: int, budget: int) -> dict:
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    if flags:
        # append to (not replace) any ambient XLA_FLAGS
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             _RUNNER.format(root=str(ROOT), bs=bs, budget=budget)],
            env=env, capture_output=True, text=True,
            timeout=budget + 420)
    except subprocess.TimeoutExpired:
        return {"arm": name, "bs": bs, "error": "timeout"}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r.update(arm=name, bs=bs, flags=flags)
            return r
    return {"arm": name, "bs": bs, "error": out.stderr.strip()[-400:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--budget", type=int, default=90,
                    help="per-arm measurement budget (s)")
    ap.add_argument("--arms", nargs="+", default=list(ARMS),
                    choices=list(ARMS))
    ap.add_argument("--smoke", action="store_true",
                    help="one tiny off-chip arm (harness check)")
    args = ap.parse_args()

    if args.smoke:
        r = run_arm("base", "", 2, 10)
        print(json.dumps(r))
        sys.exit(0 if "error" not in r else 1)

    results = []
    for bs in args.bs:
        for name in args.arms:
            r = run_arm(name, ARMS[name], bs, args.budget)
            results.append(r)
            print(json.dumps(r), flush=True)

    ok = [r for r in results if "error" not in r]
    if ok:
        best = max(ok, key=lambda r: r["episodes_per_s"])
        base = {(r["bs"]): r for r in ok if r["arm"] == "base"}
        rel = (best["episodes_per_s"] / base[best["bs"]]["episodes_per_s"]
               if best["bs"] in base else None)
        print(json.dumps({
            "best_arm": best["arm"], "best_bs": best["bs"],
            "best_eps_s": best["episodes_per_s"],
            "vs_base_same_bs": round(rel, 4) if rel else None}))


if __name__ == "__main__":
    main()
