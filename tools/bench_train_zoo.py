#!/usr/bin/env python
"""Per-family TRAIN-step throughput + MFU on the real chip.

The r2/r3 zoo tables (tools/bench_zoo.py, STATUS.md) are eval-only and
bench_train.py covers only the flagship PEMP-s1 — every other family's
training cost (the reference's expensive loop, SURVEY §3.1) had never
been measured. Each row here builds the REAL entry runtime at the
reference preset (scripts/*.sh resolution/batch/loss — e.g. reference
scripts/canet.sh 321², panet.sh bs=1, rpmms.sh 481², pfenet.sh 473²)
and times the production train step from parallel/step.make_train_step:
forward + loss (incl. aux terms: PANet align, RPMMs 3-part, PFENet
per-scale) + backward + clip + SGD/masked-frozen update + BN stats.

Scope note: the step is the DEVICE program only — CaNet's host-side
history write-back (post_step) and the input pipeline are excluded, as
in bench_train.py; eval-side throughput lives in tools/bench_zoo.py.

MFU = XLA cost-analysis FLOPs of the compiled step / (best step time x
chip peak bf16 FLOP/s). Timing discipline per CLAUDE.md: device-resident
batches, several launches per round, a VALUE fetch closes each window,
best-of-rounds (pemp_tpu/utils/benchtime.py).

Usage: python tools/bench_train_zoo.py [row ...]   (default: all rows)
Prints one JSON line per row.
"""

import importlib
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# arm BEFORE the jax import (jax-free module): a tunnel outage can
# wedge the first device touch forever. Only when run as the benchmark
# itself — importers (tools/profile_train.py) never call _progress, and
# an armed never-refreshed watchdog would os._exit their healthy runs.
from pemp_tpu.utils.benchtime import arm_watchdog, best_of_rounds

if __name__ == "__main__":
    _progress, _disarm = arm_watchdog("bench_train_zoo")
else:
    _progress = _disarm = lambda: None

import jax
import jax.numpy as jnp

LAUNCHES = 10
BUDGET_S = 150
EXTEND_S = 240

# peak bf16 FLOP/s per chip by device kind (public spec sheets)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}

RUNTIMES = {
    "baseline": "BaselineRuntime",
    "pemp_stage1": "Stage1Runtime",
    "pemp_stage2": "Stage2Runtime",
    "panet": "PANetRuntime",
    "canet": "CaNetRuntime",
    "rpmms": "RPMMsRuntime",
    "pfenet": "PFENetRuntime",
}

# row -> (entry family, hw, bs, extra overrides); hw/bs are the
# scripts/*.sh presets except the explicitly-labeled tuned rows
ROWS = {
    "baseline": ("baseline", 401, 4, {}),
    "pemp_stage1": ("pemp_stage1", 401, 4,
                    {"loss": "cedt", "net.backbone": "resnet50"}),
    "pemp_stage2": ("pemp_stage2", 401, 4,
                    {"loss": "cedt", "net.backbone": "resnet50",
                     "net.backbone2": "resnet50", "net.cm": "True",
                     "s1.id": "1"}),
    # the published 5-shot tables train with shot=5 (reference README
    # PASCAL/COCO 5-shot rows); S=5 support images per episode
    "s1_5shot": ("pemp_stage1", 401, 4,
                 {"loss": "cedt", "net.backbone": "resnet50",
                  "shot": "5"}),
    "s2_5shot": ("pemp_stage2", 401, 4,
                 {"loss": "cedt", "net.backbone": "resnet50",
                  "net.backbone2": "resnet50", "net.cm": "True",
                  "s1.id": "1", "shot": "5"}),
    "panet": ("panet", 401, 1, {}),
    # the reference preset bs=1 is latency-bound on TPU (~20 ms step
    # floor); this row is the recommended data-parallel operating point
    "panet8": ("panet", 401, 8, {}),
    "canet": ("canet", 321, 4, {}),
    # CaNet at larger batch: its 707-GFLOP bs=4 step is the smallest
    # program in the zoo; bs=8 amortizes per-step overheads further
    "canet8": ("canet", 321, 8, {}),
    "rpmms": ("rpmms", 481, 4, {}),
    # rpmms at larger batch: the 481² preset's device profile is FLAT
    # (no single op >1.3% of the step) with ~20% layout copies; the
    # only lever left is batch-amortizing them (docs/DESIGN.md)
    "rpmms8": ("rpmms", 481, 8, {}),
    "pfenet": ("pfenet", 473, 4, {}),
}

# rows that deviate from the reference protocol toward the TPU-optimal
# operating point (everything else mirrors a published preset)
TUNED_ROWS = {"panet8", "rpmms8", "canet8"}


def assemble_runtime(name, hw, bs, extra, model_dir, on_tpu):
    mod = importlib.import_module(f"entry.{name}")
    overrides = {
        "split": "0", "data.dataset": "SYNTH",
        "data.height": str(hw), "data.width": str(hw),
        "data.bs": str(bs), "data.train_n": str(2 * bs),
        "data.test_n": str(bs), "g.model_dir": model_dir,
        **extra,
    }
    if not on_tpu:
        overrides["tpu.precision"] = "f32"
    cfg, run = mod.ex.assemble("train", overrides, observed=False)
    return getattr(mod, RUNTIMES[name])(cfg, run)


def seed_stage1_snapshot(model_dir, hw, bs, on_tpu):
    """Stage 2 loads a frozen stage-1 snapshot from disk
    (entry/pemp_stage2.py _load_stage1); seed a freshly-initialized one
    under <model_dir>/pemp_stage1/1/ so the cascade row measures the
    production path without a full stage-1 training run first."""
    from pemp_tpu.core import checkpoint as ckpt_lib

    rt = assemble_runtime(
        "pemp_stage1", hw, bs,
        {"loss": "cedt", "net.backbone": "resnet50"}, model_dir, on_tpu)
    variables = rt.init_variables()
    ckpt_lib.save(Path(model_dir) / "pemp_stage1" / "1" / "bestckpt.msgpack",
                  variables)


def make_family_setup(name, on_tpu, model_dir):
    """Build the production train step for one family at its preset
    (shared by bench_row and tools/profile_train.py --family): returns
    (step, state, batch, lr, key, bs, hw) with a device-resident batch.
    """
    from pemp_tpu.core import solver as solver_lib
    from pemp_tpu.core.trainer import TrainState
    from pemp_tpu.data import datasets
    from pemp_tpu.parallel.step import (device_batch, make_train_step,
                                        make_train_step_fused)

    family, hw, bs, extra = ROWS[name]
    if not on_tpu:
        hw, bs = (41 if family == "pfenet" else 33), (1 if bs == 1 else 2)
    if family == "pemp_stage2":
        seed_stage1_snapshot(model_dir, hw, bs, on_tpu)
    runtime = assemble_runtime(family, hw, bs, extra, model_dir, on_tpu)
    cfg = runtime.cfg

    train_ds, train_loader, _ = datasets.load(cfg, "train")
    train_ds, train_loader = runtime.wrap_data(train_ds, train_loader, True)
    if hasattr(train_ds, "sample_tasks"):   # trainer does this per epoch
        train_ds.sample_tasks()
    host_batch = next(iter(train_loader))

    variables = runtime.init_variables()
    tx, opt_state, lr_policy, _ = solver_lib.get(
        cfg.tr, variables["params"], runtime.frozen_patterns, max_steps=1000)
    state = TrainState(variables["params"], variables["batch_stats"],
                       opt_state)
    step = make_train_step(runtime.make_loss_fn(), tx, runtime.mesh,
                           compact_wire=cfg.tpu.compact_wire)
    # the production fused launch (tpu.fuse_steps) for the --fuse arm;
    # runtimes with a chunk-boundary host flush (CaNet's history
    # write-back, post_chunk) get the aux outputs + the flush itself in
    # the timed path — the honest production wall number, not a
    # device-only ceiling
    step.post_chunk = getattr(runtime, "post_chunk", None)
    step.host_batch = host_batch
    step.make_fused = lambda k: make_train_step_fused(
        runtime.make_loss_fn(), tx, k, runtime.mesh,
        compact_wire=cfg.tpu.compact_wire,
        with_aux=step.post_chunk is not None)

    # device-resident batch: the step's own device_batch passes
    # jax.Array values through, so H2D stays out of the timed window
    batch = device_batch(host_batch, step.sharding, cfg.tpu.compact_wire)
    return (step, state, batch, jnp.float32(lr_policy.lr),
            jax.random.PRNGKey(1), bs, hw)


def bench_row(name, on_tpu, model_dir, fuse=0):
    step, state, batch, lr, key, bs, hw = make_family_setup(
        name, on_tpu, model_dir)

    lowered = step.jit_step.lower(state, batch, lr, key)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    if fuse > 1:
        # the production fused launch: k steps per program (the batch is
        # reused k times — device-resident either way, H2D excluded).
        # flops stays the single-step cost; a launch is `fuse` steps.
        # With a post_chunk runtime (CaNet) each launch also pays the
        # chunk-boundary history flush, as production does.
        fused = step.make_fused(fuse)
        post_chunk = step.post_chunk
        hbatches = [step.host_batch] * fuse

        def launch(st, rng_i):
            """One fused launch -> (state, losses, aux-or-None)."""
            out = fused(st, [batch] * fuse, [float(lr)] * fuse, rng_i, 0)
            return out if post_chunk is not None else (*out, None)

        state, ls, aux = launch(state, key)
        if post_chunk is not None:
            post_chunk(aux, hbatches)
        float(ls[-1])
        holder = {"state": state}

        # ONE timing body for both arms; with a post_chunk runtime each
        # launch also pays the production chunk flush, deferred by one
        # launch exactly like core/trainer.py _run_epoch_fused (the
        # host fetch overlaps the next launch's device compute)
        def timed_round():
            tic = time.perf_counter()
            st = holder["state"]
            pending = None
            for i in range(LAUNCHES):
                st, ls, aux = launch(st, jax.random.fold_in(key, i))
                if post_chunk is not None:
                    if pending is not None:
                        post_chunk(pending, hbatches)
                    pending = aux
            if pending is not None:
                post_chunk(pending, hbatches)
            holder["state"] = st
            float(ls[-1])
            dt = time.perf_counter() - tic
            return LAUNCHES * fuse * bs / dt, dt / LAUNCHES
    else:
        state, loss, _ = step(state, batch, lr, key)
        float(loss)     # value fetch (block_until_ready can return early
        #                 through the tunneled backend; CLAUDE.md)
        holder = {"state": state}

        def timed_round():
            tic = time.perf_counter()
            st = holder["state"]
            for i in range(LAUNCHES):
                st, loss, _ = step(st, batch, lr,
                                   jax.random.fold_in(key, i))
            holder["state"] = st
            float(loss)
            dt = time.perf_counter() - tic
            return LAUNCHES * bs / dt, dt / LAUNCHES

    eps = best_of_rounds(timed_round, on_tpu, budget_s=BUDGET_S, progress=_progress,
                         extend_s=EXTEND_S, off_tpu_budget_s=10)

    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_BF16.items() if k in kind), None)
    mfu = (flops * eps / bs) / peak if (peak and eps) else None
    label = "tuned" if name in TUNED_ROWS else "preset"
    if fuse > 1:
        label += f", fuse={fuse}"
    return {
        "metric": f"{name} train step eps/s/chip "
                  f"({hw}x{hw}, bs={bs}, {label})",
        "value": round(eps, 1), "unit": "episodes/s",
        "step_gflops": round(flops / 1e9, 1),
        "mfu": round(mfu, 4) if mfu is not None else None,
    }


def main():
    args = sys.argv[1:]
    fuse = 0
    if "--fuse" in args:
        i = args.index("--fuse")
        try:
            fuse = int(args[i + 1])
        except (IndexError, ValueError):
            sys.exit("--fuse needs an integer (steps per launch)")
        del args[i:i + 2]
    rows = args or list(ROWS)
    unknown = [r for r in rows if r not in ROWS]
    if unknown:
        sys.exit(f"unknown row(s) {unknown}; valid: {sorted(ROWS)}")
    on_tpu = jax.devices()[0].platform == "tpu"
    with tempfile.TemporaryDirectory() as model_dir:
        for r in rows:
            print(json.dumps(bench_row(r, on_tpu, model_dir, fuse)),
                  flush=True)


if __name__ == "__main__":
    main()
