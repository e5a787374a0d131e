#!/usr/bin/env python
"""Benchmark: PEMP stage-1 ResNet-50 1-shot eval throughput per chip.

Protocol: the reference eval hot loop (BASELINE.md) — 401x401 episodes,
full forward to input-resolution logits + argmax prediction + TP/FP/FN
counts. TPU-native execution: episodes are batched per launch (B=32) and
metric counts accumulate on device with a single host fetch at the end —
no per-episode host round trip (the reference pays a GPU->CPU sync per
episode; we don't).

Baseline for ``vs_baseline``: the reference publishes no FPS number
(BASELINE.json ``published`` is empty). The denominator is DERIVED in
BASELINE.md ("Derived V100 eval-throughput estimate"): 125.3 GFLOP/episode
(XLA cost analysis of the identical math) / (30% of 15.7 TFLOP/s V100
fp32) + bs=1 launch gaps + the per-episode scipy-EDT/`.item()` host work
= ~42 ms/episode => ~24 eps/s, range 15-40; we divide by the central
estimate 25.0 (favoring the reference). North star: >=5x V100 per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# Watchdog BEFORE the jax import: during a tunnel outage even `import
# jax` can hang (the axon sitecustomize registration blocks on the
# relay, CLAUDE.md), and a bench that hangs forever emits nothing —
# breaking the driver's one-JSON-line contract. The deadline is a
# NO-PROGRESS bound: every completed warmup/round refreshes it, so a
# slow-but-alive link that keeps finishing rounds (slow-mode extension
# can legitimately push a full run past any fixed total budget) never
# trips it and never loses real measurements — only a genuinely wedged
# launch does. The normal path disarms it before the contract line.
_WATCHDOG_S = float(os.environ.get("PEMP_BENCH_WATCHDOG_S", "2700"))
_bench_done = threading.Event()
_last_progress = [time.monotonic()]


def _progress():
    _last_progress[0] = time.monotonic()


def _watchdog():
    if _WATCHDOG_S <= 0:        # 0 = disabled (conventional timeout-knob
        return                  # semantics), not a 0-second deadline
    poll_s = min(15.0, max(0.25, _WATCHDOG_S / 4))
    while not _bench_done.wait(timeout=poll_s):
        if time.monotonic() - _last_progress[0] <= _WATCHDOG_S:
            continue
        if _bench_done.is_set():    # finished while we were checking
            return
        print(json.dumps({
            "metric": "PEMP-s1 r50 1-shot eval episodes/sec/chip "
                      "(WATCHDOG: device link wedged — no completed "
                      f"launch for {_WATCHDOG_S:.0f}s)",
            "value": 0.0,
            "unit": "episodes/s",
            "vs_baseline": 0.0,
        }), flush=True)
        os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

import jax
import jax.numpy as jnp
import numpy as np

V100_EST_EPS = 25.0     # derived reference V100 eval eps/s (BASELINE.md)
HW = 401
BATCH = 256     # measured r2: 717 (B=64) -> 737 (B=128) -> 751 eps/s (B=256)
WARMUP = 2
LAUNCHES = 3            # short rounds: the tunnel link flips between a
ROUNDS = 200            # fast (~0.3s/launch at B=256) and a pathological
BUDGET_S = 360          # (~13s/launch) mode; report the best round seen.
SLOW_LAUNCH_S = 5.0     # if every round's per-launch latency stayed above
EXTEND_S = 420          # this (tunnel degraded — a link property, not a
#                         workload one, so it does not misfire on slower
#                         configs the way an absolute eps floor would),
#                         keep sampling up to EXTEND_S longer — one
#                         healthy round is enough for a faithful number


def main():
    # test hook: simulate a wedged link (no progress) so the watchdog
    # path is a unit-testable contract, not a live-outage anecdote
    fake_wedge = float(os.environ.get("PEMP_BENCH_FAKE_WEDGE_S", "0"))
    if fake_wedge:
        time.sleep(fake_wedge)

    from pemp_tpu.models.pemp_stage1 import PEMPStage1
    from pemp_tpu.core.metrics import tp_fp_fn

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    hw = HW if on_tpu else 65       # CPU fallback keeps the script testable
    batch = BATCH if on_tpu else 2
    launches = LAUNCHES if on_tpu else 2

    model = PEMPStage1(backbone="resnet50", dtype=dtype, use_pallas=on_tpu)

    rng = np.random.RandomState(0)
    sup = jnp.asarray(rng.randn(batch, 1, hw, hw, 3).astype(np.float32))
    fg = (rng.rand(batch, 1, hw, hw, 1) > 0.5).astype(np.float32)
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
        # counts sum over every query (Q=1 here, per the reference
        # protocol, but a Q>1 config cannot silently drop queries)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B,Q,H,W]
        refs = jnp.repeat(ref, pred.shape[1], axis=0)
        return jax.vmap(tp_fp_fn)(pred.reshape(-1, hw, hw), refs).sum(axis=0)

    for _ in range(WARMUP):
        eval_batch(variables, sup, msk, qry, ref).block_until_ready()
        _progress()

    def timed_round():
        tic = time.perf_counter()
        total = jnp.zeros((2, 3), jnp.int32)
        for _ in range(launches):
            total = total + eval_batch(variables, sup, msk, qry, ref)
        total = np.asarray(total)   # single host fetch closes the window
        assert total.shape == (2, 3)
        elapsed = time.perf_counter() - tic
        _progress()     # a completed round = the link is alive
        return launches * batch / elapsed, elapsed / launches

    # Best-of-rounds with slow-tunnel extension (observed: the slow mode
    # can hold for minutes and once recorded 3.3 eps/s for a build that
    # measures 750 in the fast mode) — shared heuristic, one copy.
    from pemp_tpu.utils.benchtime import best_of_rounds
    # PEMP_BENCH_OFF_TPU_BUDGET_S: the CPU-fallback round budget — the
    # suite's driver-contract test shrinks it so a full bench.py
    # subprocess doesn't cost 30s of rounds on every pytest run. TPU
    # timing is unaffected.
    off_budget = float(os.environ.get("PEMP_BENCH_OFF_TPU_BUDGET_S", "30"))
    # PEMP_BENCH_TPU_BUDGET_S: opportunistic short runs during tunnel
    # flaps (one healthy round is enough for a faithful best-of number);
    # the driver's bare invocation keeps the full default budget
    budget_s = float(os.environ.get("PEMP_BENCH_TPU_BUDGET_S",
                                    str(BUDGET_S)))
    eps = best_of_rounds(timed_round, on_tpu, budget_s=budget_s,
                         extend_s=EXTEND_S, slow_launch_s=SLOW_LAUNCH_S,
                         off_tpu_budget_s=off_budget, max_rounds=ROUNDS)
    _bench_done.set()   # disarm the watchdog before the contract line
    print(json.dumps({
        "metric": "PEMP-s1 r50 1-shot eval episodes/sec/chip "
                  f"({hw}x{hw}, B={batch}, "
                  f"{'tpu' if on_tpu else 'cpu-fallback'})",
        "value": round(eps, 3),
        "unit": "episodes/s",
        "vs_baseline": round(eps / V100_EST_EPS, 3),
    }))


if __name__ == "__main__":
    main()
