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
import subprocess
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# ---------------------------------------------------------------------
# Supervisor: a wedged tunnel link wedges the IN-PROCESS jax runtime for
# good — a hung launch RPC never returns even after the relay heals, so
# a single-process bench that hits an outage can only ever emit the
# WATCHDOG zero line, even when the outage ends minutes later. The fix:
# the top-level invocation (the driver's bare `python bench.py`) acts as
# a jax-free supervisor that runs the measurement in a CHILD process.
# If the child's no-progress watchdog fires (exit 3), a FRESH child —
# fresh runtime, fresh tunnel connection — retries until the supervisor
# budget (PEMP_BENCH_SUPERVISOR_TOTAL_S, default 2700s) runs out, and
# only then is the child's watchdog zero line relayed. Worst case is
# time-equivalent to the old single 2700s watchdog; any recovery inside
# the budget now yields a real measurement. The one-JSON-line stdout
# contract is preserved: failed attempts' lines are dropped, exactly one
# child's stdout is relayed.
# ---------------------------------------------------------------------
_CHILD_WATCHDOG_S = 900.0       # per-attempt no-progress bound


def _supervisor_enabled() -> bool:
    if os.environ.get("PEMP_BENCH_CHILD"):
        return False            # we ARE the measurement child
    if os.environ.get("PEMP_BENCH_SUPERVISE", "1").lower() in ("0", "false"):
        return False
    # the watchdog-contract test hook simulates a permanent wedge to pin
    # the single-process watchdog behavior — don't retry around it
    if float(os.environ.get("PEMP_BENCH_FAKE_WEDGE_S", "0") or 0):
        return False
    return True


def _usable_json_line(out: str) -> bool:
    """Does the child's stdout carry a parseable contract line?"""
    for ln in out.strip().splitlines():
        try:
            doc = json.loads(ln)
        except ValueError:
            continue
        if isinstance(doc, dict) and "value" in doc and "metric" in doc:
            return True
    return False


_MAX_CRASH_RETRIES = 2  # crashes are usually deterministic bugs, not
#                         outages — bound them so a broken build fails in
#                         seconds, not after the full supervisor budget


def _run_supervised() -> int:
    import signal

    total_s = float(os.environ.get("PEMP_BENCH_SUPERVISOR_TOTAL_S", "2700"))
    t0 = time.monotonic()
    live = [None]       # the current child, for signal forwarding

    # killing the supervisor must never orphan a measurement child (a
    # wedged child ignores the pipe closing and would keep a core busy)
    def _forward(signum, _frame):
        if live[0] is not None:
            try:
                live[0].kill()
            except OSError:
                pass
        os._exit(128 + signum)

    signal.signal(signal.SIGTERM, _forward)
    signal.signal(signal.SIGINT, _forward)

    attempt = 0
    crash_retries = 0
    last_out, last_code = "", 3
    while True:
        attempt += 1
        remaining = total_s - (time.monotonic() - t0)
        env = dict(os.environ, PEMP_BENCH_CHILD="1")
        # explicit user watchdog settings win; otherwise each attempt's
        # watchdog is capped at the remaining budget so the worst-case
        # supervisor wall time stays ~total_s (not total_s + a full
        # child watchdog), while never dropping below a bound a healthy
        # cold start (imports + compile) can satisfy
        if "PEMP_BENCH_WATCHDOG_S" not in os.environ:
            env["PEMP_BENCH_WATCHDOG_S"] = str(
                min(_CHILD_WATCHDOG_S, max(120.0, remaining)))
        live[0] = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, text=True)   # stderr passes through
        out, _ = live[0].communicate()
        code = live[0].returncode
        live[0] = None
        usable = _usable_json_line(out)
        wedged = code == 3 and "WATCHDOG" in out
        # a child that dies without a contract line (segfault / OOM /
        # killed) is as contract-breaking as a wedge — retry it too,
        # but bounded (see _MAX_CRASH_RETRIES)
        crashed = code != 0 and not usable and not wedged
        remaining = total_s - (time.monotonic() - t0)
        if wedged and remaining > 60.0:
            print(f"[bench supervisor] attempt {attempt} wedged; "
                  f"retrying in a fresh process ({remaining:.0f}s budget "
                  "left)", file=sys.stderr, flush=True)
            last_out, last_code = out, code
            continue
        if crashed and remaining > 60.0 and crash_retries < _MAX_CRASH_RETRIES:
            crash_retries += 1
            print(f"[bench supervisor] attempt {attempt} died rc={code} "
                  "with no contract line; retrying "
                  f"({crash_retries}/{_MAX_CRASH_RETRIES})",
                  file=sys.stderr, flush=True)
            last_out, last_code = out, code
            continue
        if not usable and not wedged:
            # budget/retries exhausted with nothing relayable: the
            # supervisor itself honors the one-JSON-line contract
            if _usable_json_line(last_out):
                out, code = last_out, last_code
            else:
                out = json.dumps({
                    "metric": "PEMP-s1 r50 1-shot eval episodes/sec/chip "
                              "(SUPERVISOR: no attempt produced a "
                              f"measurement; last child rc={code})",
                    "value": 0.0,
                    "unit": "episodes/s",
                    "vs_baseline": 0.0,
                }) + "\n"
                code = 3
        sys.stdout.write(out)
        sys.stdout.flush()
        return code


if __name__ == "__main__" and _supervisor_enabled():
    sys.exit(_run_supervised())

# test hooks for the SUPERVISOR failure paths (we are the child here —
# the supervisor, if any, exited above): a child that dies with no
# output at all simulates the segfault/OOM/killed outage mode
if os.environ.get("PEMP_BENCH_FAKE_CRASH"):
    os._exit(7)
_CRASH_ONCE = os.environ.get("PEMP_BENCH_FAKE_CRASH_ONCE_FILE", "")
if _CRASH_ONCE and not os.path.exists(_CRASH_ONCE):
    with open(_CRASH_ONCE, "w") as _f:
        _f.write("crashed")
    os._exit(7)

# test hook for the supervisor RETRY path: the first child to see the
# marker path wedges (creating the marker); retries run clean — a
# one-shot outage the supervisor must recover from. Handled at module
# level so the WEDGING child can take a short private watchdog
# (PEMP_BENCH_FAKE_WEDGE_WATCHDOG_S, default 2s) without poisoning the
# healthy retry children with a bound their cold start can't satisfy
# (imports + jit compile alone take ~20s on a loaded host).
_WEDGE_ONCE_FILE = os.environ.get("PEMP_BENCH_FAKE_WEDGE_ONCE_FILE", "")
_FAKE_WEDGE_THIS_CHILD = bool(_WEDGE_ONCE_FILE) and \
    not os.path.exists(_WEDGE_ONCE_FILE)
if _FAKE_WEDGE_THIS_CHILD:
    with open(_WEDGE_ONCE_FILE, "w") as _f:
        _f.write("wedged")

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
if _FAKE_WEDGE_THIS_CHILD:
    _WATCHDOG_S = float(
        os.environ.get("PEMP_BENCH_FAKE_WEDGE_WATCHDOG_S", "2"))
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
    if _FAKE_WEDGE_THIS_CHILD:    # marker already written at module level
        time.sleep(3600)

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
