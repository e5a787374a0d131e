"""Shared best-of-rounds measurement loop for the tunnel-linked chip.

The tunneled device link flips between a fast mode and a pathological
slow mode that can hold for minutes; a single fast round is
representative of the hardware, an all-slow window is not. Benchmarks
therefore take the best of many short rounds within a time budget and,
when EVERY round's per-launch latency stayed above ``slow_launch_s``
(a link property, not a workload one — an absolute eps floor would
misfire on genuinely slower configs), keep sampling up to ``extend_s``
longer: one healthy round is enough for a faithful number.

One copy of the heuristic — bench.py and tools/bench_zoo.py share it so
a retuning (like the r3 SLOW_EPS -> per-launch-latency change) cannot
silently diverge between the driver benchmark and the zoo tools.
"""

import os
import sys
import threading
import time


def arm_watchdog(label: str, *, watchdog_s=None,
                 env: str = "PEMP_BENCH_WATCHDOG_S",
                 default_s: float = 2700.0, exit_code=3):
    """NO-PROGRESS watchdog for tunnel-wedge-prone bench tools.

    During a tunnel outage a device launch (or the first jax touch) can
    hang forever; a bench that hangs emits nothing and a `timeout`-killed
    one emits no diagnosis. Arm this BEFORE the jax import (this module
    is jax-free, as is the ``pemp_tpu`` package import itself): if no
    ``progress()`` call arrives within the window, a WATCHDOG line is
    printed to stderr and the process exits ``exit_code``.

    The deadline is a no-progress bound, not a total budget — every
    completed launch/round refreshes it, so a slow-but-alive link never
    trips it (same semantics as bench.py's driver-contract watchdog,
    which stays separate because its firing must print the one-JSON-line
    contract on stdout).

    Returns ``(progress, disarm)``. ``watchdog_s`` <= 0 disables.
    ``exit_code=None`` suppresses the exit (unit tests).
    """
    ws = (float(os.environ.get(env, str(default_s)))
          if watchdog_s is None else float(watchdog_s))
    done = threading.Event()
    last = [time.monotonic()]

    def progress():
        last[0] = time.monotonic()

    def disarm():
        done.set()

    if ws <= 0:
        return progress, disarm

    def run():
        poll = min(15.0, max(0.05, ws / 4))
        while not done.wait(timeout=poll):
            if time.monotonic() - last[0] <= ws:
                continue
            if done.is_set():
                return
            print(f"WATCHDOG: {label} — no completed launch for "
                  f"{ws:.0f}s (device link wedged)",
                  file=sys.stderr, flush=True)
            if exit_code is not None:
                os._exit(exit_code)
            return

    threading.Thread(target=run, daemon=True).start()
    return progress, disarm


def best_of_rounds(timed_round, on_tpu, *, budget_s=360.0, extend_s=420.0,
                   slow_launch_s=5.0, off_tpu_budget_s=30.0,
                   max_rounds=200, progress=None):
    """Run ``timed_round() -> (eps, per_launch_seconds)`` repeatedly and
    return the best episodes/s seen.

    Samples until ``budget_s`` (``off_tpu_budget_s`` off-chip, where the
    tunnel heuristic is moot); if by then no round's per-launch latency
    ever dropped to ``slow_launch_s`` the link is degraded, so sampling
    continues up to ``extend_s`` longer hoping for one healthy round.
    ``progress`` (e.g. from ``arm_watchdog``) is called after every
    completed round.
    """
    best, best_launch = 0.0, float("inf")
    budget = budget_s if on_tpu else off_tpu_budget_s
    deadline = time.time() + budget
    hard_stop = deadline + (extend_s if on_tpu else 0.0)
    for _ in range(max_rounds):
        eps, launch_s = timed_round()
        if progress is not None:
            progress()
        best = max(best, eps)
        best_launch = min(best_launch, launch_s)
        now = time.time()
        if now > deadline and (best_launch <= slow_launch_s or not on_tpu):
            break
        if now > hard_stop:
            break
    return best
