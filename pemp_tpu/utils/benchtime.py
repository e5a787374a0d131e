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

import time


def best_of_rounds(timed_round, on_tpu, *, budget_s=360.0, extend_s=420.0,
                   slow_launch_s=5.0, off_tpu_budget_s=30.0,
                   max_rounds=200):
    """Run ``timed_round() -> (eps, per_launch_seconds)`` repeatedly and
    return the best episodes/s seen.

    Samples until ``budget_s`` (``off_tpu_budget_s`` off-chip, where the
    tunnel heuristic is moot); if by then no round's per-launch latency
    ever dropped to ``slow_launch_s`` the link is degraded, so sampling
    continues up to ``extend_s`` longer hoping for one healthy round.
    """
    best, best_launch = 0.0, float("inf")
    budget = budget_s if on_tpu else off_tpu_budget_s
    deadline = time.time() + budget
    hard_stop = deadline + (extend_s if on_tpu else 0.0)
    for _ in range(max_rounds):
        eps, launch_s = timed_round()
        best = max(best, eps)
        best_launch = min(best_launch, launch_s)
        now = time.time()
        if now > deadline and (best_launch <= slow_launch_s or not on_tpu):
            break
        if now > hard_stop:
            break
    return best
