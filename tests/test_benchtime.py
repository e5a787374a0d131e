"""The shared best-of-rounds loop (pemp_tpu/utils/benchtime.py) is the
one copy of the slow-tunnel measurement heuristic used by bench.py (the
driver contract) and tools/bench_zoo.py — pin its behavior."""

import itertools

from pemp_tpu.utils.benchtime import best_of_rounds


def test_returns_best_rate():
    rates = iter([(10.0, 0.1), (50.0, 0.1), (30.0, 0.1)])

    def timed_round():
        return next(rates, (1.0, 0.1))

    assert best_of_rounds(timed_round, on_tpu=False,
                          off_tpu_budget_s=60, max_rounds=3) == 50.0


def test_off_tpu_ignores_slow_launch_extension():
    """Off-chip there is no tunnel: the budget alone bounds the loop even
    when every launch is 'slow'."""
    calls = itertools.count()

    def timed_round():
        next(calls)
        return 5.0, 99.0        # way above slow_launch_s

    best_of_rounds(timed_round, on_tpu=False, off_tpu_budget_s=0,
                   slow_launch_s=0.5, max_rounds=50)
    assert next(calls) == 1     # stopped after the first round


def test_all_slow_window_extends_then_hard_stops(monkeypatch):
    """On-chip, when no round's per-launch latency ever drops below the
    threshold, sampling continues past the budget up to extend_s."""
    clock = [0.0]
    monkeypatch.setattr("pemp_tpu.utils.benchtime.time",
                        type("T", (), {"time": lambda: clock[0]}))
    n = itertools.count()

    def timed_round():
        next(n)
        clock[0] += 10.0
        return 5.0, 99.0        # every round slow

    best_of_rounds(timed_round, on_tpu=True, budget_s=15, extend_s=30,
                   slow_launch_s=0.5, max_rounds=1000)
    # budget alone would stop after round 2 (t=20 > 15); the all-slow
    # extension keeps going until hard_stop at t=45 -> 5 rounds
    assert next(n) == 5


def test_one_fast_round_stops_at_budget(monkeypatch):
    clock = [0.0]
    monkeypatch.setattr("pemp_tpu.utils.benchtime.time",
                        type("T", (), {"time": lambda: clock[0]}))
    n = itertools.count()

    def timed_round():
        i = next(n)
        clock[0] += 10.0
        return (100.0, 0.1) if i == 0 else (5.0, 99.0)

    best = best_of_rounds(timed_round, on_tpu=True, budget_s=15,
                          extend_s=30, slow_launch_s=0.5, max_rounds=1000)
    assert best == 100.0
    assert next(n) == 2         # one healthy round -> stop at the budget


def test_arm_watchdog_fires_on_wedge_silent_on_progress(capsys):
    """The shared bench-tool watchdog (bench_train/bench_zoo arm it
    before their jax imports) is a NO-PROGRESS bound: a wedge prints the
    WATCHDOG line once; refreshed progress keeps it silent; 0 disables
    without arming a 0-second deadline."""
    import time

    from pemp_tpu.utils.benchtime import arm_watchdog

    # wedge: no progress() within the window -> fires (exit suppressed)
    progress, disarm = arm_watchdog("t", watchdog_s=0.2, exit_code=None)
    time.sleep(0.8)
    assert "WATCHDOG: t" in capsys.readouterr().err
    disarm()

    # alive: progress refreshes the deadline -> silent. The window is
    # 10x the progress cadence: a sleep() overshooting by even a full
    # second on a loaded box must not let the monitor see a false gap.
    progress, disarm = arm_watchdog("u", watchdog_s=2.0, exit_code=None)
    for _ in range(4):
        time.sleep(0.2)
        progress()
    disarm()
    time.sleep(0.3)    # let any (wrong) firing land before asserting
    assert capsys.readouterr().err == ""

    # disabled: 0 must not arm a 0-second deadline
    progress, disarm = arm_watchdog("v", watchdog_s=0, exit_code=None)
    time.sleep(0.3)
    assert capsys.readouterr().err == ""
    disarm()
