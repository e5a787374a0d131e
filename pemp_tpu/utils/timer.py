"""Wall-clock step timer (reference: utils/timer.py:4-47).

``cps`` (calls per second) is the throughput number logged as FPS at eval
and it/s during training.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.calls = 0
        self._tic = None

    @contextmanager
    def start(self):
        tic = time.perf_counter()
        try:
            yield self
        finally:
            self.total += time.perf_counter() - tic
            self.calls += 1

    @property
    def cps(self) -> float:
        """Calls per second across all timed sections."""
        if self.total == 0:
            return 0.0
        return self.calls / self.total

    @property
    def spc(self) -> float:
        """Seconds per call."""
        if self.calls == 0:
            return 0.0
        return self.total / self.calls
