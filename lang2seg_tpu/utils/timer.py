"""Named timers with running averages (capability parity with the
reference's global Timer, `lib/utils/timer.py:12-44`, which wraps each
train step and prints `speed: %.3fs / iter`). Device sync happens via
block_until_ready at call sites; `jax.profiler` trace hooks live in
engine/trainer.py."""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict


class Timer:
    def __init__(self):
        self._start: Dict[str, float] = {}
        self._total = defaultdict(float)
        self._calls = defaultdict(int)
        self._diff = defaultdict(float)

    def tic(self, name: str = "default"):
        self._start[name] = time.perf_counter()

    def toc(self, name: str = "default") -> float:
        dt = time.perf_counter() - self._start[name]
        self._diff[name] = dt
        self._total[name] += dt
        self._calls[name] += 1
        return dt

    def average_time(self, name: str = "default") -> float:
        return self._total[name] / max(self._calls[name], 1)

    def last(self, name: str = "default") -> float:
        return self._diff[name]


timers = Timer()
