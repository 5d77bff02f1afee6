"""Wall-clock stage timers with honest device fencing.

Replaces the reference's OpenMP Timer (cpp/include/Timer.h:18-51). All toc()
calls fence outstanding device work via jax.block_until_ready when given a
value, so the numbers are real kernel times, not dispatch times.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


class Timer:
    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self._t0: Optional[float] = None
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self, label: str, fence: Any = None) -> float:
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - (self._t0 if self._t0 is not None else time.perf_counter())
        self.totals[label] += dt
        self.counts[label] += 1
        if self.verbose:
            print(f"[timer] {label}: {dt * 1e3:.2f} ms")
        self._t0 = time.perf_counter()
        return dt

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)
