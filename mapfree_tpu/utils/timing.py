"""Wall-clock stage accounting for the pipelined inference sweep.

The e2e sweep (disk -> decode -> H2D -> forward -> pose extraction -> zip)
runs stages in separate threads; a single elapsed number cannot say which
stage bounds throughput (the round-2 sweep sat 30x under the north star with
no way to tell decode from tunnel H2D). ``StageTimes`` accumulates per-stage
busy time and call counts; because stages overlap, the times do not sum to
elapsed — each stage's busy time is a lower bound on what the sweep would
cost if that stage alone were the bottleneck.

The reference has no analog (tqdm-only observability, SURVEY.md §5).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class StageTimes:
    """Thread-safe-enough (GIL float accumulation) per-stage timer."""

    def __init__(self):
        self.seconds = defaultdict(float)
        self.calls = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def add(self, name: str, seconds: float):
        self.seconds[name] += seconds
        self.calls[name] += 1

    def reset(self):
        """Zero the counters (e.g. after a warm-up window, so the summary
        reflects only the measured region)."""
        self.seconds.clear()
        self.calls.clear()

    def summary(self) -> dict:
        return {k: round(v, 4) for k, v in sorted(self.seconds.items())}

    def __repr__(self):
        parts = [
            f"{k}={self.seconds[k]:.3f}s/{self.calls[k]}"
            for k in sorted(self.seconds)
        ]
        return "StageTimes(" + ", ".join(parts) + ")"


class _NullTimes:
    """No-op stand-in so call sites never branch on None."""

    @contextmanager
    def stage(self, name: str):
        yield

    def add(self, name: str, seconds: float):
        pass

    def summary(self) -> dict:
        return {}


NULL_TIMES = _NullTimes()
