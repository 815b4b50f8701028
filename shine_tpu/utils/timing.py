"""Named monotonic-clock interval timing.

Mirrors the reference's timing::Timing (/root/reference/src/common/timing.hh:
create_enroll + Interval start/stop/add with accumulated spans, exported as
a `timings` JSON object). Spans the rebuild enrolls by convention: `build`,
`query`, `routing`, `placement_fetch`, `placement_kmeans`,
`load_index_buffer`, `store_index_buffer`, `compile` — matching the
reference's enrolled span names (compute_node.cc:29-30,526-553).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class Interval:
    __slots__ = ("name", "total_s", "_t0", "count")

    def __init__(self, name: str):
        self.name = name
        self.total_s = 0.0
        self._t0 = None
        self.count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is None:
            raise RuntimeError(f"interval {self.name!r} not started")
        self.total_s += time.perf_counter() - self._t0
        self._t0 = None
        self.count += 1

    def add(self, seconds: float) -> None:
        self.total_s += seconds
        self.count += 1

    def clear(self) -> None:
        self.total_s = 0.0
        self._t0 = None
        self.count = 0


class Timing:
    """Registry of named intervals; exports milliseconds like the
    reference's JSON (timing.cc:44-52)."""

    def __init__(self):
        self._intervals: dict[str, Interval] = {}

    def create_enroll(self, name: str) -> Interval:
        if name not in self._intervals:
            self._intervals[name] = Interval(name)
        return self._intervals[name]

    def __getitem__(self, name: str) -> Interval:
        return self.create_enroll(name)

    @contextmanager
    def measure(self, name: str):
        iv = self.create_enroll(name)
        iv.start()
        try:
            yield iv
        finally:
            iv.stop()

    def as_dict(self) -> dict[str, float]:
        return {n: round(iv.total_s * 1e3, 3) for n, iv in self._intervals.items()}

    def clear(self) -> None:
        for iv in self._intervals.values():
            iv.clear()
