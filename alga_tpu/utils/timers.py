"""Phase timers + run statistics (ref: src/Utils/TimeMeasurer.cpp,
src/StatisticsGenerators/*).  Wall-clock (the reference uses clock() which
over-counts under threads — SURVEY.md §5); metrics collected into a dict
and emitted as one JSON blob."""

from __future__ import annotations

import json
import sys
import time
from contextlib import contextmanager


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._starts: dict[str, float] = {}

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._starts.pop(name)
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return dt

    @contextmanager
    def phase(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            dt = self.stop(name)
            print(f"[timer] {name}: {dt:.3f}s", file=sys.stderr)

    def report(self) -> dict:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))


def contig_stats(lengths: list[int]) -> dict:
    """N50-style summary (ref StatisticsGenerator::writeAllStatistics +
    standard assembly metrics)."""
    if not lengths:
        return {"count": 0, "total": 0, "max": 0, "n50": 0, "avg": 0.0}
    ls = sorted(lengths, reverse=True)
    total = sum(ls)
    acc = 0
    n50 = 0
    for x in ls:
        acc += x
        if acc * 2 >= total:
            n50 = x
            break
    return {
        "count": len(ls),
        "total": total,
        "max": ls[0],
        "min": ls[-1],
        "avg": total / len(ls),
        "n50": n50,
    }


def emit_metrics(metrics: dict, stream=sys.stderr) -> None:
    print(json.dumps(metrics, default=float), file=stream)
