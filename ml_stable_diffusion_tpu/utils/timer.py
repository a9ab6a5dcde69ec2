"""Step timer with mean/median/stdev (reference SampleTimer.swift:22-78)."""

from __future__ import annotations

import statistics
import time


class SampleTimer:
    def __init__(self):
        self._samples: list[float] = []
        self._start: float | None = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self) -> float:
        if self._start is None:
            raise RuntimeError("stop() without start()")
        dt = time.perf_counter() - self._start
        self._samples.append(dt)
        self._start = None
        return dt

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    @property
    def samples(self) -> list[float]:
        return list(self._samples)

    @property
    def mean(self) -> float:
        return statistics.fmean(self._samples)

    @property
    def median(self) -> float:
        return statistics.median(self._samples)

    @property
    def stdev(self) -> float:
        return statistics.stdev(self._samples) if len(self._samples) > 1 else 0.0

    def reset(self):
        self._samples.clear()
        self._start = None
