"""Wall-time budget control (SURVEY.md §2.9 T2).

Reimplements the reference's timeKeeper semantics
(/root/reference/code/timeKeeper.py:33-73) as a driver-side utility:
track elapsed durations, keep the last ≤15, and stop *before* starting
work predicted to exceed the budget (Next_Elapse = elapsed so far +
running average — timeKeeper.py:57-58). The reference raises
TimeKeeperError and marks partial items Wall_Time_Exceeded
(modifier.py:199-202); here the caller checks ``should_continue()``
between driver-side batches (Spark tasks themselves are not preempted —
batch boundaries are the check points, matching the reference's
per-item check at runner.py:126-140).

The query-shaped form of the same semantics is q_rolling_avg
(operators/windows.py).
"""

from __future__ import annotations

import time


class TimeKeeperError(RuntimeError):
    """Raised when the wall-time budget would be exceeded
    (mirrors /root/reference/code/pyanamo_errors.py:4-21)."""


class TimeKeeper:
    WINDOW = 15  # last-N average (timeKeeper.py:50-56)

    def __init__(self, wall_time_seconds: float, clock=time.monotonic):
        self.budget = float(wall_time_seconds)
        self._clock = clock
        self._start = clock()
        self._durations: list[float] = []

    @property
    def elapsed(self) -> float:
        return self._clock() - self._start

    def record(self, duration: float) -> None:
        """Record one completed batch/item duration."""
        self._durations.append(float(duration))
        # keep only the most recent WINDOW entries
        if len(self._durations) > self.WINDOW:
            del self._durations[: -self.WINDOW]

    def predicted_next(self) -> float:
        """elapsed + avg(last ≤15 durations) — timeKeeper.py:57-58."""
        if not self._durations:
            return self.elapsed
        avg = sum(self._durations) / len(self._durations)
        return self.elapsed + avg

    def should_continue(self) -> bool:
        """False when already over budget or the next unit of work is
        predicted to overshoot (timeKeeper.py:33-49)."""
        return self.elapsed <= self.budget and self.predicted_next() <= self.budget

    def check(self) -> None:
        if not self.should_continue():
            raise TimeKeeperError(
                f"wall-time budget {self.budget:.1f}s exhausted: "
                f"elapsed={self.elapsed:.1f}s "
                f"predicted_next={self.predicted_next():.1f}s"
            )


def run_batches(batches, process, wall_time_seconds: float):
    """Drive an iterable of batches under a wall-time budget.

    Returns (processed_results, remaining_batches). Remaining batches
    are the analogue of items left 'todo'/'Wall_Time_Exceeded' for the
    next engine run (runner.py:197-211).
    """
    keeper = TimeKeeper(wall_time_seconds)
    done, remaining = [], []
    batch_list = list(batches)
    for idx, batch in enumerate(batch_list):
        if not keeper.should_continue():
            remaining = batch_list[idx:]
            break
        t0 = time.monotonic()
        done.append(process(batch))
        keeper.record(time.monotonic() - t0)
    return done, remaining
