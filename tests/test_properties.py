"""Property-based tests (hypothesis) for driver-side semantics that
have no oracle: the TimeKeeper budget logic and invariants of the
histogram bucket chain."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.executor.timekeeper import TimeKeeper


class FakeClock:
    def __init__(self):
        self.now = 0.0

    def __call__(self):
        return self.now


@given(
    durations=st.lists(
        st.floats(min_value=0.01, max_value=1000, allow_nan=False),
        min_size=1,
        max_size=50,
    ),
    budget=st.floats(min_value=1, max_value=100_000),
)
@settings(max_examples=200, deadline=None)
def test_timekeeper_never_predicts_below_elapsed(durations, budget):
    clock = FakeClock()
    tk = TimeKeeper(budget, clock=clock)
    for d in durations:
        tk.record(d)
        clock.now += d
    # prediction is elapsed + a positive average → always ≥ elapsed
    assert tk.predicted_next() >= tk.elapsed
    # window: the average only reflects the last ≤15 durations
    window = durations[-TimeKeeper.WINDOW:]
    expected_avg = sum(window) / len(window)
    assert abs((tk.predicted_next() - tk.elapsed) - expected_avg) < 1e-6
    # should_continue is consistent with its two clauses
    assert tk.should_continue() == (
        tk.elapsed <= budget and tk.predicted_next() <= budget
    )


@given(
    log_length=st.integers(min_value=0, max_value=1000),
    nested_tasks=st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=500, deadline=None)
def test_histogram_bucket_chain_total_and_exclusive(log_length, nested_tasks):
    """The reference's bucket chain (manager.py:880-903): every
    0 ≤ L ≤ N lands in exactly one bucket; L > N (impossible state)
    falls through to no bucket, matching the reference's silent skip."""
    import math

    pct = int(math.floor((log_length / nested_tasks) * 100))
    buckets = [
        ("todo", pct == 0),
        ("Q1", 1 <= pct <= 25),
        ("Q2", 25 < pct <= 50),
        ("Q3", 50 < pct <= 75),
        ("Q4", 75 < pct <= 99),
        ("done", pct == 100),
    ]
    hits = [name for name, hit in buckets if hit]
    if log_length <= nested_tasks:
        assert len(hits) == 1
    else:
        assert len(hits) <= 1
