"""Execution-stage tests: subprocess pipe, wall-time budget, sink
router (SURVEY.md §2.9-§2.10, §4 R8/R10)."""

from __future__ import annotations

import gzip
import glob
import os

import pytest
from pyspark.sql import functions as F

from pyanamo_spark.executor.pipe import execute_nests
from pyanamo_spark.executor.sink_router import route_and_write, with_sink
from pyanamo_spark.executor.timekeeper import (
    TimeKeeper,
    TimeKeeperError,
    run_batches,
)


def test_pipe_survives_malformed_scripts(spark):
    """Unbalanced quotes / empty scripts mark the item failed instead
    of crashing the Spark task (which would abort the whole run)."""
    work = spark.createDataFrame(
        [
            ("i1", "Task_0", 'echo "unterminated'),
            ("i2", "Task_0", ""),
            ("i3", "Task_0", "   "),
            ("i4", "Task_0", "seq 2"),
        ],
        "itemID string, nestID string, script string",
    )
    rows = {r.itemID: r for r in execute_nests(work).collect()}
    assert rows["i1"].exit_code == -1 and rows["i1"].stderr
    assert rows["i2"].exit_code == -1
    assert rows["i3"].exit_code == -1
    assert rows["i4"].exit_code == 0 and rows["i4"].stdout == "1\n2\n"


def test_pipe_runs_real_subprocesses(spark):
    work = spark.createDataFrame(
        [
            ("i1", "Task_0", "seq 3"),
            ("i1", "Task_1", "seq 2 4"),
            ("i2", "Task_0", "definitely-not-a-command-xyz"),
        ],
        "itemID string, nestID string, script string",
    )
    rows = {
        (r.itemID, r.nestID): r
        for r in execute_nests(work, parallelism=2).collect()
    }
    assert rows[("i1", "Task_0")].stdout == "1\n2\n3\n"
    assert rows[("i1", "Task_0")].exit_code == 0
    assert rows[("i1", "Task_0")].n_lines == 4  # split-newline semantics
    assert rows[("i1", "Task_1")].stdout == "2\n3\n4\n"
    assert rows[("i2", "Task_0")].exit_code == -1
    assert rows[("i2", "Task_0")].stderr != ""


class FakeClock:
    def __init__(self):
        self.now = 0.0

    def __call__(self):
        return self.now


def test_timekeeper_predictive_stop():
    clock = FakeClock()
    tk = TimeKeeper(100, clock=clock)
    # 3 batches of 30s each: elapsed 90, avg 30 → predicted 120 > 100
    for _ in range(3):
        tk.record(30)
        clock.now += 30
    assert tk.elapsed == 90
    assert tk.predicted_next() == 120
    assert not tk.should_continue()
    with pytest.raises(TimeKeeperError):
        tk.check()


def test_timekeeper_window_is_last_15():
    tk = TimeKeeper(10_000)
    for d in [1000.0] * 5 + [10.0] * 15:
        tk.record(d)
    # only the last 15 (all 10.0) count
    assert tk.predicted_next() - tk.elapsed == pytest.approx(10.0)


def test_run_batches_splits_done_and_remaining():
    done, remaining = run_batches(
        range(10), lambda b: b * 2, wall_time_seconds=0.0
    )
    # zero budget: nothing starts (first should_continue is borderline
    # true at elapsed≈0, so at most one batch slips through)
    assert len(done) <= 1
    assert len(done) + len(remaining) == 10


def test_sink_router_tiers_and_gzip(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("small", "PyAnamo:\ttag-line\nshort"),
            ("medium", "PyAnamo:\tkeep-me\n" + "x" * 5000),
            ("huge", "y" * (11 * 1024 * 1024)),
        ],
        "itemID string, stdout string",
    )
    tiers = {
        r.itemID: r.sink for r in with_sink(df).select("itemID", "sink").collect()
    }
    assert tiers == {
        "small": "inline",
        "medium": "cloudwatch",
        "huge": "s3_gzip",
    }

    paths = route_and_write(df, str(tmp_path))
    inline = spark.read.parquet(paths["inline"])
    assert [r.itemID for r in inline.collect()] == ["small"]

    cw = spark.read.parquet(paths["cloudwatch"])
    row = cw.collect()[0]
    assert row.itemID == "medium"
    assert row.salvaged == "keep-me"  # tag-filtered summary

    gz_files = glob.glob(os.path.join(paths["s3_gzip"], "*.gz"))
    assert gz_files, "big tier must be gzip-compressed"
    content = ""
    for path in gz_files:  # one file per partition; most are empty
        with gzip.open(path, "rt") as fh:
            content += fh.read()
    assert content.startswith("y" * 100)


def test_sink_router_null_log_routes_inline(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "hi")], "itemID string, stdout string"
    )
    tiers = {
        r.itemID: r.sink
        for r in with_sink(df).select("itemID", "sink").collect()
    }
    assert tiers == {"a": "inline", "b": "inline"}


def test_sink_router_is_foreachbatch_compatible(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "hello")], "itemID string, stdout string"
    )
    paths = route_and_write(df, str(tmp_path), batch_id=7)
    assert paths["inline"].endswith("inline/batch_7")


def test_pipe_env_var_substitution(spark):
    """F4 (executor.py:75): ${VAR} placeholders expand before Popen."""
    df = spark.createDataFrame(
        [("i1", "Task_0", "${PYANAMO} hello ${PIPELINE}")],
        "itemID string, nestID string, script string",
    )
    row = execute_nests(
        df, env={"PYANAMO": "echo", "PIPELINE": "world"}
    ).collect()[0]
    assert row.exit_code == 0
    assert row.stdout == "hello world\n"
