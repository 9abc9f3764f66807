"""Snapshot-commit protocol (sources/snapshots.py): readers see one
complete version — old or new, never a mix — while commits land."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from pyanamo_spark.sources.snapshots import (
    current_version,
    snapshot_commit,
    snapshot_read,
    vacuum,
)


def _table(spark, value: int, n: int = 200):
    """A snapshot whose internal invariant is checkable: every row
    carries the same ``value`` and there are exactly ``n`` rows."""
    return spark.range(n).select("id", F.lit(value).alias("value"))


def test_commit_read_and_time_travel(spark, tmp_path):
    d = str(tmp_path / "tbl")
    assert current_version(d) is None
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, d)
    v1 = snapshot_commit(spark, d, _table(spark, 1))
    v2 = snapshot_commit(spark, d, _table(spark, 2, n=300))
    assert (v1, v2) == (1, 2)
    assert current_version(d) == 2
    assert snapshot_read(spark, d).count() == 300
    # time travel: the old version stays readable until vacuumed
    assert snapshot_read(spark, d, version=1).count() == 200


def test_reader_handle_pins_its_version(spark, tmp_path):
    """A DataFrame handle resolved before a commit keeps serving its
    version — later commits never disturb published files."""
    d = str(tmp_path / "tbl")
    snapshot_commit(spark, d, _table(spark, 7))
    old = snapshot_read(spark, d)
    snapshot_commit(spark, d, _table(spark, 8, n=50))
    rows = old.select("value").distinct().collect()
    assert [r.value for r in rows] == [7]
    assert old.count() == 200
    assert snapshot_read(spark, d).count() == 50


def test_concurrent_reader_never_sees_a_torn_table(spark, tmp_path):
    """Race a committing writer against a polling reader: every read
    must satisfy a single version's invariant (uniform value, matching
    row count) — the either-old-or-new guarantee."""
    d = str(tmp_path / "tbl")
    counts = {v: 100 + 10 * v for v in range(1, 9)}
    snapshot_commit(spark, d, _table(spark, 1, counts[1]))
    stop = threading.Event()
    errors: list[str] = []

    def writer():
        for v in range(2, 9):
            snapshot_commit(spark, d, _table(spark, v, counts[v]))
        stop.set()

    t = threading.Thread(target=writer)
    t.start()
    reads = 0
    try:
        while not stop.is_set() or reads == 0:
            df = snapshot_read(spark, d)
            rows = df.groupBy("value").count().collect()
            if len(rows) != 1:
                errors.append(f"mixed values in one read: {rows}")
                break
            v, n = rows[0].value, rows[0]["count"]
            if counts.get(v) != n:
                errors.append(f"version {v} read {n} rows, want {counts.get(v)}")
                break
            reads += 1
    finally:
        t.join()
    assert not errors, errors
    assert reads >= 3  # the race actually overlapped commits


def test_vacuum_retention(spark, tmp_path):
    d = str(tmp_path / "tbl")
    for v in range(1, 6):
        snapshot_commit(spark, d, _table(spark, v, n=10))
    removed = vacuum(d, keep=2)
    assert removed == 3
    assert snapshot_read(spark, d, version=4).count() == 10
    assert snapshot_read(spark, d).count() == 10
    with pytest.raises(Exception):
        snapshot_read(spark, d, version=1).count()


def test_merge_upsert_commit_write_path(spark, tmp_path):
    """q_merge_upsert's write path: the merge post-state lands as a new
    snapshot; the pre-merge snapshot remains intact underneath."""
    from pyanamo_spark.operators.mutation import (
        merge_frames,
        merge_upsert_commit,
    )

    d = str(tmp_path / "tbl")
    target = spark.createDataFrame(
        [("a", "todo", 1), ("b", "locked", 2)],
        ["itemID", "ItemState", "Log_Length"],
    )
    snapshot_commit(spark, d, target)
    source = spark.createDataFrame(
        [("b", "done", 3), ("c", "todo", 0)],
        ["itemID", "ItemState", "Log_Length"],
    )
    v = merge_upsert_commit(spark, d, source, "itemID")
    assert v == 2
    got = {
        r.itemID: (r.ItemState, r.Log_Length)
        for r in snapshot_read(spark, d).collect()
    }
    want = {
        r.itemID: (r.ItemState, r.Log_Length)
        for r in merge_frames(target, source, "itemID").collect()
    }
    assert got == want == {
        "a": ("todo", 1),
        "b": ("done", 3),
        "c": ("todo", 0),
    }
    # pre-merge state untouched
    assert {
        r.itemID for r in snapshot_read(spark, d, version=1).collect()
    } == {"a", "b"}


def test_snapshot_diff_between_versions(spark, tmp_path):
    """Commit v1, commit a mutated v2, diff v1->v2: exactly the
    planted insert/delete/update keys come back, unchanged keys don't,
    and a same-key null payload transition counts as an update."""
    from pyspark.sql import functions as F

    from pyanamo_spark.sources.snapshots import (
        snapshot_commit,
        snapshot_diff,
    )

    table = str(tmp_path / "tbl")
    v1_rows = [(1, "a"), (2, "b"), (3, None), (4, "d")]
    v1 = spark.createDataFrame(v1_rows, "k long, payload string")
    assert snapshot_commit(spark, table, v1) == 1
    # v2: delete 4, update 1, null->value on 3, key 2 unchanged, add 5
    v2 = spark.createDataFrame(
        [(1, "A"), (2, "b"), (3, "now-set"), (5, "e")],
        "k long, payload string",
    )
    assert snapshot_commit(spark, table, v2) == 2
    got = {
        (r.change, r.k)
        for r in snapshot_diff(spark, table, ["k"], 1, 2).collect()
    }
    assert got == {
        ("update", 1),
        ("update", 3),
        ("delete", 4),
        ("insert", 5),
    }
    # identical versions diff to nothing
    assert snapshot_commit(spark, table, v2) == 3
    assert snapshot_diff(spark, table, ["k"], 2, 3).count() == 0


def test_commit_retry_after_crash_clears_orphan(spark, tmp_path):
    """A commit that died mid-write leaves an unpublished orphan at
    the NEXT version number; the retry must clear and reuse it instead
    of failing errorifexists forever."""
    import os

    from pyanamo_spark.sources.snapshots import (
        commit_version,
        current_version,
        snapshot_commit,
        snapshot_read,
        version_dir,
    )

    table = str(tmp_path / "tbl")
    snapshot_commit(spark, table, spark.range(3))
    # simulate the crash: v=2 exists with partial data, pointer at 1
    orphan = version_dir(table, 2)
    spark.range(1).write.parquet(orphan)
    assert current_version(table) == 1
    v = commit_version(
        table,
        lambda d: spark.range(7).write.mode("errorifexists").parquet(d),
    )
    assert v == 2
    assert snapshot_read(spark, table).count() == 7
    # the orphan's partial 1-row data really was replaced, not merged
    assert spark.read.parquet(orphan).count() == 7
    assert os.path.isdir(version_dir(table, 1))  # published v1 untouched


def test_corrupt_pointer_refuses_to_reinitialize(spark, tmp_path):
    """A pointer that EXISTS but cannot be read as a version must fail
    loudly: treating it as 'uninitialized' would let commit_version
    rmtree the PUBLISHED v=1 directory and silently re-point."""
    import os

    import pytest

    from pyanamo_spark.sources.snapshots import (
        _pointer,
        current_version,
        snapshot_commit,
        version_dir,
    )

    table = str(tmp_path / "tbl")
    snapshot_commit(spark, table, spark.range(5))
    with open(_pointer(table), "w") as f:
        f.write("garbage")
    with pytest.raises(ValueError, match="corrupt snapshot pointer"):
        current_version(table)
    with pytest.raises(ValueError, match="corrupt snapshot pointer"):
        snapshot_commit(spark, table, spark.range(9))
    # the published version directory survived the refused commit
    assert os.path.isdir(version_dir(table, 1))
