"""Custom item-store data source tests: round-trip, shard parallelism,
and GSI-style filter pushdown."""

from __future__ import annotations

import json

import pytest

from pyanamo_spark.sources.item_store import ItemStoreDataSource


@pytest.fixture()
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ItemStoreDataSource)
    return spark


def _write_shards(path, n_shards=3, items_per=4):
    path.mkdir()
    states = ["todo", "locked", "done"]
    for s in range(n_shards):
        with open(path / f"shard-{s}.jsonl", "w") as fh:
            for i in range(items_per):
                doc = {
                    "itemID": f"item_{s}_{i}",
                    "taskID": f"task_{s}",
                    "task_script": f"seq {i + 1}",
                    "ItemState": states[(s + i) % 3],
                    "lockID": "NULL",
                    "Log_Length": i,
                }
                fh.write(json.dumps(doc) + "\n")


def test_read_all_shards(registered, tmp_path):
    store = tmp_path / "store"
    _write_shards(store)
    df = registered.read.format("pyanamo_items").load(str(store))
    assert df.count() == 12
    assert df.rdd.getNumPartitions() == 3  # one partition per shard
    assert set(df.columns) == {
        "itemID", "taskID", "task_script", "ItemState", "lockID", "Log_Length"
    }


def test_state_filter_pushed_to_source(registered, tmp_path):
    store = tmp_path / "store"
    _write_shards(store)
    df = registered.read.format("pyanamo_items").load(str(store))
    todo = df.filter("ItemState = 'todo'")
    rows = todo.collect()
    assert rows and all(r.ItemState == "todo" for r in rows)
    # the pushed filter leaves no Filter node in the physical plan —
    # the GSI-seek semantics (client.py:88) at the source boundary
    plan = todo._jdf.queryExecution().executedPlan().toString()
    import re

    # no Filter operator node (the scan's "RuntimeFilters: []" label
    # is not one)
    assert not re.search(r"\bFilter\b", plan), plan


def test_unpushable_filter_stays_in_plan(registered, tmp_path):
    store = tmp_path / "store"
    _write_shards(store)
    df = registered.read.format("pyanamo_items").load(str(store))
    heavy = df.filter("Log_Length > 1")
    assert heavy.count() == 6  # i in {2,3} per shard
    plan = heavy._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"\bFilter\b", plan)


def test_append_twice_keeps_both_batches(registered, tmp_path):
    store = tmp_path / "store"
    _write_shards(store, n_shards=1, items_per=2)
    df = registered.read.format("pyanamo_items").load(str(store))
    out = tmp_path / "out"
    df.write.format("pyanamo_items").mode("append").save(str(out))
    df.write.format("pyanamo_items").mode("append").save(str(out))
    back = registered.read.format("pyanamo_items").load(str(out))
    assert back.count() == 4  # two appends, no shard clobbering


def test_overwrite_removes_stale_shards(registered, tmp_path):
    store = tmp_path / "store"
    _write_shards(store, n_shards=3, items_per=2)
    df = registered.read.format("pyanamo_items").load(str(store))
    out = tmp_path / "out"
    df.write.format("pyanamo_items").mode("append").save(str(out))
    one = df.filter("itemID = 'item_0_0'").coalesce(1)
    one.write.format("pyanamo_items").mode("overwrite").save(str(out))
    back = registered.read.format("pyanamo_items").load(str(out))
    assert [r.itemID for r in back.collect()] == ["item_0_0"]


def test_write_round_trip(registered, tmp_path):
    store = tmp_path / "store"
    _write_shards(store)
    df = registered.read.format("pyanamo_items").load(str(store))
    out = tmp_path / "out"
    df.write.format("pyanamo_items").mode("append").save(str(out))
    back = registered.read.format("pyanamo_items").load(str(out))
    assert sorted(r.itemID for r in back.collect()) == sorted(
        r.itemID for r in df.collect()
    )


def test_stream_tails_new_shards_exactly_once(registered, tmp_path):
    """A second availableNow run against the same checkpoint must
    deliver ONLY shards appended since the first run — the
    exactly-once tail the connector's atomic shard renames make
    possible."""
    store = tmp_path / "store"
    _write_shards(store, n_shards=2)
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            registered.readStream.format("pyanamo_items")
            .load(str(store))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    first = {
        r.itemID for r in registered.read.parquet(str(out)).collect()
    }
    assert first == {f"item_{s}_{i}" for s in range(2) for i in range(4)}

    # a late shard arrives; only its rows may appear in run 2
    with open(store / "shard-9.jsonl", "w") as fh:
        fh.write(
            json.dumps(
                {
                    "itemID": "item_9_0",
                    "taskID": "task_9",
                    "task_script": "seq 1",
                    "ItemState": "todo",
                    "lockID": "NULL",
                    "Log_Length": 0,
                }
            )
            + "\n"
        )
    run_stream()
    rows = registered.read.parquet(str(out)).collect()
    ids = [r.itemID for r in rows]
    assert sorted(ids) == sorted(first | {"item_9_0"})  # no re-delivery


def test_stream_delivers_shard_sorting_before_existing(registered, tmp_path):
    """Regression: a late shard whose NAME sorts lexicographically
    before already-delivered shards must still be delivered exactly
    once.  With a count-based offset this shard was silently skipped
    and an old shard re-delivered; the set-difference offset makes
    delivery independent of name order."""
    store = tmp_path / "store"
    _write_shards(store, n_shards=2)  # shard-0.jsonl, shard-1.jsonl
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            registered.readStream.format("pyanamo_items")
            .load(str(store))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    first = {
        r.itemID for r in registered.read.parquet(str(out)).collect()
    }

    # "shard--late.jsonl" sorts before "shard-0.jsonl"
    with open(store / "shard--late.jsonl", "w") as fh:
        fh.write(
            json.dumps(
                {
                    "itemID": "item_late_0",
                    "taskID": "task_late",
                    "task_script": "seq 1",
                    "ItemState": "todo",
                    "lockID": "NULL",
                    "Log_Length": 0,
                }
            )
            + "\n"
        )
    run_stream()
    ids = [r.itemID for r in registered.read.parquet(str(out)).collect()]
    assert sorted(ids) == sorted(first | {"item_late_0"})


def test_writer_shard_names_monotonic(registered, tmp_path):
    """Shards committed by a later append sort strictly after all
    shards visible before the commit (zero-padded sequence prefix
    assigned at commit time)."""
    store = tmp_path / "store"
    _write_shards(store, n_shards=1)
    df = registered.read.format("pyanamo_items").load(str(store))
    out = tmp_path / "out"
    df.write.format("pyanamo_items").mode("append").save(str(out))
    batch1 = sorted(f for f in out.iterdir() if f.suffix == ".jsonl")
    df.write.format("pyanamo_items").mode("append").save(str(out))
    batch2 = sorted(
        f for f in out.iterdir()
        if f.suffix == ".jsonl" and f not in batch1
    )
    assert batch2 and max(b.name for b in batch1) < min(
        b.name for b in batch2
    )
