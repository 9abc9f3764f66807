"""Source/sink tests: text + JSON item ingest, idempotent results
upsert (SURVEY.md §2.1 S3/S4/S13)."""

from __future__ import annotations

from pyanamo_spark.sources.items import (
    read_items_json,
    read_items_text,
    upsert_results,
)


def test_text_source_strips_and_drops_blanks(spark, tmp_path):
    p = tmp_path / "items.txt"
    p.write_text("alpha  \n\nbeta\n   \ngamma\n")
    lines = [r.line for r in read_items_text(spark, str(p)).collect()]
    assert lines == ["alpha", "beta", "gamma"]


def test_json_source_applies_engine_defaults(spark, tmp_path):
    p = tmp_path / "items.json"
    p.write_text(
        '{"itemID": "i1", "taskID": "t1", "TaskScript": "seq 3"}\n'
        '{"itemID": "i2", "taskID": "t1", "TaskScript": "seq", '
        '"TaskArgs": "8,2,1", "ItemState": "locked", "lockID": "abc"}\n'
    )
    rows = {r.itemID: r for r in read_items_json(spark, str(p)).collect()}
    assert rows["i1"].ItemState == "todo"
    assert rows["i1"].lockID == "NULL"
    assert rows["i1"].is_nested is False
    assert rows["i2"].ItemState == "locked"
    assert rows["i2"].lockID == "abc"
    assert rows["i2"].is_nested is True


def test_upsert_rejects_duplicate_composite_keys(spark, tmp_path):
    path = str(tmp_path / "results")
    batch1 = spark.createDataFrame(
        [("i1", "Task_0", "out-a"), ("i1", "Task_1", "out-b")],
        "itemID string, nestID string, stdout string",
    )
    out1 = upsert_results(spark, batch1, path, ["itemID", "nestID"])
    assert out1.count() == 2

    # re-run with one duplicate key (different payload) + one new row:
    # the duplicate must be rejected, the first write wins
    batch2 = spark.createDataFrame(
        [("i1", "Task_0", "DIFFERENT"), ("i2", "Task_0", "out-c")],
        "itemID string, nestID string, stdout string",
    )
    out2 = upsert_results(spark, batch2, path, ["itemID", "nestID"])
    assert out2.count() == 3
    kept = out2.filter("itemID = 'i1' AND nestID = 'Task_0'").collect()
    assert len(kept) == 1
    assert kept[0].stdout == "out-a"

    # full idempotency: replaying a batch is a no-op
    out3 = upsert_results(spark, batch2, path, ["itemID", "nestID"])
    assert out3.count() == 3
