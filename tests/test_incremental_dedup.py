"""Incremental-dedup invariant (dedup/incremental.py): N-batch arrival
must accept exactly the fingerprint set one global exact dedup keeps,
with cross-batch duplicates resolved first-accepted-wins."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.dedup.incremental import (
    accept_batch,
    accepted_corpus,
    compact_store,
)


def test_three_batch_arrival_equals_global_dedup(spark, sf_dir, tmp_path):
    semantics.ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    # duplicate every 10th doc into the NEXT batch (cross-batch dup)
    # and every 7th within its own batch (within-batch dup)
    base = docs.select("doc_id", "text")
    cross = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    within = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    store = str(tmp_path / "prints")

    third = F.col("doc_id") % 3
    b0 = base.filter(third == 0).unionByName(
        within.filter(F.col("doc_id") % 3 == 0)
    )
    b1 = (
        base.filter(third == 1)
        .unionByName(cross.filter(F.col("doc_id") % 3 == 0))
        .unionByName(within.filter(F.col("doc_id") % 3 == 1))
    )
    b2 = base.filter(third == 2).unionByName(
        cross.filter(F.col("doc_id") % 3 != 0)
    )

    a0 = accept_batch(spark, b0, store, 0)
    a1 = accept_batch(spark, b1, store, 1)
    a2 = accept_batch(spark, b2, store, 2)
    assert a0.count() > 0 and a1.count() > 0 and a2.count() > 0

    got = accepted_corpus(spark, store)
    # 1) fingerprint set == global dedup's fingerprint set
    all_docs = (
        base.unionByName(cross).unionByName(within)
    )
    expect_fps = {
        r.fingerprint
        for r in all_docs.select(F.md5("text").alias("fingerprint"))
        .distinct()
        .collect()
    }
    got_rows = got.collect()
    assert {r.fingerprint for r in got_rows} == expect_fps
    # 2) no fingerprint accepted twice across batches
    assert len(got_rows) == len(expect_fps)
    # 3) first-accepted-wins: every cross-batch dup (+2M ids, arriving
    # after its base doc) must NOT be a keeper
    assert all(r.doc_id < 2_000_000 or r.doc_id >= 3_000_000 for r in got_rows)


def test_store_layout_is_batch_partitioned(spark, sf_dir, tmp_path):
    semantics.ensure_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").limit(50)
    store = str(tmp_path / "prints")
    accept_batch(spark, docs, store, 7)

    import os

    assert os.path.isdir(os.path.join(store, "batch=7"))


def test_compaction_preserves_corpus_and_merges_files(
    spark, sf_dir, tmp_path
):
    import os

    semantics.ensure_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    store = str(tmp_path / "prints")
    third = F.col("doc_id") % 3
    # AQE's partition coalescing collapses these tiny batches to one
    # output file each — disable it so the store gets the multi-file
    # partitions compaction exists to fix
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        for batch_id in range(3):
            accept_batch(
                spark, docs.filter(third == batch_id), store, batch_id
            )
    finally:
        spark.conf.set(coalesce_key, prev)
    # hidden side-state (streaming checkpoint) must survive untouched
    os.makedirs(os.path.join(store, "_checkpoint"))
    with open(os.path.join(store, "_checkpoint", "offsets"), "w") as f:
        f.write("epoch 2")

    def parquet_files():
        return {
            os.path.join(d, f)
            for d, _, fs in os.walk(store)
            for f in fs
            if f.endswith(".parquet")
        }

    before_rows = sorted(
        (r.fingerprint, r.doc_id, r.batch)
        for r in accepted_corpus(spark, store).collect()
    )
    n_files_before = len(parquet_files())
    assert n_files_before > 3  # multi-file partitions exist

    assert compact_store(spark, store) == 3

    files = parquet_files()
    assert len(files) == 3  # exactly one file per batch partition
    after_rows = sorted(
        (r.fingerprint, r.doc_id, r.batch)
        for r in accepted_corpus(spark, store).collect()
    )
    assert after_rows == before_rows
    assert {os.path.basename(os.path.dirname(f)) for f in files} == {
        "batch=0", "batch=1", "batch=2"
    }
    with open(os.path.join(store, "_checkpoint", "offsets")) as f:
        assert f.read() == "epoch 2"
    assert not os.path.isdir(store + "__compacting")
