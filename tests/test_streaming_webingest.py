"""Continuous crawl ingest (streaming/webingest.py): stream==batch
equivalence through the full WARC → HTML → dedup-ledger chain, and
epoch-replay idempotence."""

from __future__ import annotations

import numpy as np

from pyanamo_spark.dedup.incremental import accepted_corpus
from pyanamo_spark.sources.warc import build_warc_gz, build_warc_record
from pyanamo_spark.streaming.webingest import (
    streaming_web_ingest,
    web_ingest_batch,
)


def _chunk(ids, dup_of=None):
    """One WARC.gz chunk: one response per id; ``dup_of`` maps ids to
    the id whose body they duplicate (cross-chunk dup coverage)."""
    recs = []
    for i in ids:
        src = (dup_of or {}).get(i, i)
        status = 404 if i % 7 == 3 else 200
        body = (
            b""
            if status == 404
            else f"<html><body><p>doc {src} &amp; text</p></body></html>".encode()
        )
        recs.append(
            build_warc_record(
                f"https://crawl/{i}", body, status=status,
                content_type="text/html",
            )
        )
    return build_warc_gz(recs)


def _stage(spark, tmp_path, chunks):
    chunks_dir = str(tmp_path / "chunks")
    for cid, blob in enumerate(chunks):
        spark.createDataFrame(
            [(cid, bytearray(blob))], "chunk_id long, payload binary"
        ).write.mode("append").parquet(chunks_dir)
    return chunks_dir


def test_stream_matches_batch_pipeline(spark, tmp_path):
    # chunk 1: ids 0-5; chunk 2: ids 6-11, where 7 duplicates 1's body
    chunks = [_chunk(range(6)), _chunk(range(6, 12), dup_of={7: 1})]
    chunks_dir = _stage(spark, tmp_path, chunks)
    store = str(tmp_path / "store")
    q = streaming_web_ingest(spark, chunks_dir, store)
    q.awaitTermination(120)

    got = {
        (r.fingerprint, r.doc_id)
        for r in accepted_corpus(spark, store)
        .select("fingerprint", "doc_id")
        .collect()
    }
    # batch twin over all chunks at once, then global dedup by print
    all_docs = web_ingest_batch(
        spark.read.parquet(chunks_dir)
    ).toPandas()
    import hashlib

    best: dict[str, int] = {}
    for _, row in all_docs.iterrows():
        fp = hashlib.md5(row.text.encode()).hexdigest()
        best[fp] = min(best.get(fp, 1 << 62), int(row.doc_id))
    # same FINGERPRINT set; keeper ids may differ on cross-chunk dups
    # (the stream accepts the EARLIER epoch's doc) — here earlier epoch
    # also has the smaller id, so full equality holds
    assert got == {(fp, i) for fp, i in best.items()}
    # 404s never reach the ledger
    assert all(i % 7 != 3 for _, i in got)
    # the cross-chunk duplicate collapsed
    n_200 = sum(1 for i in range(12) if i % 7 != 3)
    assert len(got) == n_200 - 1


def test_epoch_replay_is_noop(spark, tmp_path):
    chunks_dir = _stage(spark, tmp_path, [_chunk(range(4))])
    store = str(tmp_path / "store")
    q = streaming_web_ingest(spark, chunks_dir, store)
    q.awaitTermination(120)
    before = sorted(
        (r.fingerprint, r.doc_id)
        for r in accepted_corpus(spark, store).collect()
    )
    # replay epoch 0 by hand: sink must detect the partition and skip
    from pyanamo_spark.streaming.webingest import ingest_sink

    ingest_sink(store)(spark.read.parquet(chunks_dir), 0)
    after = sorted(
        (r.fingerprint, r.doc_id)
        for r in accepted_corpus(spark, store).collect()
    )
    assert before == after


def test_extracted_text_is_clean(spark, tmp_path):
    chunks_dir = _stage(spark, tmp_path, [_chunk(range(3))])
    docs = web_ingest_batch(spark.read.parquet(chunks_dir)).collect()
    for r in docs:
        assert r.text == f"doc {r.doc_id} & text"


def test_property_arrival_order_invariance(spark, tmp_path):
    """Late/out-of-order batches (the last untested streaming axis):
    whatever order crawl chunks ARRIVE in, the final ledger must hold
    exactly one entry per distinct body fingerprint — the same set an
    in-order run accepts. Keeper doc_ids may legitimately differ (the
    stream keeps the earliest-ARRIVING copy), so the invariant is the
    fingerprint set plus one-doc-per-fingerprint, checked across a
    spread of shuffled arrival permutations."""
    import random

    from pyanamo_spark.streaming.webingest import ingest_sink

    # 4 chunks with cross-chunk duplicates in both directions
    chunk_ids = [
        list(range(0, 5)),
        list(range(5, 10)),
        list(range(10, 15)),
        list(range(15, 20)),
    ]
    dup_of = {7: 1, 12: 1, 16: 11, 4: 15}  # 4 cross-chunk dup bodies
    blobs = [
        _chunk(ids, dup_of=dup_of) for ids in chunk_ids
    ]

    def run(order, store):
        for epoch, ci in enumerate(order):
            batch = spark.createDataFrame(
                [(ci, bytearray(blobs[ci]))], "chunk_id long, payload binary"
            )
            ingest_sink(store)(batch, epoch)
        rows = accepted_corpus(spark, store).select(
            "fingerprint", "doc_id"
        ).collect()
        return rows

    base_rows = run([0, 1, 2, 3], str(tmp_path / "store_inorder"))
    base_fps = {r.fingerprint for r in base_rows}
    assert len(base_rows) == len(base_fps)  # one doc per fingerprint

    rng = random.Random(0xC4A31)
    orders = {tuple(rng.sample(range(4), 4)) for _ in range(8)}
    orders.discard((0, 1, 2, 3))
    assert len(orders) >= 4
    for n, order in enumerate(sorted(orders)):
        store = str(tmp_path / f"store_perm{n}")
        rows = run(list(order), store)
        fps = {r.fingerprint for r in rows}
        assert fps == base_fps, order
        assert len(rows) == len(fps), order  # still exactly one keeper
        # and a replay of the LAST epoch after the fact stays a no-op
        ingest_sink(store)(
            spark.createDataFrame(
                [(order[-1], bytearray(blobs[order[-1]]))],
                "chunk_id long, payload binary",
            ),
            len(order) - 1,
        )
        assert {
            r.fingerprint
            for r in accepted_corpus(spark, store).collect()
        } == base_fps
