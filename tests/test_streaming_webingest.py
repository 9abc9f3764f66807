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
