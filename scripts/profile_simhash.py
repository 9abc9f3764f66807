"""One-off stage profile for VERDICT r11 item 2: where do
q_dedup_simhash's 87 sf10-seconds go?

Run: SPARK_GRAFT_CPUS=16 python scripts/profile_simhash.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyanamo_spark.registry import QUERIES, load_all
from pyanamo_spark.session import get_spark

SF10 = str(os.environ.get("SF10_DIR", REPO / ".fixtures" / "sf10"))


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:44s} {time.perf_counter() - t0:7.2f}s")
    return out


def main():
    load_all()
    spark = get_spark("profile-simhash")
    QUERIES["q_state_counts"](spark, SF10).collect()
    spark.catalog.clearCache()

    from pyspark.sql import functions as F

    from pyanamo_spark.dedup import corpus_with_mutants
    from pyanamo_spark.dedup.simhash import (
        _balanced_blocks,
        _with_pair_keys,
        simhash_udf,
        HAMMING_MAX,
        _COPY_OFFSET,
    )
    from pyanamo_spark.session import spread

    docs = spark.table("documents")
    copies = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"), "text", "lang"
    )
    corpus = corpus_with_mutants(spark).unionByName(copies)
    sigs = (
        spread(corpus.where(F.col("text").isNotNull()), "doc_id", "text")
        .select("doc_id", simhash_udf(F.col("text")).alias("sig"))
        .persist()
    )
    timed("1 signature UDF pass (persist)", lambda: sigs.count())
    x, y = sigs.alias("x"), sigs.alias("y")
    within = x.join(
        y,
        (F.col("x.sig") == F.col("y.sig"))
        & (F.col("x.doc_id") < F.col("y.doc_id")),
    )
    timed("2 within-group join", lambda: within.count())
    uniq = sigs.select("sig").distinct().persist()
    timed("3 distinct sigs (persist)", lambda: uniq.count())
    blocks = timed("4 balanced blocks (actions)", lambda: _balanced_blocks(uniq))[0]
    print(f"   n_blocks = {len(blocks)}")
    blocked = _with_pair_keys(uniq, "sig", blocks)
    timed("5 keyed rows count", lambda: blocked.count())
    from pyanamo_spark.dedup.minhash import MAX_COMBO_BUCKET

    buckets = (
        blocked.groupBy("pair_idx", "key_val")
        .agg(F.array_sort(F.collect_list("sig")).alias("ms"))
        .filter(F.size("ms") > 1)
        .persist()
    )
    timed("6 bucket shuffle+agg (persist)", lambda: buckets.count())
    stats = buckets.agg(
        F.count("*").alias("nb"),
        F.sum(F.size("ms")).alias("rows"),
        F.sum(F.expr("size(ms)*(size(ms)-1)/2")).alias("pairs"),
        F.max(F.size("ms")).alias("mx"),
    ).first()
    print(f"   buckets={stats.nb} rows={stats.rows} cand_pairs={stats.pairs} max={stats.mx}")
    small = (
        buckets.filter(F.size("ms") <= MAX_COMBO_BUCKET)
        .select("ms", F.posexplode("ms").alias("i", "sig_a"))
        .select("sig_a", F.explode(F.expr("slice(ms, i + 2, size(ms))")).alias("sig_b"))
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    sig_pairs = (
        small.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .dropDuplicates(["sig_a", "sig_b"])
        .persist()
    )
    timed("7 pair emission+verify+dedup", lambda: sig_pairs.count())
    cross = (
        sig_pairs.join(sigs.select(F.col("sig").alias("sig_a"), F.col("doc_id").alias("da")), "sig_a")
        .join(sigs.select(F.col("sig").alias("sig_b"), F.col("doc_id").alias("db")), "sig_b")
    )
    timed("8 doc expansion", lambda: cross.count())
    spark.catalog.clearCache()
    timed("9 q_dedup_simhash cold e2e", lambda: QUERIES["q_dedup_simhash"](spark, SF10).write.format("noop").mode("overwrite").save())


if __name__ == "__main__":
    main()
