"""Stage breakdown of minhash.candidate_pairs (the q_contrastive_pairs
/ q_dedup_near candidate build) by reconstructing its internal pipeline
stage by stage, each timed standalone against the noop sink.

Run: SPARK_GRAFT_CPUS=32 python scripts/profile_candbuild.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyanamo_spark.registry import QUERIES, load_all  # noqa: E402
from pyanamo_spark.session import get_spark  # noqa: E402


def timed(spark, label, fn, reps=2):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:52s} {best:7.3f}s", flush=True)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / ".fixtures" / "sf1"
    )
    load_all()
    spark = get_spark("profile-candbuild")
    from pyanamo_spark import semantics

    semantics.ensure_views(spark, sf_dir)
    QUERIES["q_state_counts"](spark, sf_dir).collect()  # warm

    from pyspark.sql import functions as F

    from pyanamo_spark.dedup import corpus_with_mutants, shingles
    from pyanamo_spark.dedup.minhash import (
        MAX_COMBO_BUCKET,
        band_structs,
        minhash_signature,
    )
    from pyanamo_spark.session import spread

    def prep_frame():
        return (
            spread(corpus_with_mutants(spark), "doc_id", "text")
            .withColumn(
                "hs",
                F.array_distinct(
                    F.transform(shingles("text"), lambda s: F.xxhash64(s))
                ),
            )
            .select("doc_id", "hs")
        )

    timed(spark, "1. prep: spread+tokenize+hash (noop all cols)", prep_frame)

    def sig_frame():
        prepped = prep_frame().persist()
        return prepped.withColumn("sig", minhash_signature("hs")).select(
            "doc_id", "sig"
        )

    timed(spark, "2. prep + signature UDF (hs dropped)", sig_frame)

    def buckets_frame(prepped=None):
        if prepped is None:
            prepped = prep_frame().persist()
        return (
            prepped
            .withColumn("sig", minhash_signature("hs"))
            .select("doc_id", F.explode(band_structs("sig")).alias("band"))
            .groupBy("band.band_idx", "band.band_hash")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
        )

    timed(spark, "3. + band explode + bucket agg", buckets_frame)

    def pair_ids_frame():
        prepped = prep_frame().persist()
        buckets = buckets_frame(prepped).persist()
        small = (
            buckets.filter(F.size("ids") <= MAX_COMBO_BUCKET)
            .select("ids", F.posexplode("ids").alias("i", "doc_a"))
            .select(
                "doc_a",
                F.explode(F.expr("slice(ids, i + 2, size(ids))")).alias(
                    "doc_b"
                ),
            )
        )
        over = buckets.filter(F.size("ids") > MAX_COMBO_BUCKET).select(
            "band_idx", "band_hash", F.explode("ids").alias("doc_id")
        )
        big = (
            over.alias("a")
            .join(
                over.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )
        return small.unionByName(big).dropDuplicates(["doc_a", "doc_b"])

    timed(
        spark,
        "4. + pair emission (both branches, no persist!)",
        pair_ids_frame,
    )

    def full_build():
        from pyanamo_spark.dedup.minhash import candidate_pairs

        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        return candidate_pairs(spark, corpus_with_mutants(spark)).select(
            "doc_a",
            "doc_b",
            (inter / (F.size("sh_a") + F.size("sh_b") - inter)).alias(
                "jaccard_raw"
            ),
        )

    timed(spark, "5. real candidate_pairs + verify (persists)", full_build)
    spark.stop()


if __name__ == "__main__":
    main()
