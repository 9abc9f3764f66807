"""Stage-economics profile for q_contrastive_pairs (VERDICT r11 item
3: sf1 <= 6 s order). Times each pipeline piece standalone (cache
cleared between) so the sum attributes the query's cost:

  1. candidate build (minhash.mutant_candidate_pairs end-to-end)
  2. + positives filter + rank frame + negative join + marker filter
     (mine_contrastive_parts' triplets)
  3. the declared audit output on top (full query)

Run: SPARK_GRAFT_CPUS=16 python scripts/profile_contrastive.py [sf_dir]
"""

from __future__ import annotations

import os
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
        import pyanamo_spark.dedup.minhash as mh

        mh._MUTANT_CANDIDATES.clear()
        t0 = time.perf_counter()
        try:
            df = fn()
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # keep profiling the other stages
            print(f"{label:44s} ERROR {type(exc).__name__}")
            return None
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:44s} {best:7.3f}s")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / ".fixtures" / "sf1"
    )
    load_all()
    spark = get_spark("profile-contrastive")
    from pyanamo_spark import semantics

    semantics.ensure_views(spark, sf_dir)
    QUERIES["q_state_counts"](spark, sf_dir).collect()  # warm

    from pyanamo_spark.dedup import corpus_with_mutants
    from pyanamo_spark.dedup.minhash import (
        candidate_pairs,
        mutant_candidate_pairs,
    )
    from pyanamo_spark.operators.contrastive import mine_contrastive_parts

    spark.sparkContext.setJobDescription("candidates only")
    timed(
        spark,
        "1. mutant_candidate_pairs (verify incl.)",
        lambda: mutant_candidate_pairs(spark, sf_dir),
    )

    # 1a. the prep alone: tokenize+hash+persist (no banding)
    def prep_only():
        from pyanamo_spark.session import spread
        from pyspark.sql import functions as F
        from pyanamo_spark.dedup import shingles

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

    timed(spark, "1a. shingle prep (tokenize+hash, no persist)", prep_only)

    # 1b. prep + signature UDF
    def sig_only():
        from pyanamo_spark.dedup.minhash import minhash_signature

        return prep_only().select(
            "doc_id", minhash_signature("hs").alias("sig")
        )

    timed(spark, "1b. prep + minhash signature UDF", sig_only)

    def trips():
        corpus = corpus_with_mutants(spark)
        _, t = mine_contrastive_parts(
            spark, corpus, pairs=mutant_candidate_pairs(spark, sf_dir)
        )
        return t

    timed(spark, "2. triplets (cand + ranks + negatives)", trips)

    timed(
        spark,
        "3. declared q_contrastive_pairs (full)",
        lambda: QUERIES["q_contrastive_pairs"](spark, sf_dir),
    )
    spark.stop()


if __name__ == "__main__":
    main()
