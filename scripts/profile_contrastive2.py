"""Phase 2 profile: with the mutant candidate table PRE-BUILT and
persisted (memo warm, like consecutive suite queries would see), where
does q_contrastive_pairs' remaining time go?

Run: SPARK_GRAFT_CPUS=32 python scripts/profile_contrastive2.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyanamo_spark.registry import QUERIES, load_all  # noqa: E402
from pyanamo_spark.session import get_spark  # noqa: E402


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        try:
            df = fn()
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"{label:46s} ERROR {type(exc).__name__}: {exc}")
            raise
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:46s} {best:7.3f}s")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / ".fixtures" / "sf1"
    )
    load_all()
    spark = get_spark("profile-contrastive2")
    from pyanamo_spark import semantics

    semantics.ensure_views(spark, sf_dir)
    QUERIES["q_state_counts"](spark, sf_dir).collect()  # warm

    from pyspark.sql import functions as F

    from pyanamo_spark.dedup import corpus_with_mutants
    from pyanamo_spark.dedup.minhash import mutant_candidate_pairs
    from pyanamo_spark.operators.contrastive import (
        JACCARD_MIN,
        global_ranks,
        mine_contrastive_parts,
    )

    t0 = time.perf_counter()
    pairs = mutant_candidate_pairs(spark, sf_dir)
    pairs.count()  # populate the persist
    print(f"{'0. candidate build (memo populate)':46s} {time.perf_counter()-t0:7.3f}s")

    corpus = corpus_with_mutants(spark)

    timed("a. positives filter only (cached pairs)", lambda: (
        pairs.filter(F.col("jaccard_raw") >= JACCARD_MIN)
    ))

    timed("b. rank frame over corpus doc_ids", lambda: (
        global_ranks(corpus.select("doc_id"), "doc_id")
    ))

    timed("c. corpus count (n_docs)", lambda: corpus.select("doc_id"))

    timed("d. triplets (cached pairs)", lambda: mine_contrastive_parts(
        spark, corpus, pairs=pairs
    )[1])

    timed("e. full declared query (cached pairs)", lambda: (
        QUERIES["q_contrastive_pairs"](spark, sf_dir)
    ))
    spark.stop()


if __name__ == "__main__":
    main()
