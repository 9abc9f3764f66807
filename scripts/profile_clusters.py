"""One-off profile for VERDICT r11 item 1: break q_dedup_clusters'
sf0.1 wall-clock into (a) the ngram pair-graph input build, (b) the
closure rounds, (c) fixed micro-stage overhead — under the SAME cache
regime bench.py uses (clearCache between queries, so the pair memo is
always cold when clusters starts).

Run: SPARK_GRAFT_CPUS=16 python scripts/profile_clusters.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyanamo_spark.registry import QUERIES, load_all
from pyanamo_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt:7.3f}s")
    return out, dt


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    load_all()
    spark = get_spark("profile-clusters")
    # JVM/footers warm-up (outside all measurements), same as bench.py
    QUERIES["q_state_counts"](spark, SF_DIR).collect()
    spark.catalog.clearCache()

    from pyspark.sql import functions as F

    from pyanamo_spark.dedup import ngram_index
    from pyanamo_spark.dedup.clusters import connected_components
    from pyanamo_spark.dedup.ngram import verified_ngram_pairs

    reps = 3
    best = {}
    for rep in range(reps):
        spark.catalog.clearCache()
        # (a) the pair-graph input, cold — exactly q_dedup_ngram
        idx = ngram_index(spark, SF_DIR)
        pairs = verified_ngram_pairs(idx)
        _, t_input = timed(f"[rep {rep}] ngram pairs cold build", lambda: noop(pairs))
        # (b) closure on the WARM memoized pairs: pure clusters cost
        edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        labels, t_closure = timed(
            f"[rep {rep}] closure on warm pairs", lambda: connected_components(edges)
        )
        _, t_emit = timed(f"[rep {rep}] label emit", lambda: noop(labels))
        # (c) the declared query end-to-end, cold (bench regime)
        spark.catalog.clearCache()
        _, t_full = timed(
            f"[rep {rep}] q_dedup_clusters cold e2e",
            lambda: noop(QUERIES["q_dedup_clusters"](spark, SF_DIR)),
        )
        for k, v in [
            ("input", t_input),
            ("closure", t_closure + t_emit),
            ("full", t_full),
        ]:
            best[k] = min(best.get(k, v), v)
    print("\nbest-of-%d: input=%.3fs closure=%.3fs full=%.3fs  (full - input = %.3fs)"
          % (reps, best["input"], best["closure"], best["full"], best["full"] - best["input"]))


if __name__ == "__main__":
    main()
