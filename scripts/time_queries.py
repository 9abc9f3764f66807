"""Time a subset of declared queries in isolation (clearCache between),
for iterating on the slow tail: python scripts/time_queries.py q_a q_b ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, N_REPS."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyanamo_spark.registry import QUERIES, load_all
from pyanamo_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("N_REPS", "2"))
    load_all()
    spark = get_spark("pyanamo-spark-timeq")
    names = sys.argv[1:] or sorted(QUERIES)
    QUERIES["q_state_counts"](spark, sf_dir).collect()  # warm JVM
    for name in names:
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:24s} {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
