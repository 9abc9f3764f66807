"""Time one declared query cold (memo + cache cleared per rep),
best-of-N against the noop sink.

Run: SPARK_GRAFT_CPUS=32 python scripts/time_query.py q_name [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyanamo_spark.registry import QUERIES, load_all  # noqa: E402
from pyanamo_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else str(
        REPO / ".fixtures" / "sf1"
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    load_all()
    spark = get_spark("time-query")
    from pyanamo_spark import semantics

    semantics.ensure_views(spark, sf_dir)
    QUERIES["q_state_counts"](spark, sf_dir).collect()  # warm
    times = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"{name} {sf_dir}: best {min(times):.3f}s  reps {times}")
    spark.stop()


if __name__ == "__main__":
    main()
