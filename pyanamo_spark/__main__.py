"""CLI — the pyanamo.py / import-items.py entry points, Spark-shaped
(SURVEY.md §3.1-§3.3).

    python -m pyanamo_spark run     --sf-dir D --out O [--filter P]
                                    [--wall-time S] [--parallelism N]
    python -m pyanamo_spark ingest  --file F [--sep '|'] [--out O]
    python -m pyanamo_spark monitor --sf-dir D
    python -m pyanamo_spark query   --name q_xxx [--sf-dir D] [--limit N]

`run` is the engine loop (reference pyanamo.py:48-138); `ingest` the
import CLI (import-items.py:20-106); `monitor` the interactive
state-count/histogram session (manager monitoring, §3.3); `query` runs
any declared query by name.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pyanamo_spark")
    parser.add_argument("--cpus", default=None, help="local[N] cores")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="process todo items end-to-end")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_run.add_argument("--out", required=True)
    p_run.add_argument("--filter", default=None, help="SQL predicate on tasks")
    p_run.add_argument("--wall-time", type=float, default=None)
    p_run.add_argument("--parallelism", type=int, default=8)

    p_ing = sub.add_parser("ingest", help="import delimited items file")
    p_ing.add_argument("--file", required=True)
    p_ing.add_argument("--sep", default="|")
    p_ing.add_argument("--out", default=None, help="parquet output dir")

    p_mon = sub.add_parser("monitor", help="state counts + progress histogram")
    p_mon.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    p_q = sub.add_parser("query", help="run a declared query by name")
    p_q.add_argument("--name", required=True)
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_q.add_argument("--limit", type=int, default=20)

    args = parser.parse_args(argv)

    from pyanamo_spark.session import get_spark

    spark = get_spark("pyanamo-spark-cli", cpus=args.cpus)

    if args.cmd == "run":
        from pyanamo_spark.engine import run_engine

        out = run_engine(
            spark,
            args.sf_dir,
            args.out,
            item_filter=args.filter,
            parallelism=args.parallelism,
            wall_time_seconds=args.wall_time,
        )
        summary = {
            r.ItemState: r.n_items for r in out["summary"].collect()
        }
        print(json.dumps({"post_state_counts": summary, "out": args.out}))
    elif args.cmd == "ingest":
        from pyspark.sql import functions as F

        df = (
            spark.read.option("header", True)
            .option("sep", args.sep)
            .csv(args.file)
            .filter(F.col("itemID").isNotNull())
        )
        n = df.count()
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
        # reference reports {N, Items} as JSON (import-items.py:105-106)
        print(json.dumps({"N": n, "out": args.out}))
    elif args.cmd == "monitor":
        from pyanamo_spark.registry import QUERIES, load_all

        load_all()
        QUERIES["q_state_counts"](spark, args.sf_dir).select(
            "ItemState", "n_items"
        ).show(truncate=False)
        QUERIES["q_progress_histogram"](spark, args.sf_dir).select(
            "bucket", "n_items"
        ).show(truncate=False)
    elif args.cmd == "query":
        from pyanamo_spark.registry import QUERIES, load_all

        load_all()
        if args.name not in QUERIES:
            print(
                f"unknown query {args.name}; known: {', '.join(sorted(QUERIES))}",
                file=sys.stderr,
            )
            return 2
        QUERIES[args.name](spark, args.sf_dir).show(
            args.limit, truncate=False
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
