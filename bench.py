"""Benchmark runner: times every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the sum over queries of each query's best-of-3 wall-clock
(each executed to completion with a cheap count-style sink so results
materialize but don't transfer to the driver). Best-of-3 because this
host's timings swing 20-40% run-to-run (shared VM): the min of three
runs measures the query's actual cost, not the noise floor — best-of-2
still let load spikes masquerade as 1.3-1.7x per-query regressions in
the r04 review.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyanamo_spark.registry import QUERIES, load_all
from pyanamo_spark.session import get_spark

# Every query name that has ever appeared in a driver-parsed
# BENCH_r*.json inline `queries` map (r02-r12). The driver's perf
# comparison diffs successive rounds' inline maps and reports any name
# that vanishes as a dropped query (PERF_r12.json recorded 181
# "queries_dropped" purely because the inline map was the
# top-15-of-that-run, which changes between rounds). The contract is
# add-only — never remove or rename an entry — so these names are
# emitted unconditionally; the rest of the stdout byte budget is
# filled with the currently slowest queries (see _SUMMARY_BUDGET).
_PINNED_SUMMARY = (
    "q_basket_rules", "q_bm25", "q_bpe_encode", "q_contrastive_pairs",
    "q_crossval", "q_curation_funnel", "q_decontaminate",
    "q_dedup_clusters", "q_dedup_contain", "q_dedup_incremental",
    "q_dedup_lines", "q_dedup_near", "q_dedup_ngram", "q_dedup_simhash",
    "q_dup_passages", "q_dup_spans", "q_equidepth", "q_global_ids",
    "q_hybrid_search", "q_index_lifecycle", "q_knn_ivf", "q_log_mine",
    "q_logit_score", "q_outliers", "q_overlap_estimate", "q_pagerank",
    "q_partition_split", "q_pca_project", "q_percentiles",
    "q_repetition", "q_semantic_prune", "q_source_overlap",
    "q_table_stats", "q_tfidf",
)
# The driver captures only the LAST 2000 bytes of stdout (BENCH_r01
# recorded `parsed: null` when the full 97-query line overflowed it),
# so the printed line must stay comfortably under that including its
# trailing newline and any stage-progress residue.
_SUMMARY_BUDGET = 1900


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    load_all()
    spark = get_spark("pyanamo-spark-bench")

    # warm the JVM + parquet footers once, outside the timed pass
    warm = QUERIES["q_state_counts"](spark, sf_dir)
    warm.collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    rep_errors: dict[str, int] = {}
    for _pass in range(3):
        for name in sorted(QUERIES):
            t0 = time.perf_counter()
            try:
                df = QUERIES[name](spark, sf_dir)
                # materialize every row without shipping them to the
                # driver
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — one rep may hit
                # a transient executor fault (e.g. the Spark 4.1.2
                # "SparkPlan.session() is null" NPE observed once on a
                # cached-plan re-execution); the other passes still
                # time the query, and a query missing from `timings`
                # after all 3 passes surfaces in `errors` instead of
                # crashing the whole per-round record
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                rep_errors[name] = rep_errors.get(name, 0) + 1
                spark.catalog.clearCache()
                continue
            dt = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, dt), dt)
            # queries may persist() intermediates (dedup self-joins);
            # drop them so one query's cache doesn't occupy executor
            # storage for the rest of the suite
            spark.catalog.clearCache()
    # `errors` keeps only queries with NO surviving rep (the hard
    # failures); `rep_errors` records every per-rep fault count, so a
    # query that fails cold but succeeds warm is still visible in the
    # artifact instead of recording a silently clean timing (ADVICE r10)
    errors = {n: e for n, e in errors.items() if n not in timings}

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "declared_query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "errors": errors,
        "rep_errors": rep_errors,
    }
    # Full per-query detail goes to a file: a 97-query dict makes the
    # stdout line ~3 KB, and the driver's capture keeps only a tail of
    # it (BENCH_r01 recorded `parsed: null` from exactly that).  The
    # LAST line printed is a compact summary guaranteed to survive a
    # tail capture: total + the slowest queries + a pointer to the file.
    repo = Path(__file__).resolve().parent
    full_path = repo / "BENCH_full.json"
    full_path.write_text(json.dumps(full, indent=1))
    # per-round archive: BENCH_full.json is overwritten every run, which
    # loses the previous round's per-query detail (r02's timings survive
    # only as a top-15). The driver writes BENCH_r{N}.json after this
    # round's bench, so the current round is 1 + the highest recorded one.
    rounds = [
        int(m.group(1))
        for p in repo.glob("BENCH_r[0-9][0-9].json")
        if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
    ]
    archive = repo / f"BENCH_full_r{(max(rounds, default=0) + 1):02d}.json"
    archive.write_text(json.dumps(full, indent=1))
    print(summary_line(timings, total, sf, str(full_path), errors, rep_errors))
    spark.stop()


def summary_line(
    timings: dict[str, float],
    total: float,
    sf: float,
    queries_file: str,
    errors: dict[str, str],
    rep_errors: dict[str, int],
) -> str:
    """The one stdout JSON line: every _PINNED_SUMMARY name that has a
    timing (add-only contract — a name the driver has ever parsed must
    keep appearing), then the currently slowest remaining queries until
    the _SUMMARY_BUDGET byte budget is reached."""
    summary = {
        k: round(timings[k], 3) for k in _PINNED_SUMMARY if k in timings
    }
    compact = {
        "metric": "declared_query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": summary,
        "queries_file": queries_file,
        "errors": errors,
        "rep_errors": rep_errors,
    }
    for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
        if k in summary:
            continue
        candidate = dict(summary)
        candidate[k] = round(v, 3)
        compact["queries"] = candidate
        if len(json.dumps(compact, separators=(",", ":"))) > _SUMMARY_BUDGET:
            break
        summary = candidate
    compact["queries"] = {n: summary[n] for n in sorted(summary)}
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > _SUMMARY_BUDGET:
        # only reachable when hard-failure messages inflate `errors`;
        # keep the line parseable (a missing/truncated JSON line is
        # worse than a short error text — BENCH_r01's parsed:null)
        compact["errors"] = {n: e[:60] for n, e in errors.items()}
        line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= _SUMMARY_BUDGET, f"summary line too long ({len(line)} B)"
    return line


if __name__ == "__main__":
    main()
