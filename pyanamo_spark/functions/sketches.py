"""Sketch-based approximate analytics (north star: the summaries a
100 TB pipeline computes instead of exact global state).

Three sketch families, each in its scale-native Spark form:

  - quantiles: ``percentile_approx`` (Greenwald-Khanna style summary,
    mergeable map-side; rank error ≤ n/accuracy) — the scale path the
    exact q_percentiles docstring points at
  - heavy hitters: ``stat.freqItems`` (Karp/Misra-Gries counter,
    single pass, NO shuffle, per-partition state ≤ 1/support) for
    candidate generation, then one exact count pass over candidates
    only. Because the sketch guarantees a SUPERSET of the true heavy
    hitters, the verified result is exactly the true set — so this
    sketch query is oracle-checkable even though the sketch itself is
    approximate. This candidates-then-verify is the production shape:
    the full groupBy alternative shuffles every distinct key; this
    shuffles only rows whose key is in the driver-sized candidate set.
  - cardinality: HyperLogLog (q_approx_distinct in functions/text.py);
    sketch mergeability — union of per-group sketches == one global
    sketch — is pinned in tests/test_sketches.py, the property that
    lets 100 TB rollups pre-aggregate sketches per partition/day and
    still answer global questions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: q_heavy_hitters support: a user is "heavy" above this share of all
#: events (chosen to split the fixture's user distribution)
HH_SUPPORT = 0.0075

#: GK accuracy: rank error ≤ n / accuracy
PCT_ACCURACY = 10_000


#: the quantiles q_percentiles_approx audits
PCT_QS = (0.25, 0.5, 0.75)


def approx_percentiles(spark: SparkSession) -> DataFrame:
    """Raw per-group GK quantiles (array output) — the library form;
    tests/test_sketches.py bounds each element against exact Python
    ranks."""
    return spark.table("orders").groupBy("o_orderstatus").agg(
        F.percentile_approx(
            "o_totalprice", list(PCT_QS), PCT_ACCURACY
        ).alias("approx_q"),
        F.count("*").alias("n_orders"),
    )


@register(
    "q_percentiles_approx",
    oracle="""
SELECT o_orderstatus, CAST(COUNT(o_totalprice) AS BIGINT) AS n_orders,
       CAST(1 AS INTEGER) AS q25_ok,
       CAST(1 AS INTEGER) AS q50_ok,
       CAST(1 AS INTEGER) AS q75_ok
FROM orders GROUP BY o_orderstatus
HAVING COUNT(o_totalprice) > 0
""",
)
def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Greenwald-Khanna quantile sketch with an IN-ENGINE
    accuracy audit: the mergeable-summary path that replaces
    q_percentiles' exact sort at scale, plus a second counting pass
    that certifies the sketch's rank-error guarantee
    (|rank(v) − p·n| ≤ n/accuracy) on this very dataset.

    The raw approx values cannot be oracle-compared (DuckDB's
    approx_quantile is a different sketch), but the GUARANTEE can:
    the declared output emits one ok-flag per quantile — 1 when the
    returned value's exact rank interval [#lt+1, #le] intersects the
    permitted band — and the oracle asserts the flags are all 1 and
    the group counts exact. A sketch regression (merge-order bug,
    accuracy misconfig) flips a flag and fails the hash compare.

    Scale shape: pass 1 is the sketch aggregation (map-combined GK
    summaries, one shuffle of summary blobs); pass 2 broadcast-joins
    the group-count-sized result back onto the scan and counts
    lt/le matches per group — one more map-combined aggregation, no
    sort anywhere. ``approx_percentiles()`` keeps the raw array form
    for library callers (and for the exact-rank test)."""
    approx = approx_percentiles(spark)
    # percentile_approx ranks only non-null values, so the audit must
    # count the same population: without this filter a null-bearing
    # price column inflates n (and the p·n target) past what the
    # sketch ever saw and the ok-flags can false-fail. The oracle's
    # COUNT(o_totalprice) matches (nulls excluded).
    orders = (
        spark.table("orders")
        .select("o_orderstatus", "o_totalprice")
        .filter(F.col("o_totalprice").isNotNull())
    )
    joined = orders.join(F.broadcast(approx), "o_orderstatus")
    aggs = [F.count("*").alias("n")]
    for i in range(len(PCT_QS)):
        v = F.element_at("approx_q", i + 1)
        aggs.append(
            F.sum((F.col("o_totalprice") < v).cast("long")).alias(f"lt_{i}")
        )
        aggs.append(
            F.sum((F.col("o_totalprice") <= v).cast("long")).alias(f"le_{i}")
        )
    stats = joined.groupBy("o_orderstatus").agg(*aggs)
    tol = F.col("n") / F.lit(PCT_ACCURACY) + F.lit(1.0)
    cols = [
        F.col("o_orderstatus"),
        F.col("n").alias("n_orders"),
    ]
    for i, (p, name) in enumerate(zip(PCT_QS, ("q25_ok", "q50_ok", "q75_ok"))):
        target = F.col("n") * F.lit(p)
        # intersection test of the returned value's exact rank interval
        # [lt+1, le] with the permitted band [p·n − tol, p·n + tol]:
        # lt+1 ≤ p·n + tol AND le ≥ p·n − tol (le without a +1 — the
        # off-by-one would mask a genuine one-rank sketch violation)
        ok = (
            (F.col(f"lt_{i}") + F.lit(1) <= target + tol)
            & (F.col(f"le_{i}") >= target - tol)
        )
        cols.append(ok.cast("int").alias(name))
    return stats.select(*cols)


@register(
    "q_heavy_hitters",
    oracle=f"""
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
HAVING COUNT(*) > {HH_SUPPORT} * (SELECT COUNT(*) FROM events)
""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: users with more than ``HH_SUPPORT`` of all
    events, via sketch-then-verify.

    Pass 1 (freqItems) streams the table once with a bounded counter
    per partition and no shuffle, returning a driver-sized candidate
    superset of every key exceeding the support. Pass 2 counts ONLY
    candidate rows (an isin filter pushed to the scan) and keeps those
    strictly above support x total. False-positive candidates are
    filtered by the exact pass, so the output equals the plain
    GROUP BY/HAVING oracle while shuffling a candidate-bounded key set
    instead of every distinct key — the difference between a bounded
    and an unbounded-cardinality exchange at 100 TB.
    """
    events = spark.table("events")
    candidates = [
        int(c)
        for c in events.stat.freqItems(["user_id"], HH_SUPPORT).collect()[
            0
        ][0]
    ]
    total = events.count()
    return (
        events.filter(F.col("user_id").isin(candidates))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") > F.lit(HH_SUPPORT) * F.lit(total))
    )


#: equi-depth histogram depth (deciles)
EQUIDEPTH_BUCKETS = 10
_EQ_FRACS = {
    f"c{i}": i / EQUIDEPTH_BUCKETS for i in range(1, EQUIDEPTH_BUCKETS)
}


@register(
    "q_equidepth",
    oracle=f"""
WITH cuts AS (
  SELECT {", ".join(
      f"quantile_cont(o_totalprice, {i / EQUIDEPTH_BUCKETS}) AS c{i}"
      for i in range(1, EQUIDEPTH_BUCKETS)
  )}
  FROM orders
),
bucketed AS (
  SELECT CAST(1 + {" + ".join(
      f"(CASE WHEN o_totalprice > c{i} THEN 1 ELSE 0 END)"
      for i in range(1, EQUIDEPTH_BUCKETS)
  )} AS BIGINT) AS bucket,
         o_totalprice
  FROM orders, cuts
)
SELECT bucket, COUNT(*) AS n_rows,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM bucketed GROUP BY bucket
""",
)
def q_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals — the data-profile
    / optimizer-statistics shape. The nine exact cutpoints come from
    the bounded-memory global percentile (functions/quantiles.py,
    bit-identical to quantile_cont so the oracle agrees on boundary
    rows) and return as a BUCKETS-sized collected model; bucketing is
    then a single codegen'd scan summing x > cut comparisons — no
    global sort, no ntile window, no second shuffle beyond the tiny
    per-bucket rollup."""
    from pyanamo_spark.functions.quantiles import exact_group_percentiles

    orders = spark.table("orders")
    cuts = exact_group_percentiles(
        orders, [], "o_totalprice", _EQ_FRACS
    ).collect()[0]
    if any(cuts[name] is None for name in _EQ_FRACS):
        # empty table: no cutpoints; empty histogram with the schema
        return (
            orders.filter(F.lit(False))
            .groupBy(F.lit(1).cast("long").alias("bucket"))
            .agg(
                F.count("*").alias("n_rows"),
                F.round(F.min("o_totalprice"), 2).alias("lo"),
                F.round(F.max("o_totalprice"), 2).alias("hi"),
            )
        )
    x = F.col("o_totalprice")
    bucket = sum(
        (
            F.when(x > F.lit(float(cuts[name])), 1).otherwise(0)
            for name in _EQ_FRACS
        ),
        F.lit(1),
    )
    return (
        orders.select(bucket.cast("long").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
