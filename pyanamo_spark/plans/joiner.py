"""Adaptive join-strategy selection: profile the inputs cheaply, then
pick broadcast / salted / Bloom-pruned / plain shuffle — the decision
procedure q_skew_profile's report implies, automated.

Why this exists: Catalyst broadcasts when size estimates allow and AQE
splits skewed partitions it can see, but three decisions stay with the
engine user at 100 TB, because they need information the optimizer
doesn't gather or rewrites it won't apply:

- salting (when the join feeds an operator AQE can't re-split, or the
  skew is known up front),
- manual Bloom pre-filters (prune the fact BEFORE its shuffle when the
  dim is selective but too big to broadcast),
- declining a borderline broadcast (driver memory budget).

``join_auto`` makes those calls from two bounded probes:

1. dim cardinality + estimated width → broadcast budget check. The
   count is a dim-sized aggregate (map-side combined); width comes
   from the schema with a small sampled correction for strings.
2. fact key skew from a fixed-size SAMPLE (seeded, never a full scan):
   top-key share of the sampled rows vs 1/n_keys.

Both probes are driver-side only in their final scalars; nothing
fact-sized is collected. The chosen plan is returned together with a
``JoinDecision`` record so callers (and tests) can see WHY.

Every strategy is row-identical to ``fact.join(dim, on)`` — strategy
changes physical distribution only (test_joiner.py pins all branches;
the registered ``q_join_auto`` pins the fixture path against the
plain-join oracle).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.functions.skew import salted_join
from pyanamo_spark.operators.scalejoins import bloom_prune, bloom_words
from pyanamo_spark.registry import register

#: conservative per-type widths for broadcast sizing (bytes)
_TYPE_WIDTH = {
    "tinyint": 1, "smallint": 2, "int": 4, "bigint": 8,
    "float": 4, "double": 8, "date": 4, "timestamp": 8,
    "timestamp_ntz": 8, "boolean": 1,
}
_DEFAULT_WIDTH = 24  # strings/decimals before sampling correction


@dataclass
class JoinDecision:
    strategy: str       # broadcast | salted | bloom | shuffle
    dim_rows: int
    dim_bytes_est: int
    skew_share: float   # top sampled key's share of sampled fact rows
    n_sampled: int


def _estimate_dim_bytes(dim: DataFrame, dim_rows: int) -> int:
    """rows × schema width, with string widths corrected from a
    64-row sample (avg length) instead of a blind constant."""
    width = 0
    string_cols = []
    for name, dtype in dim.dtypes:
        if dtype == "string":
            string_cols.append(name)
        else:
            width += _TYPE_WIDTH.get(dtype, _DEFAULT_WIDTH)
    if string_cols and dim_rows:
        sample = dim.select(
            *[F.length(c).alias(c) for c in string_cols]
        ).limit(64).agg(
            *[F.avg(c).alias(c) for c in string_cols]
        ).first()
        width += sum(int(sample[c] or 0) + 8 for c in string_cols)
    return dim_rows * max(width, 1)


def profile_fact_skew(
    fact: DataFrame, key: str, fraction: float = 0.01, seed: int = 7
) -> tuple[float, int]:
    """(top-key share, sampled rows) from a seeded Bernoulli sample —
    the q_skew_profile measurement at probe cost. The sample aggregate
    is keys-sized; only the 1-row top share is collected."""
    sampled = fact.sample(fraction=fraction, seed=seed).groupBy(key).agg(
        F.count("*").alias("n")
    )
    row = (
        sampled.agg(
            F.max("n").alias("top"), F.sum("n").alias("total")
        ).first()
    )
    if not row or not row["total"]:
        return 0.0, 0
    return row["top"] / row["total"], int(row["total"])


def join_auto(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    broadcast_bytes: int = 32 << 20,
    skew_share_threshold: float = 0.2,
    bloom_max_keys: int = 50_000_000,
    n_salts: int = 16,
    sample_fraction: float = 0.01,
) -> tuple[DataFrame, JoinDecision]:
    """Join ``fact`` and ``dim`` on the shared column ``key`` with an
    auto-chosen strategy; returns (joined, decision).

    Order of preference:
      1. dim fits the broadcast budget → broadcast hash join (no fact
         shuffle at all).
      2. sampled fact skew above threshold → salted sort-merge join
         (hot key spread over n_salts tasks).
      3. dim selective but unbroadcastable (≤ bloom_max_keys) → Bloom
         pre-filter on the fact, then shuffle join of survivors.
      4. otherwise → plain shuffle join (AQE handles residual skew).
    """
    dim_rows = dim.count()
    dim_bytes = _estimate_dim_bytes(dim, dim_rows)
    skew_share, n_sampled = profile_fact_skew(
        fact, key, fraction=sample_fraction
    )
    if dim_bytes <= broadcast_bytes:
        decision = "broadcast"
        joined = fact.join(F.broadcast(dim), key)
    elif skew_share >= skew_share_threshold:
        decision = "salted"
        joined = salted_join(fact, dim.hint("MERGE"), key, n_salts=n_salts)
    elif dim_rows <= bloom_max_keys:
        decision = "bloom"
        words = bloom_words(dim.select(key), key)
        joined = bloom_prune(fact, key, words).join(dim.hint("MERGE"), key)
    else:
        decision = "shuffle"
        joined = fact.join(dim.hint("MERGE"), key)
    return joined, JoinDecision(
        decision, dim_rows, dim_bytes, round(skew_share, 4), n_sampled
    )


@register(
    "q_join_auto",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
)
def q_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planner on the fixture: customer is dimension-sized, so the
    decision lands on broadcast and the oracle pins the result to the
    plain join — strategy is physical-only by construction. The other
    three branches are pinned row-identical in tests/test_joiner.py
    with thresholds forced to each path."""
    fact = spark.table("orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    dim = spark.table("customer").select("c_custkey", "c_mktsegment")
    joined, _decision = join_auto(fact, dim, "c_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders")
    )


def estimate_join_rows(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Exact inner-join output size WITHOUT running the join:
    Σ_k n_fact(k)·n_dim(k) over shared keys, from two key-count
    aggregates joined keys-sized — plus the largest single-key
    contribution (the skew alarm: one key producing a large share of
    the output is what stalls a task).

    Both inputs collapse to (key, count) with map-side combine before
    anything joins, so the estimate costs two scans and a keys-sized
    shuffle — the pre-flight a pipeline runs before committing a
    petabyte shuffle join."""
    a = fact.groupBy(F.col(fact_key).alias("_k")).agg(
        F.count("*").alias("_na")
    )
    b = dim.groupBy(F.col(dim_key).alias("_k")).agg(
        F.count("*").alias("_nb")
    )
    return (
        a.join(b, "_k")
        .select((F.col("_na") * F.col("_nb")).alias("_c"))
        .agg(
            F.sum("_c").alias("predicted_rows"),
            F.count("*").alias("n_shared_keys"),
            F.max("_c").alias("max_key_rows"),
        )
    )


@register(
    "q_join_cardinality",
    oracle="""
WITH a AS (
  SELECT l_orderkey AS k, COUNT(*) AS na FROM lineitem GROUP BY 1
),
b AS (
  SELECT o_orderkey AS k, COUNT(*) AS nb FROM orders GROUP BY 1
)
SELECT CAST(SUM(na * nb) AS BIGINT) AS predicted_rows,
       COUNT(*) AS n_shared_keys,
       CAST(MAX(na * nb) AS BIGINT) AS max_key_rows
FROM a JOIN b USING (k)
""",
)
def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight size of lineitem⋈orders: predicted output rows,
    shared-key count, and the heaviest key's contribution — the
    numbers that decide whether the shuffle join is affordable and
    whether it needs the salted path first. Oracle replays the same
    count-product identity; for an inner equi-join it is EXACT, not
    an estimate."""
    return estimate_join_rows(
        spark.table("lineitem"),
        spark.table("orders"),
        "l_orderkey",
        "o_orderkey",
    )
