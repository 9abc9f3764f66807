"""Skew-handling utilities (SURVEY.md §4 / the 100 TB contract).

AQE's skew-join splitting handles skewed *joins* automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py). Skewed
*aggregations* — a groupBy where one key holds most rows — still
funnel one key's rows to one task; ``salted_agg`` is the standard
two-stage rewrite:

  stage 1: group by (key, salt) where salt = pmod(hash-ish, N) —
           spreads the hot key over N tasks, partial results per shard
  stage 2: group by key — combines N shard rows per key (tiny input)

Only algebraic aggregates compose this way (count/sum/min/max —
anything with a merge function); avg is sum/count at the call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate name → (stage-1 fn, stage-2 combiner)
_MERGEABLE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column → (agg_name, input column), e.g.
    ``{"n": ("count", "*"), "total": ("sum", "value")}``.
    Result is row-identical to ``df.groupBy(keys).agg(...)`` — the salt
    only changes the physical distribution.
    """
    salted = df.withColumn(
        "_salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _MERGEABLE[name][0](col).alias(f"_{out}")
            for out, (name, col) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _MERGEABLE[name][1](f"_{out}").alias(out)
            for out, (name, _) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join by salt replication — the manual form of
    what AQE's skew-join does adaptively, for when the skew is known
    up front (or the join feeds an operator AQE cannot re-split).

    The fact side gets a random-ish salt in [0, n_salts); the dim side
    is replicated once per salt value (an explode of a literal range —
    dim rows × n_salts, fine for dimension-sized tables). Joining on
    (key, salt) spreads a hot key's fact rows over n_salts tasks
    instead of one. Row-identical to ``fact.join(dim, key)``; inner
    join only (a missing dim key drops all salt shards alike).
    """
    salted_fact = fact.withColumn(
        "_salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.lit(list(range(n_salts))))
    )
    return salted_fact.join(salted_dim, [key, "_salt"]).drop("_salt")
