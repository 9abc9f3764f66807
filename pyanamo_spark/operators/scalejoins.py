"""Shuffle-reduction join strategies, oracle-pinned to the plain join.

Two techniques a 100 TB deployment reaches for when neither side of a
join is broadcastable:

- **Bloom-pruned join** (``q_bloom_join``): build a Bloom filter of the
  selective side's join keys as a distributed bit-word table, prune the
  fact BEFORE its shuffle with k broadcast probes against that table,
  then run the real join on the survivors. The filter costs one
  dim-sized aggregation and a ≤(m/64)-row broadcast (128 KiB at m=2^20)
  and removes (1 - selectivity - fp_rate) of the fact from the shuffle
  — the manual, plan-visible form of Spark's runtime
  ``bloomFilter.enabled`` rewrite. False positives only re-admit rows
  the join itself drops, so the result is row-identical to the plain
  join (the oracle pins exactly that).

- **Salted skew join** (``q_salted_join``): spread a hot key's fact
  rows over n_salts tasks by joining on (key, salt) against a
  salt-replicated dimension (``functions/skew.salted_join``) — the
  manual form of AQE skew splitting, for when the skew is known up
  front or the join feeds an operator AQE can't re-split. The salt is
  physical only; the result is row-identical to the plain join.

Both queries force a sort-merge join on the final stage (``MERGE``
hint): with broadcast allowed the demo would silently degenerate to a
broadcast join and neither technique would be exercised; the paired
plan test asserts the physical shape (SortMergeJoin present, pruning
broadcasts dim-word-sized).

Money math follows the mart discipline (tpch_wave3.py): per-row cents
rounding into BIGINT sums so cross-engine totals are exact.

Reference parity: north-star extension of SURVEY.md §2.3 (the
reference's joins are driver-side boto3 loops,
``/root/reference/code/manager.py``); BASELINE.json directs the
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.functions.skew import salted_join
from pyanamo_spark.registry import register

#: Bloom geometry: m = 2^20 bits (16 Ki words, 128 KiB), k = 3 probes.
#: At |dim keys| = 150 M (sf100 urgent orders) a production run scales
#: m with the key count (m ≈ 10 bits/key for ~1% fp); the shape of the
#: plan — dim-sized agg, word-table broadcast, scan-side probe — is
#: unchanged, only the literal changes.
_M_BITS = 1 << 20
_K_PROBES = 3

_REV_CENTS = (
    "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
)


def bloom_words(keys: DataFrame, key: str) -> DataFrame:
    """Distributed Bloom build: one row per non-empty 64-bit word.

    Each key sets _K_PROBES bits at ``pmod(xxhash64(key, seed), m)``;
    bits fold into words with ``bit_or`` — a dim-sized map-side-combined
    aggregation to ≤ m/64 rows. No driver-side pass over the keys."""
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(_K_PROBES)])
    ).alias("seed")
    pos = F.pmod(F.xxhash64(F.col(key), F.col("seed")), F.lit(_M_BITS))
    return (
        keys.select(F.col(key), seeds)
        .select(
            F.shiftright(pos, 6).alias("word"),
            F.expr(
                f"shiftleft(1L, cast(pmod(xxhash64({key}, seed),"
                f" {_M_BITS}) % 64 as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prune(fact: DataFrame, key: str, words: DataFrame) -> DataFrame:
    """Drop fact rows whose key misses any of the k Bloom probes.

    One broadcast hash join per probe against the word table, each
    followed by a bit test — rows failing probe i never reach probe
    i+1, so the common (absent) case costs one probe. All probes are
    scan-side: nothing here shuffles the fact. The word table is
    renamed ONCE outside the loop so all k probe joins share one
    canonical subtree — ReuseExchange then builds/broadcasts the
    Bloom words a single time instead of k times."""
    w = words.withColumnRenamed("word", "_w").withColumnRenamed(
        "bits", "_bits"
    )
    for i in range(_K_PROBES):
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(_M_BITS))
        mask = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64({key}, {i}),"
            f" {_M_BITS}) % 64 as int))"
        )
        fact = (
            fact.withColumn("_w", F.shiftright(pos, 6))
            .join(F.broadcast(w), "_w")
            .filter(mask.bitwiseAND(F.col("_bits")) != 0)
            .drop("_w", "_bits")
        )
    return fact


@register(
    "q_bloom_join",
    oracle=f"""
SELECT l.l_returnflag,
       COUNT(*) AS n_lines,
       ROUND(CAST(SUM({_REV_CENTS}) AS DOUBLE) / 100.0, 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
""",
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-order revenue by return flag, with the lineitem side
    Bloom-pruned on orderkey before the (forced sort-merge) join —
    only ~20% of lines (the urgent share, + ~0.2% false positives)
    enter the shuffle. The oracle is the PLAIN join: the Bloom stage
    must be invisible in the result."""
    urgent = spark.table("orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    words = bloom_words(urgent.select("o_orderkey"), "o_orderkey")
    fact = bloom_prune(
        spark.table("lineitem").select(
            "l_orderkey",
            "l_returnflag",
            F.expr(_REV_CENTS).alias("rev_cents"),
        ),
        "l_orderkey",
        words,
    )
    return (
        fact.join(
            urgent.select("o_orderkey").hint("MERGE"),
            fact.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum("rev_cents").cast("double") / 100.0, 2
            ).alias("revenue"),
        )
    )


_PRICE_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@register(
    "q_salted_join",
    oracle=f"""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM({_PRICE_CENTS}) AS DOUBLE) / 100.0, 2)
         AS segment_total
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order totals by market segment through a SALTED customer join:
    the fact is salted into 16 shards per key, the dimension replicated
    ×16, and the (forced sort-merge) join runs on (custkey, salt) — so
    a pathologically hot customer spreads over 16 tasks instead of
    stalling one. The oracle is the plain join — the salt must be
    physical-only."""
    orders = spark.table("orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.expr(_PRICE_CENTS).alias("price_cents"),
    )
    dim = (
        spark.table("customer")
        .select("c_custkey", "c_mktsegment")
        .hint("MERGE")
    )
    joined = salted_join(orders, dim, "c_custkey", n_salts=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(
            F.sum("price_cents").cast("double") / 100.0, 2
        ).alias("segment_total"),
    )


__all__ = ["bloom_words", "bloom_prune", "q_bloom_join", "q_salted_join"]
