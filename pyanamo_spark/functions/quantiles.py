"""Exact per-group percentiles with bounded executor memory.

Spark's exact ``percentile`` aggregate buffers every value of a group
in a single aggregation buffer — with a handful of giant groups (3
order-status groups over a 100 TB orders table) that is an executor
OOM by construction. This module computes the SAME exact interpolated
percentile (``quantile_cont`` semantics) without any data-sized buffer,
via a sketch-prefilter + exact-verify two-stage plan:

  pass 1 (one map-side-combinable aggregation)
      per group: row count ``n`` and, for each requested fraction
      ``p``, a bracket ``[blo, bhi]`` from ``percentile_approx`` at
      ``p ± margin`` (Greenwald-Khanna summary, memory ≤ O(accuracy)
      per group regardless of group size). The margin exceeds the
      sketch's rank-error guarantee, so the bracket provably contains
      the values at the target ranks.
  pass 2 (one aggregation + a tiny sort)
      per group and fraction: the exact count of rows strictly below
      ``blo`` (map-side combinable), and a row_number sort of ONLY the
      rows inside the bracket (~2·margin·n rows, ≈0.1 % at the default
      margin). target-rank values are picked by
      ``global_rank = below + rank_within_bracket`` and interpolated
      with the same ``v_lo + frac·(v_hi − v_lo)`` expression Spark's
      exact percentile uses, so results are bit-identical to the
      unbounded-buffer plan.

Groups smaller than ``small_group_threshold`` skip the bracket (it is
degenerate at small n where the sketch's relative guarantee is weaker
than the ±2 absolute ranks the floor/ceil conversion needs) and sort
whole — a window sort over ≤20 k rows, trivially bounded.

This is the same approx-prefilter + exact-verify shape as
``dedup/embedding.py``: the sketch narrows, exact arithmetic decides,
and the result stays oracle-checkable. Reference parity: profiling
aggregations over gVCF width/GQ distributions
(/root/reference/code/gvcf_jobs usage in SURVEY §2.4 A8–A10) motivate
the percentile surface; the reference computes them single-node.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: GK sketch accuracy: rank error ≤ n / ACCURACY.
ACCURACY = 10_000
#: Bracket half-width in probability space. Must exceed
#: 1/ACCURACY (sketch rank error) + 2/n (floor/ceil + (n−1)·p vs n·p
#: conversion slack); with the small-group threshold at 20 k,
#: 2/n ≤ 1e-4, so 5e-4 ≥ 1e-4 + 1e-4 holds with 2.5× headroom.
MARGIN = 5e-4
#: Groups below this size bypass the sketch and sort whole.
SMALL_GROUP = 20_000


def exact_group_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: dict[str, float],
    accuracy: int = ACCURACY,
    margin: float = MARGIN,
    small_group: int = SMALL_GROUP,
) -> DataFrame:
    """Exact interpolated percentiles per group, bounded memory.

    Returns one row per group with ``group_cols`` plus a DOUBLE column
    per key of ``ps`` (insertion order preserved). Null values are
    ignored, matching ``percentile``/``quantile_cont``.
    """
    gcols = list(group_cols)
    items = list(ps.items())
    if margin <= 1.0 / accuracy:
        raise ValueError(
            "margin must exceed 1/accuracy (the sketch's rank error)"
        )
    # the bracket guarantee needs margin ≥ 1/accuracy + 2/n, i.e.
    # n ≥ 2/(margin − 1/accuracy); groups below that bound MUST take
    # the whole-sort path no matter what small_group the caller set
    guard_n = math.ceil(2.0 / (margin - 1.0 / accuracy))
    small_group = max(small_group, guard_n)
    src = df.select(
        *gcols, F.col(value_col).cast("double").alias("_v")
    ).where(F.col("_v").isNotNull())

    # ---- pass 1: n + sketch brackets (one agg, mergeable) ----------
    # ONE GK sketch per group, queried at every bracket endpoint at
    # once — percentile_approx with an array of fractions builds a
    # single summary, vs one sketch per endpoint (6 for 3 fractions)
    fracs: list[float] = []  # in-range endpoints, sketch-queried
    ends: list[tuple] = []  # (lo_idx | "min", hi_idx | "max") per p
    for _, p in items:
        plo, phi = p - margin, p + margin
        lo = "min" if plo <= 0.0 else len(fracs)
        if lo != "min":
            fracs.append(plo)
        hi = "max" if phi >= 1.0 else len(fracs)
        if hi != "max":
            fracs.append(phi)
        ends.append((lo, hi))
    aggs = [
        F.count("_v").alias("_n"),
        F.min("_v").alias("_vmin"),
        F.max("_v").alias("_vmax"),
    ]
    if fracs:
        arr = ", ".join(repr(f) for f in fracs)
        aggs.append(
            F.expr(
                f"percentile_approx(_v, array({arr}), {accuracy})"
            ).alias("_ba")
        )
    brackets = (
        src.groupBy(*gcols)
        .agg(*aggs)
        .select(
            *gcols,
            "_n",
            *[
                c
                for i, (lo, hi) in enumerate(ends)
                for c in (
                    (
                        F.col("_vmin") if lo == "min" else F.col("_ba")[lo]
                    ).alias(f"_blo{i}"),
                    (
                        F.col("_vmax") if hi == "max" else F.col("_ba")[hi]
                    ).alias(f"_bhi{i}"),
                )
            ],
        )
    )

    # small groups: degenerate bracket = everything, below-count 0
    small = F.col("_n") < F.lit(small_group)
    j = src.join(F.broadcast(brackets), gcols)

    # ---- pass 2a: exact strictly-below counts (one agg) ------------
    below = j.groupBy(*gcols).agg(
        *[
            F.sum(
                F.when(
                    ~small & (F.col("_v") < F.col(f"_blo{i}")), 1
                ).otherwise(0)
            ).alias(f"_below{i}")
            for i in range(len(items))
        ]
    )

    # ---- pass 2b: sort only the survivors --------------------------
    surv_tags = F.array(
        *[
            F.struct(
                F.lit(i).alias("_pi"),
                F.col(f"_blo{i}").alias("_lo"),
                F.col(f"_bhi{i}").alias("_hi"),
            )
            for i in range(len(items))
        ]
    )
    # pre-filter to the bracket union BEFORE exploding per-fraction
    # structs: only ~2·margin·n rows per fraction survive, so the 3×
    # explode runs over ~0.1 % of the data, not all of it
    lo_all = [F.col(f"_blo{i}") for i in range(len(items))]
    hi_all = [F.col(f"_bhi{i}") for i in range(len(items))]
    any_bracket = small | (
        (F.col("_v") >= (F.least(*lo_all) if len(lo_all) > 1 else lo_all[0]))
        & (F.col("_v") <= (F.greatest(*hi_all) if len(hi_all) > 1 else hi_all[0]))
    )
    surv = (
        j.where(any_bracket)
        .select(*gcols, "_v", small.alias("_small"), surv_tags.alias("_t"))
        .select(*gcols, "_v", "_small", F.explode("_t").alias("_b"))
        .where(
            F.col("_small")
            | (
                (F.col("_v") >= F.col("_b._lo"))
                & (F.col("_v") <= F.col("_b._hi"))
            )
        )
        .select(*gcols, F.col("_b._pi").alias("_pi"), "_v")
    )
    w = Window.partitionBy(*gcols, "_pi").orderBy("_v")
    ranked = surv.withColumn("_rn", F.row_number().over(w) - F.lit(1))

    # ---- target ranks per (group, fraction) ------------------------
    meta_tags = F.array(
        *[
            F.struct(
                F.lit(i).alias("_pi"),
                F.lit(name).alias("_pname"),
                F.lit(float(p)).alias("_p"),
                F.when(small, F.lit(0))
                .otherwise(F.col(f"_below{i}"))
                .alias("_below"),
            )
            for i, (name, p) in enumerate(items)
        ]
    )
    meta = (
        brackets.join(below, gcols)
        .select(*gcols, "_n", F.explode(meta_tags).alias("_m"))
        .select(
            *gcols,
            F.col("_m._pi").alias("_pi"),
            F.col("_m._pname").alias("_pname"),
            F.col("_m._below").alias("_below"),
            (
                (F.col("_n") - F.lit(1)).cast("double") * F.col("_m._p")
            ).alias("_pos"),
        )
        .withColumn("_rlo", F.floor("_pos"))
        .withColumn("_rhi", F.ceil("_pos"))
        .withColumn(
            "_frac", F.col("_pos") - F.col("_rlo").cast("double")
        )
    )

    grank = F.col("_below") + F.col("_rn")
    picked = (
        ranked.join(F.broadcast(meta), [*gcols, "_pi"])
        .where((grank == F.col("_rlo")) | (grank == F.col("_rhi")))
        .groupBy(*gcols, "_pi")
        .agg(
            F.max(F.when(grank == F.col("_rlo"), F.col("_v"))).alias(
                "_vlo"
            ),
            F.max(F.when(grank == F.col("_rhi"), F.col("_v"))).alias(
                "_vhi"
            ),
            F.first("_pname").alias("_pname"),
            F.first("_frac").alias("_frac"),
        )
        # Spark percentile's own interpolation expression,
        # (higher−pos)·v_lo + (pos−lower)·v_hi — the float association
        # must match exactly for oracle bit-parity
        .withColumn(
            "_val",
            (F.lit(1.0) - F.col("_frac")) * F.col("_vlo")
            + F.col("_frac") * F.col("_vhi"),
        )
    )
    out = (
        picked.groupBy(*gcols)
        .pivot("_pname", [name for name, _ in items])
        .agg(F.first("_val"))
    )
    return out.select(*gcols, *[name for name, _ in items])
