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

#: GK sketch accuracy: rank error ≤ n / ACCURACY. Sketch build cost
#: grows with ACCURACY (10 000 measured ~3× the cost of 4 000 on the
#: sf0.1 orders table), so this is the smallest value that still
#: leaves the MARGIN proof 30 % headroom.
ACCURACY = 4_000
#: Bracket half-width in probability space. Must exceed
#: 1/ACCURACY (sketch rank error) + 2/n (floor/ceil + (n−1)·p vs n·p
#: conversion slack); with the small-group threshold at 20 k,
#: 2/n ≤ 1e-4, so 5e-4 ≥ 2.5e-4 + 1e-4 with headroom.
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
    # empty gcols = one global group: the brackets row broadcasts to all
    j = (
        src.join(F.broadcast(brackets), gcols)
        if gcols
        else src.crossJoin(F.broadcast(brackets))
    )

    # ---- pass 2: ONE fused aggregation -----------------------------
    # Per group and fraction, in a single map-side-combinable agg:
    #   _below  exact count strictly below the bracket
    #   _nlo/_nhi  run lengths of the two bracket ENDPOINT values
    #   _surv   sorted list of the bracket INTERIOR values only
    # Excluding the endpoint runs from the collected list is what keeps
    # the buffer provably bounded: any interior value whose duplicate
    # run crossed the whole ±margin rank window would have been picked
    # as BOTH sketch endpoints (and so be an endpoint, counted not
    # collected); hence interior mass ≤ 2·(margin + sketch-error)·n
    # ≈ 0.12 % of the group at the defaults, and small groups collect
    # whole but are ≤ small_group rows by definition. This replaces the
    # previous below-agg → window-sort → pick-agg → pivot chain (four
    # shuffle boundaries) with one aggregation.
    aggs2: list = [F.first("_n").alias("_n")]
    for i in range(len(items)):
        blo, bhi = F.col(f"_blo{i}"), F.col(f"_bhi{i}")
        is_lo = ~small & (F.col("_v") == blo)
        is_hi = ~small & (F.col("_v") == bhi) & (bhi != blo)
        interior = small | (
            (F.col("_v") >= blo)
            & (F.col("_v") <= bhi)
            & ~is_lo
            & ~is_hi
        )
        aggs2 += [
            F.sum(
                F.when(~small & (F.col("_v") < blo), 1).otherwise(0)
            ).alias(f"_below{i}"),
            F.sum(F.when(is_lo, 1).otherwise(0)).alias(f"_nlo{i}"),
            F.sum(F.when(is_hi, 1).otherwise(0)).alias(f"_nhi{i}"),
            F.sort_array(
                F.collect_list(F.when(interior, F.col("_v")))
            ).alias(f"_surv{i}"),
            F.min(blo).alias(f"_vlo{i}"),
            F.min(bhi).alias(f"_vhi{i}"),
        ]
    stats = j.groupBy(*gcols).agg(*aggs2)

    # ---- final: pick + interpolate on the GROUPS-sized aggregate ---
    # global 0-based ranks: [0, below) < blo ≤ [below, below+nlo) =
    # blo-run < interior list < bhi-run; value at rank r follows that
    # layout. Small groups have below = nlo = nhi = 0 and _surv =
    # the whole group, so the interior branch picks directly.
    def value_at(i: int, rank):
        base = F.col(f"_below{i}")
        nlo = F.col(f"_nlo{i}")
        idx = (rank - base - nlo + 1).cast("int")
        return (
            F.when(rank < base + nlo, F.col(f"_vlo{i}"))
            .when(
                idx <= F.size(F.col(f"_surv{i}")),
                F.element_at(F.col(f"_surv{i}"), idx),
            )
            .otherwise(F.col(f"_vhi{i}"))
        )

    cols: list = list(gcols)
    for i, (name, p) in enumerate(items):
        pos = (F.col("_n") - F.lit(1)).cast("double") * F.lit(float(p))
        rlo, rhi = F.floor(pos), F.ceil(pos)
        frac = pos - rlo.cast("double")
        # Spark percentile's own interpolation expression — the float
        # association must match exactly for oracle bit-parity
        cols.append(
            (
                (F.lit(1.0) - frac) * value_at(i, rlo)
                + frac * value_at(i, rhi)
            ).alias(name)
        )
    return stats.select(*cols)
