"""Exact per-group percentiles with bounded executor memory.

Spark's exact ``percentile`` aggregate buffers every value of a group
in a single aggregation buffer — with a handful of giant groups (3
order-status groups over a 100 TB orders table) that is an executor
OOM by construction. This module computes the SAME exact interpolated
percentile (``quantile_cont`` semantics) with NO aggregation buffer
holding data values anywhere, via a sketch-prefilter + exact-verify
plan:

  pass 1 (one map-side-combinable aggregation)
      per group: row count ``n`` and, for each requested fraction
      ``p``, a bracket ``[blo, bhi]`` from ``percentile_approx`` at
      ``p ± margin`` (Greenwald-Khanna summary, memory ≤ O(accuracy)
      per group regardless of group size). The margin exceeds the
      sketch's rank-error guarantee, so the bracket provably contains
      the values at the target ranks.
  pass 2a (one codegen'd counting aggregation)
      per group and fraction: the exact count of rows strictly below
      ``blo`` — plain conditional sums, map-side combinable, fully
      inside whole-stage codegen.
  pass 2b (a spillable sort of ONLY the bracket interiors)
      rows inside each bracket (~2·(margin + 1/accuracy)·n, ≈0.7 % at
      the defaults) are tagged per fraction and ranked with a
      ``row_number`` window partitioned by (group, fraction). The sort
      is ``SortExec`` — it SPILLS under memory pressure, unlike an
      aggregation buffer, so even a pathological bracket (a duplicate
      run covering 50 % of a group) degrades to disk, not OOM. The
      value at ``global_rank = below + rank_within_bracket`` is then
      picked and interpolated with the same
      ``v_lo + frac·(v_hi − v_lo)`` expression Spark's exact
      percentile uses, so results are bit-identical to the
      unbounded-buffer plan.

Groups smaller than ``small_group_threshold`` skip the bracket (it is
degenerate at small n where the sketch's relative guarantee is weaker
than the ±2 absolute ranks the floor/ceil conversion needs) and ride
pass 2b whole — a spillable sort of ≤20 k rows per group.

This is the same approx-prefilter + exact-verify shape as
``dedup/embedding.py``: the sketch narrows, exact arithmetic decides,
and the result stays oracle-checkable. Reference parity: profiling
aggregations over gVCF width/GQ distributions
(/root/reference/code/gvcf_jobs usage in SURVEY §2.4 A8–A10) motivate
the percentile surface; the reference computes them single-node.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_percentiles_lowcard(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: dict[str, float],
) -> DataFrame:
    """Exact interpolated percentiles via a value histogram.

    The right plan when the measure has bounded distinct cardinality
    (integral quantities, ratings, milli-scores, token counts): one
    scan, one map-side-combined ``groupBy(group, value)`` count whose
    shuffle carries #distinct-values rows — independent of group row
    count — then cumulative ranks over the tiny histogram and the same
    interpolation expression as Spark's exact ``percentile``. Exact
    for ANY input, but on continuous columns the histogram degenerates
    to one row per input row (and the per-group window sorts it), so
    high-cardinality measures should use ``exact_group_percentiles``
    instead.
    """
    gcols = list(group_cols)
    items = list(ps.items())
    src = df.select(
        *gcols, F.col(value_col).cast("double").alias("_v")
    ).where(F.col("_v").isNotNull())
    hist = src.groupBy(*gcols, "_v").agg(F.count("*").alias("_c"))
    wo = Window.partitionBy(*gcols).orderBy("_v")
    wa = Window.partitionBy(*gcols)
    # 0-based global rank interval [_lo_rank, _hi_rank) per distinct value
    cum = (
        hist.withColumn("_hi_rank", F.sum("_c").over(wo))
        .withColumn("_lo_rank", F.col("_hi_rank") - F.col("_c"))
        .withColumn("_n", F.sum("_c").over(wa))
    )
    picks: list = [F.first("_n").alias("_n")]
    for i, (_, p) in enumerate(items):
        pos = (F.col("_n") - F.lit(1)).cast("double") * F.lit(float(p))
        rlo, rhi = F.floor(pos), F.ceil(pos)
        picks += [
            F.max(
                F.when(
                    (F.col("_lo_rank") <= rlo) & (rlo < F.col("_hi_rank")),
                    F.col("_v"),
                )
            ).alias(f"_lo{i}"),
            F.max(
                F.when(
                    (F.col("_lo_rank") <= rhi) & (rhi < F.col("_hi_rank")),
                    F.col("_v"),
                )
            ).alias(f"_hi{i}"),
        ]
    stats = cum.groupBy(*gcols).agg(*picks)
    cols: list = list(gcols)
    for i, (name, p) in enumerate(items):
        pos = (F.col("_n") - F.lit(1)).cast("double") * F.lit(float(p))
        frac = pos - F.floor(pos).cast("double")
        cols.append(
            (
                (F.lit(1.0) - frac) * F.col(f"_lo{i}")
                + frac * F.col(f"_hi{i}")
            ).alias(name)
        )
    return stats.select(*cols)

#: GK sketch accuracy: rank error ≤ n / ACCURACY. Sketch build cost
#: grows with ACCURACY; since the bracket interior now rides a
#: spillable sort (not an agg buffer), a coarser sketch only widens
#: that sort's input, so this is tuned for pass-1 speed with the
#: MARGIN proof keeping >60 % headroom.
ACCURACY = 1_000
#: Bracket half-width in probability space. Must exceed
#: 1/ACCURACY (sketch rank error) + 2/n (floor/ceil + (n−1)·p vs n·p
#: conversion slack); with the small-group threshold at 20 k,
#: 2/n ≤ 1e-4, so 2.5e-3 ≥ 1e-3 + 1e-4 with headroom.
MARGIN = 2.5e-3
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

    # ---- pass 2a: exact below-bracket counts ------------------------
    # Plain conditional sums — map-side combinable and fully codegen'd
    # (a collect_list here would demote the whole aggregation to the
    # slow object-hash path AND reintroduce an O(interior) buffer).
    aggs2: list = [F.first("_n").alias("_n")]
    for i in range(len(items)):
        aggs2.append(
            F.sum(
                F.when(
                    ~small & (F.col("_v") < F.col(f"_blo{i}")), 1
                ).otherwise(0)
            ).alias(f"_below{i}")
        )
    counts = j.groupBy(*gcols).agg(*aggs2)

    # ---- pass 2b: bracket interiors through a spillable sort --------
    # Tag every row with the fractions whose bracket contains it (all
    # fractions when the group is small), then rank within
    # (group, fraction) by value. Endpoint-duplicate runs ride the
    # sort — SortExec spills, so no tie pattern can OOM an executor.
    tag = F.array(
        *[
            F.when(
                small
                | (
                    (F.col("_v") >= F.col(f"_blo{i}"))
                    & (F.col("_v") <= F.col(f"_bhi{i}"))
                ),
                F.lit(i),
            )
            for i in range(len(items))
        ]
    )
    interior = j.select(*gcols, "_v", F.explode(tag).alias("_pi")).where(
        F.col("_pi").isNotNull()
    )
    w = Window.partitionBy(*gcols, "_pi").orderBy("_v")
    ranked = interior.withColumn("_r", F.row_number().over(w))
    joined = (
        ranked.join(F.broadcast(counts), gcols)
        if gcols
        else ranked.crossJoin(F.broadcast(counts))
    )

    # ---- final: pick the two target ranks, interpolate --------------
    # A row's 0-based global rank is below + rank_within_bracket − 1
    # (everything outside the bracket on the low side is < blo by
    # construction); the margin proof guarantees the rows at
    # floor/ceil((n−1)·p) are inside the bracket. Small groups have
    # below = 0 and contain the whole group, so the same expression is
    # their plain global rank.
    picks: list = [F.first("_n").alias("_n")]
    for i, (name, p) in enumerate(items):
        pos = (F.col("_n") - F.lit(1)).cast("double") * F.lit(float(p))
        g = F.col(f"_below{i}") + F.col("_r") - 1
        mine = F.col("_pi") == i
        picks += [
            F.max(
                F.when(mine & (g == F.floor(pos)), F.col("_v"))
            ).alias(f"_lo{i}"),
            F.max(
                F.when(mine & (g == F.ceil(pos)), F.col("_v"))
            ).alias(f"_hi{i}"),
        ]
    stats = joined.groupBy(*gcols).agg(*picks)

    cols: list = list(gcols)
    for i, (name, p) in enumerate(items):
        pos = (F.col("_n") - F.lit(1)).cast("double") * F.lit(float(p))
        frac = pos - F.floor(pos).cast("double")
        # Spark percentile's own interpolation expression — the float
        # association must match exactly for oracle bit-parity
        cols.append(
            (
                (F.lit(1.0) - frac) * F.col(f"_lo{i}")
                + frac * F.col(f"_hi{i}")
            ).alias(name)
        )
    return stats.select(*cols)
