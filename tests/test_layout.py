"""Range-clustered write layout: disjoint per-file key ranges,
content preservation, and the skip arithmetic the layout buys."""

from __future__ import annotations

from pyanamo_spark.sources.layout import cluster_write, file_column_ranges


def test_cluster_write_disjoint_ranges_and_roundtrip(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "events_clustered")
    cluster_write(events, out, ["user_id"], n_files=8)

    ranges = sorted(file_column_ranges(out, "user_id"))
    assert len(ranges) >= 4  # range partitioner actually split
    # file ranges are pairwise disjoint (boundary keys may touch when
    # a duplicate key straddles a sampled boundary — allow equality)
    for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, (hi_a, lo_b)

    # content preserved exactly
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert back.selectExpr("sum(event_id)").first()[0] == (
        events.selectExpr("sum(event_id)").first()[0]
    )

    # a selective predicate overlaps only a fraction of the files —
    # the skip a stats-aware scan performs
    lo, hi = ranges[0]
    touching = [r for r in ranges if r[0] <= hi and r[1] >= lo]
    assert len(touching) <= 2


def test_unclustered_layout_has_overlapping_ranges(spark, sf_dir, tmp_path):
    """Control: the same data written without clustering leaves every
    file spanning ~the full user range (no skip possible)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "events_flat")
    events.repartition(8).write.mode("overwrite").parquet(out)
    ranges = file_column_ranges(out, "user_id")
    assert len(ranges) >= 4
    overlaps = sum(
        1
        for i, (lo_a, hi_a) in enumerate(ranges)
        for lo_b, hi_b in ranges[i + 1 :]
        if lo_a <= hi_b and lo_b <= hi_a
    )
    # round-robin repartition: essentially every pair overlaps
    assert overlaps >= len(ranges)
