"""Regression: ensure_views must re-register when the sf_dir changes
within one session (a stale memo would silently serve the previous
directory's data)."""

from __future__ import annotations

from pyanamo_spark import semantics


def test_ensure_views_tracks_sf_dir_changes(spark):
    semantics.ensure_views(spark, "/root/testdata/sf0.001")
    n_small = spark.table("tasks").count()
    semantics.ensure_views(spark, "/root/testdata/sf0.01")
    n_big = spark.table("tasks").count()
    assert n_big == 10 * n_small  # orders scale ×10 per sf step
    # and switching back re-registers again
    semantics.ensure_views(spark, "/root/testdata/sf0.001")
    assert spark.table("tasks").count() == n_small
