"""Write-layout clustering: range-cluster a table on its hot filter
columns so parquet min/max footer statistics make selective scans
skip whole files (the plain-parquet analogue of Delta/Iceberg
``OPTIMIZE ... ZORDER`` for the single-column-prefix case).

Partition pruning (``partitionBy``) only helps low-cardinality keys;
for high-cardinality ranges (timestamps, ids) the lever is file-level
clustering: ``repartitionByRange`` gives each output file a disjoint
key range (sampled range boundaries, one shuffle) and
``sortWithinPartitions`` orders rows inside each file so row-group
stats nest inside file stats. A reader filtering on the cluster
column then touches ~1/n_files of the data — at 100 TB the
difference between a scan and a seek.

Reference parity: the reference's recursiveGet scans a GSI to avoid
full-table reads (/root/reference/code/pyanamo.py query paths); file
range-clustering is the parquet-native version of "make the layout
match the access path".
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cluster_write(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Write ``df`` to ``path`` clustered into ``n_files`` disjoint
    ranges of ``cols`` (lexicographic), sorted within each file."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


#: interleave resolution: 16 bits per dimension → 32-bit Morton key
_Z_BITS = 16


def _morton(x: Column, y: Column) -> Column:
    """Bit-interleave two _Z_BITS-bit non-negative ints (x even bits,
    y odd) — pure shift/mask arithmetic, whole-stage codegen."""
    parts = [
        F.shiftleft(
            F.shiftright(c, i).bitwiseAND(F.lit(1)), 2 * i + off
        )
        for i in range(_Z_BITS)
        for off, c in ((0, x), (1, y))
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_write(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
) -> None:
    """TWO-dimensional clustering (Delta/Iceberg ``ZORDER BY (x, y)``
    analogue): rows sort by the Morton interleave of both columns, so
    every output file covers a COMPACT 2-D region and the parquet
    footer min/max of BOTH columns is narrow — a selective filter on
    either column (or both) skips most files.

    Contrast with ``cluster_write([x, y])``: lexicographic ranges make
    x-ranges disjoint but leave each file's y-range near-global — the
    second clustering column gets no file-skipping at all. The
    interleave trades a little x-locality for locality in both.

    Mechanics: both columns min-max-scale to [0, 2^bits) off a 1-row
    global aggregate (broadcast back, no second pass), the Morton key
    is shift/mask codegen, and the write is the same
    repartitionByRange + in-file sort as ``cluster_write`` on the key.
    One shuffle total."""
    bounds = df.agg(
        F.min(col_x).alias("_xlo"),
        F.max(col_x).alias("_xhi"),
        F.min(col_y).alias("_ylo"),
        F.max(col_y).alias("_yhi"),
    )
    top = F.lit((1 << _Z_BITS) - 1)

    def scale(c: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        return F.when(span <= 0, F.lit(0)).otherwise(
            F.least(
                top,
                F.floor(
                    (F.col(c) - F.col(lo))
                    / span
                    * (1 << _Z_BITS)
                ).cast("long"),
            )
        )

    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_z",
        _morton(
            scale(col_x, "_xlo", "_xhi"), scale(col_y, "_ylo", "_yhi")
        ),
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_xlo", "_xhi", "_ylo", "_yhi")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per data file, from parquet footer
    statistics — what a stats-aware reader prunes with."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema != col or c.statistics is None:
                    continue
                s = c.statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def bucketed_write(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table:
    rows are hash-distributed into ``n_buckets`` files per partition
    by ``key``, with the bucket spec recorded in the catalog.

    This is the THIRD layout lever next to partitioning and range
    clustering, and the one aimed at JOINS rather than scans: two
    tables bucketed on the same key with the same bucket count join
    with NO shuffle exchange on either side — at 100 TB the single
    biggest cost in a fact-to-fact join is exactly that pair of
    exchanges, paid once at write time here and amortized over every
    subsequent join (the plain-parquet analogue of a co-located /
    bucketed join in a warehouse). ``sort`` additionally orders each
    bucket file by the key so the join degenerates to a streaming
    merge of pre-sorted buckets. tests/test_layout.py pins the
    no-Exchange plan against an unbucketed control.
    """
    writer = (
        df.repartition(n_buckets, key)  # one file per bucket, not
        # one per (input partition × bucket): bucketed writers emit a
        # file per in-partition bucket they see
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
