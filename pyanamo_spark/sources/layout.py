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

from pyspark.sql import DataFrame


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
