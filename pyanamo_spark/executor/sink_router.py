"""Size-tiered log sink router (SURVEY.md §2.1 S12, §4 R8).

The reference routes each task log by payload size
(/root/reference/code/executor.py:169-212): <2 KB inline into the task
store, 2 KB-10 MB to CloudWatch (with a tag-filtered summary kept
inline — the salvage path, executor.py:102-113,186-202), >10 MB
gzip-compressed to S3 (executor.py:117-131).

Spark mapping: one conditional-expression routing pass, then three
filtered writes. ``route_and_write`` is batch-callable and fits
``foreachBatch`` unchanged for the streaming path. Sinks are
directories here (local stand-ins for the task store / CloudWatch /
S3); the tiering policy and salvage semantics are the real logic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyanamo_spark.semantics import (
    LOG_CLOUDWATCH_MAX,
    LOG_INLINE_MAX,
    SALVAGE_TAG,
)


def with_sink(df: DataFrame, log_col: str = "stdout") -> DataFrame:
    """Attach the routing decision column (pure expression).

    NULL logs route inline (size 0): without the coalesce, a NULL
    payload falls through both when() branches into the gzip tier,
    where the text writer rejects null rows and fails the batch.
    """
    size = F.coalesce(F.octet_length(F.col(log_col)), F.lit(0))
    return df.withColumn(
        "sink",
        F.when(size < LOG_INLINE_MAX, "inline")
        .when(size <= LOG_CLOUDWATCH_MAX, "cloudwatch")
        .otherwise("s3_gzip"),
    )


def salvage_summary(df: DataFrame, log_col: str = "stdout") -> DataFrame:
    """Tag-filtered inline summary for oversized logs: keep only
    'PyAnamo:\\t'-tagged lines, tag stripped (executor.py:102-113)."""
    tagged = F.filter(
        F.split(F.col(log_col), "\n"),
        lambda line: line.startswith(SALVAGE_TAG + "\t"),
    )
    return df.withColumn(
        "salvaged",
        F.array_join(
            F.transform(tagged, lambda line: F.substring(line, 10, 2**31 - 1)),
            "\n",
        ),
    )


def route_and_write(
    df: DataFrame,
    base_dir: str,
    log_col: str = "stdout",
    batch_id: int | None = None,
) -> dict[str, str]:
    """Route one (micro-)batch of logs to its three sinks.

    Signature is foreachBatch-compatible via
    ``lambda b, bid: route_and_write(b, base, batch_id=bid)``.
    Returns {sink: path}. Writes are per-tier:
      - inline: parquet (the row store stand-in)
      - cloudwatch: parquet of (key, log, salvaged summary)
      - s3_gzip: gzip-compressed text (write-option compression, the
        executor.py:124-126 equivalent)
    """
    suffix = f"/batch_{batch_id}" if batch_id is not None else ""
    routed = with_sink(df, log_col).persist()
    paths: dict[str, str] = {}
    try:
        inline = routed.filter(F.col("sink") == "inline").drop("sink")
        paths["inline"] = os.path.join(base_dir, f"inline{suffix}")
        inline.write.mode("overwrite").parquet(paths["inline"])

        cw = salvage_summary(
            routed.filter(F.col("sink") == "cloudwatch"), log_col
        ).drop("sink")
        paths["cloudwatch"] = os.path.join(base_dir, f"cloudwatch{suffix}")
        cw.write.mode("overwrite").parquet(paths["cloudwatch"])

        big = routed.filter(F.col("sink") == "s3_gzip").select(
            F.col(log_col).alias("value")
        )
        paths["s3_gzip"] = os.path.join(base_dir, f"s3_gzip{suffix}")
        big.write.mode("overwrite").option("compression", "gzip").text(
            paths["s3_gzip"]
        )
    finally:
        routed.unpersist()
    return paths
