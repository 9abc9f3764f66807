"""Log analytics — the executor.py log-handling surface as queries
(SURVEY.md §2.1 S12, §2.8 F5/F8, §3.3 log mining).

The write-side router itself (three sinks behind foreachBatch) lives in
pyanamo_spark.executor.sink_router; these queries are the analytic
shapes the oracle can check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register
from pyanamo_spark.semantics import LOG_CLOUDWATCH_MAX, LOG_INLINE_MAX


@register(
    "q_log_route",
    oracle=f"""
SELECT CASE
         WHEN strlen(stdout) < {LOG_INLINE_MAX} THEN 'inline'
         WHEN strlen(stdout) <= {LOG_CLOUDWATCH_MAX} THEN 'cloudwatch'
         ELSE 's3_gzip'
       END AS sink,
       COUNT(*) AS n_logs,
       CAST(SUM(strlen(stdout)) AS BIGINT) AS total_bytes
FROM nests
WHERE status = 'done'
GROUP BY 1
""",
    needs_views=("tasks", "nests"),
)
def q_log_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 handleLogs size-tiered sink routing (executor.py:169-212):
    <2 KB inline / 2 KB-10 MB CloudWatch / >10 MB gzip→S3
    (cutoffs at executor.py:180-184). The routing decision is a pure
    expression; the declared query audits the tier distribution."""
    return (
        spark.table("nests")
        .filter(F.col("status") == "done")
        .withColumn(
            "sink",
            F.when(F.octet_length("stdout") < LOG_INLINE_MAX, "inline")
            .when(F.octet_length("stdout") <= LOG_CLOUDWATCH_MAX, "cloudwatch")
            .otherwise("s3_gzip"),
        )
        .groupBy("sink")
        .agg(
            F.count("*").alias("n_logs"),
            F.sum(F.octet_length("stdout")).cast("long").alias("total_bytes"),
        )
    )


@register(
    "q_tag_extract",
    oracle="""
SELECT itemID, nestID, substring(line, 10) AS tagged
FROM (
  SELECT itemID, nestID, unnest(string_split(stdout, chr(10))) AS line
  FROM nests
  WHERE status = 'done'
)
WHERE line LIKE 'PyAnamo:' || chr(9) || '%'
""",
    needs_views=("tasks", "nests"),
)
def q_tag_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 log salvage (executor.py:102-113): when a payload is too big
    to store inline, keep only lines tagged 'PyAnamo:\\t' with the tag
    stripped — explode lines, prefix filter, substring."""
    return (
        spark.table("nests")
        .filter(F.col("status") == "done")
        .select(
            "itemID",
            "nestID",
            F.explode(F.split(F.col("stdout"), "\n")).alias("line"),
        )
        .filter(F.col("line").startswith("PyAnamo:\t"))
        .select("itemID", "nestID", F.substring("line", 10, 2**31 - 1).alias("tagged"))
    )


@register(
    "q_log_mine",
    oracle="""
SELECT itemID, nestID,
       CASE WHEN len(list_filter(string_split(stdout, chr(10)),
                                 x -> len(string_split(x, chr(9))) = 7)) > 0
            THEN 'Completed' ELSE 'Failed' END AS outcome
FROM nests
WHERE status = 'done'
""",
    needs_views=("tasks", "nests"),
)
def q_log_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log mining (managing-item-logs.py:95-127): a done task Completed
    iff its stdout contains a line of exactly 7 tab-separated fields
    (the golden-output contract, managing-item-logs.py:112-122) —
    higher-order exists() over the split lines, no explode needed."""
    ok = F.exists(
        F.split(F.col("stdout"), "\n"),
        lambda line: F.size(F.split(line, "\t")) == 7,
    )
    return (
        spark.table("nests")
        .filter(F.col("status") == "done")
        .select(
            "itemID",
            "nestID",
            F.when(ok, "Completed").otherwise("Failed").alias("outcome"),
        )
    )


@register(
    "q_date_format",
    oracle="""
SELECT event_id,
       strftime(ts, '%d/%m/%Y-%H:%M:%S') AS formatted,
       CAST(epoch_ms(ts) AS BIGINT) AS epoch_millis
FROM events
""",
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9 date handling: the reference's '%d/%m/%Y-%H:%M:%S' string
    dates (modifier.py:78) and epoch-millis stamps (executor.py:192) as
    expressions over real timestamps."""
    return spark.table("events").select(
        "event_id",
        F.date_format("ts", "dd/MM/yyyy-HH:mm:ss").alias("formatted"),
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1000)
        .cast("long")
        .alias("epoch_millis"),
    )
