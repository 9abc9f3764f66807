"""Subprocess execution stage — the reference's entire "UDF surface"
(SURVEY.md §2.10): executeTaskScript runs an arbitrary shell command,
captures stdout/stderr, counts lines (executor.py:51-98).

Spark mapping: ``mapInPandas`` over the todo-nest table. Each Arrow
batch runs its scripts with subprocess, so one Spark task executes one
partition of work items — the scheduler's exclusive partition
assignment replaces the reference's optimistic lock protocol
(runner.py:154-229, SURVEY §4 R6), and two process boundaries
(item pool × nest pool, parallel_processes.py) collapse into stage
parallelism.

Divergence note (SURVEY §7.4.7): the reference splits commands with
``script.split(" ")`` (executor.py:76), which breaks on quoted args;
we use shlex.split — capability preserved, bug not.

The declared query runs real ``seq`` subprocesses (the reference's own
smoke convention, README.md:56-62) and is *oracle-checked*: seq output
is deterministic, so DuckDB reproduces the expected stdout with
generate_series.
"""

from __future__ import annotations

import shlex
import subprocess
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

RESULT_SCHEMA = (
    "itemID string, nestID string, exit_code int, stdout string, "
    "stderr string, n_lines bigint"
)


def _run_scripts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for item_id, nest_id, script in zip(
            pdf["itemID"], pdf["nestID"], pdf["script"]
        ):
            try:
                argv = shlex.split(script or "")
                if not argv:
                    raise ValueError("empty task script")
                proc = subprocess.run(
                    argv,
                    capture_output=True,
                    text=True,
                    timeout=60,
                )
                out, err, code = proc.stdout, proc.stderr, proc.returncode
            except (OSError, subprocess.TimeoutExpired, ValueError) as exc:
                # ValueError: unbalanced quotes or empty script — mark
                # THIS item failed instead of crashing the Spark task
                # (which would abort every other item's work)
                out, err, code = "", str(exc), -1
            rows.append(
                {
                    "itemID": item_id,
                    "nestID": nest_id,
                    "exit_code": code,
                    "stdout": out,
                    "stderr": err,
                    # Log_Length semantics: newline-split count
                    # (executor.py:80)
                    "n_lines": len(out.split("\n")),
                }
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "itemID",
                "nestID",
                "exit_code",
                "stdout",
                "stderr",
                "n_lines",
            ],
        )


def substitute_vars(scripts, env: dict[str, str]):
    """F4 (executor.py:75): expand ``${VAR}`` placeholders in task
    scripts from a fixed mapping — the reference rewrites
    ``${PYANAMO}``/``${PIPELINE}`` to install paths before Popen. One
    codegen'd replace chain, no UDF; sorted so the expression tree is
    deterministic for a given mapping."""
    col = F.col(scripts) if isinstance(scripts, str) else scripts
    for key, val in sorted(env.items()):
        col = F.replace(col, F.lit("${%s}" % key), F.lit(val))
    return col


def execute_nests(
    nests: DataFrame,
    parallelism: int | None = None,
    env: dict[str, str] | None = None,
) -> DataFrame:
    """Run every (itemID, nestID, script) row as a subprocess.

    ``repartition(parallelism)`` spreads the work items evenly before
    the pipe stage — the two-level multiprocessing fan-out of
    parallel_processes.py:15-143 expressed as partition count.
    ``env`` expands ``${VAR}`` placeholders in scripts first (F4).
    """
    work = nests.select("itemID", "nestID", "script")
    if env:
        work = work.withColumn("script", substitute_vars("script", env))
    if parallelism:
        work = work.repartition(parallelism)
    return work.mapInPandas(_run_scripts, schema=RESULT_SCHEMA)


@register(
    "q_pipe_exec",
    oracle="""
WITH work AS (
  SELECT itemID, nestID,
         1 + (CAST(substring(itemID, 6) AS BIGINT) % 8) AS a,
         CAST(substring(nestID, 6) AS BIGINT) AS b
  FROM nests
  WHERE status = 'todo'
    AND CAST(substring(itemID, 6) AS BIGINT) % 200 = 0
    AND CAST(substring(nestID, 6) AS BIGINT) < 8
)
SELECT itemID, nestID,
       0 AS exit_code,
       CASE WHEN a <= b
            THEN array_to_string(generate_series(a, b), chr(10)) || chr(10)
            ELSE '' END AS stdout,
       CAST(CASE WHEN a <= b THEN b - a + 2 ELSE 1 END AS BIGINT) AS n_lines
FROM work
""",
    needs_views=("tasks", "nests"),
)
def q_pipe_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipe stage end-to-end on a work slice: todo nests of every
    200th item run their real `seq a b` scripts in subprocesses; the
    oracle reproduces seq's exact stdout with generate_series, so the
    whole subprocess path is hash-checked, not just smoke-tested."""
    nests = spark.table("nests").filter(
        (F.col("status") == "todo")
        & (F.expr("CAST(substring(itemID, 6) AS BIGINT) % 200") == 0)
        & (F.col("nest_idx") < 8)
    )
    return execute_nests(nests, parallelism=8).select(
        "itemID", "nestID", "exit_code", "stdout", "n_lines"
    )
