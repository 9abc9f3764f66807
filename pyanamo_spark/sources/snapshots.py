"""Snapshot-commit protocol: transactional table swaps on plain parquet.

The container has no Delta/Iceberg, but their reader-consistency core
— readers always see one complete table version, never a mix of two
writes — needs only immutable data files plus one atomic pointer
rename (the same primitive `dedup/incremental.compact_store` uses per
partition, generalized here to whole-table commits):

  table_dir/
    _CURRENT            <- text file holding the committed version N
    v=00000001/...      <- immutable parquet snapshot directories
    v=00000002/...

``snapshot_commit`` writes the new version to its OWN directory (never
touching published files), then atomically swings ``_CURRENT`` via
``os.replace``. ``snapshot_read`` resolves the pointer ONCE and pins
the concrete directory, so a DataFrame handle keeps reading its
version even while later commits land — the either-old-or-new
guarantee a crash or a concurrent reader observes. Old versions stay
readable for time travel until ``vacuum`` drops all but the last K.

Single-writer by contract (like compact_store: production fences
writers with a lease); readers need no coordination at all. On object
stores the pointer swap maps to a conditional PUT — the same protocol
Delta's ``_last_checkpoint`` / Iceberg's catalog pointer use.

Reference parity: the reference finalizes results with whole-object
S3 puts after task completion (/root/reference/code/executor.py sink
routing) — last-write-wins without torn reads; this reproduces that
atomicity for multi-file Spark outputs.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"
_FMT = "v=%08d"


def _pointer(table_dir: str) -> str:
    return os.path.join(table_dir, _CURRENT)


def current_version(table_dir: str) -> int | None:
    """The committed version, or None for an empty/uninitialized table.

    ONLY a missing pointer means uninitialized. Any other read failure
    (corrupt contents, EACCES/EIO) raises: commit_version keys its
    orphan-clearing rmtree off this value, and mapping a transient
    pointer-read error to "uninitialized" would let a retry delete the
    PUBLISHED v=1 directory and re-point to fresh data — silent loss
    where the old errorifexists path failed loudly."""
    try:
        with open(_pointer(table_dir)) as f:
            raw = f.read().strip()
    except FileNotFoundError:
        return None
    try:
        return int(raw)
    except ValueError as e:
        raise ValueError(
            f"corrupt snapshot pointer {_pointer(table_dir)!r}: "
            f"{raw[:40]!r} is not a version number — refusing to treat "
            f"the table as uninitialized; restore the pointer from the "
            f"highest complete v= directory"
        ) from e


def version_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _FMT % version)


def snapshot_read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the committed snapshot (or a pinned ``version`` for time
    travel). The pointer is resolved HERE, once — the returned
    DataFrame is bound to one immutable directory and is unaffected by
    commits that land after this call."""
    v = current_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    return spark.read.parquet(version_dir(table_dir, v))


def commit_version(table_dir: str, writer) -> int:
    """Run ``writer(unpublished_version_dir)`` for the next version,
    then publish it atomically (tmp file + fsync + ``os.replace`` of
    the pointer). The generalized core of ``snapshot_commit`` for
    callers whose version is more than one DataFrame (the IVF index
    writes a lists/centroids PAIR per version).

    Crash-retry safe: a previous attempt that died mid-write left an
    UNPUBLISHED orphan directory at this same version number (the
    pointer never moved), so it is cleared before writing — without
    this, the retry's errorifexists write fails forever. Single-writer
    by the module contract above."""
    os.makedirs(table_dir, exist_ok=True)
    v = (current_version(table_dir) or 0) + 1
    vdir = version_dir(table_dir, v)
    if os.path.isdir(vdir):
        shutil.rmtree(vdir)  # orphan from a crashed, never-published try
    writer(vdir)
    tmp = os.path.join(table_dir, f".{_CURRENT}.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(v))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _pointer(table_dir))
    return v


def snapshot_commit(
    spark: SparkSession, table_dir: str, df: DataFrame
) -> int:
    """Materialize ``df`` as the next version and publish it atomically.

    The data write happens entirely inside the unpublished version
    directory; only after it completes does the pointer move, via an
    ``os.replace`` of a same-directory temp file — atomic on POSIX, so
    any concurrent ``snapshot_read`` resolves wholly to the old or
    wholly to the new version. A crash before the rename leaves an
    orphan directory (cleared by the retry or by ``vacuum``), never a
    torn table. Returns the committed version number."""
    return commit_version(
        table_dir,
        lambda vdir: df.write.mode("errorifexists").parquet(vdir),
    )


def vacuum(table_dir: str, keep: int = 2) -> int:
    """Drop snapshot directories older than the last ``keep`` versions
    (the current one is always kept) plus any orphaned uncommitted
    directories above the pointer. Readers must not hold version
    handles across more than ``keep`` commits — the same contract as
    Delta's VACUUM retention. Returns directories removed."""
    cur = current_version(table_dir)
    if cur is None:
        return 0
    removed = 0
    for name in os.listdir(table_dir):
        if not name.startswith("v="):
            continue
        try:
            v = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if v <= cur - keep or v > cur:
            shutil.rmtree(os.path.join(table_dir, name))
            removed += 1
    return removed


def table_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Change-data-capture between two table states: one row per
    changed key with change ∈ {insert, delete, update}.

    One full-outer join on the key columns; payload comparison is
    column-wise null-safe equality (eqNullSafe — no digest, so the
    same SQL is oracle-expressible with IS DISTINCT FROM). Both sides
    shuffle on the key once; unchanged keys are filtered out
    post-join, so the output is changes-sized. This is the primitive
    an incremental pipeline derives its work-list from: diff the
    current snapshot against the last processed one, reprocess only
    insert/update keys, retract delete keys."""
    payload = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("table_diff requires identical schemas")
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in payload],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in payload],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    same_payload = F.lit(True)
    for c in payload:
        same_payload = same_payload & F.col(f"_o_{c}").eqNullSafe(
            F.col(f"_n_{c}")
        )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same_payload, F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            "change",
            *[
                F.coalesce(F.col(f"_kn_{k}"), F.col(f"_ko_{k}")).alias(k)
                for k in keys
            ],
        )
    )


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    keys: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC between two committed snapshot versions (time-travel reads
    pinned to their immutable directories)."""
    return table_diff(
        snapshot_read(spark, table_dir, from_version),
        snapshot_read(spark, table_dir, to_version),
        keys,
    )
