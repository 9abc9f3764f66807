"""Simulate the driver's verify pass end-to-end against __spark_entry__.

Replays the driver protocol: import the entry module, smoke-run
``entry(spark)`` (rows >= 0, stable schema), then for every
``queries()`` entry run the Spark DataFrame at the given sf dir and,
when an ``oracle_sql()`` entry exists, run the oracle in DuckDB with the
base parquet views pre-registered and compare row count + column names +
an order-insensitive value hash.

FIDELITY: the hash canonicalizes through the DRIVER'S pandas path, not a
hand-rolled converter. The driver materializes the Spark result via
``toPandas()`` and the DuckDB result via ``fetchdf()``, sorts columns by
name, row-sorts with ``sort_values`` and stringifies columns with
``astype(str)``. That pipeline inherits pandas' coercions on purpose:

- DuckDB HUGEINT / DECIMAL become float64 (``"60158.0"``) while Spark
  emits int64 (``"60158"``) -> hash mismatch unless the oracle CASTs.
- list/map cells make ``sort_values`` raise ``TypeError: unhashable
  type`` exactly as the driver's canon does (CORRECTNESS_r05
  q_session_events).
- all-midnight datetime64 columns stringify as bare dates, matching
  Spark DateType's ``datetime.date`` strings (why date-valued green
  queries stay green).

Round-5 postmortem: the old converter used ``fetchall()`` + ``str()``,
which keeps HUGEINT a Python int and tolerates lists — both red driver
seats were green locally. Local green MUST imply official green, so the
sim now fails exactly where the driver fails (pinned by
tests/test_driver_sim.py).

Usage: python scripts/driver_sim.py [sf_dir] [q1,q2,...]
(default sf_dir /root/testdata/sf0.01; default all queries)
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from pyanamo_spark.catalog import TABLES  # noqa: E402
from pyanamo_spark.session import get_spark  # noqa: E402


def canon_hash(pdf) -> str:
    """Driver-faithful canonical hash of a pandas result frame.

    Sort columns by name, row-sort on every column (list cells raise
    here, as in the driver), stringify column-wise with ``astype(str)``
    (column-level datetime formatting, float64 repr), hash the sorted
    row strings. Raises on unhashable cells rather than tolerating
    them — a crash here is a crash in the official recording.
    """
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    cells = [pdf[c].astype(str) for c in pdf.columns]
    canon = sorted(
        "|".join(col.iloc[i] for col in cells) for i in range(len(pdf))
    )
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("driver-sim")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    df = entrymod.entry(spark)
    n = df.count()
    print(f"[smoke] entry() -> {n} rows, schema: {df.columns}")
    assert n >= 0

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        missing = only - queries.keys()
        assert not missing, f"unknown queries: {sorted(missing)}"
        queries = {k: v for k, v in queries.items() if k in only}
    failures = []
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = list(sdf.columns)
            s_pdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(
                f"[rows-only] {name}: {len(s_pdf)} rows in "
                f"{time.perf_counter() - t0:.2f}s"
            )
            continue
        try:
            d_pdf = duck.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: oracle raised {type(exc).__name__}: {exc}")
            continue
        try:
            ok_cols = sorted(s_cols) == sorted(d_pdf.columns)
            ok_count = len(s_pdf) == len(d_pdf)
            sh, dh = canon_hash(s_pdf), canon_hash(d_pdf)
        except Exception as exc:  # noqa: BLE001 — the driver's canon would crash too
            failures.append(name)
            print(f"[FAIL] {name}: canon raised {type(exc).__name__}: {exc}")
            continue
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{status}] {name}: rows {len(s_pdf)}/{len(d_pdf)} "
            f"cols={'=' if ok_cols else sorted(s_cols) + sorted(d_pdf.columns)} "
            f"hash {'=' if ok_hash else sh + '!=' + dh} "
            f"({time.perf_counter() - t0:.2f}s)"
        )

    print(
        f"\n{len(queries)} queries, {len(oracles)} oracles, "
        f"{len(failures)} failures{': ' + ','.join(failures) if failures else ''}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
