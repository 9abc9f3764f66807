"""Simulate the driver's verify pass end-to-end against __spark_entry__.

Replays the driver protocol: import the entry module, smoke-run
``entry(spark)`` (rows >= 0, stable schema), then for every
``queries()`` entry run the Spark DataFrame at the given sf dir and,
when an ``oracle_sql()`` entry exists, run the oracle in DuckDB with the
base parquet views pre-registered and compare row count + column names +
an order-insensitive value hash (columns sorted by name, doubles rounded
to 9 dp, rows sorted).

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


def value_hash(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def conv(v):
        if v is None:
            return "\0"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            r = round(v, 9)
            if r == 0:  # normalize -0.0 so zero-sign diffs don't FAIL
                r = 0.0
            return f"{r:.9f}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(conv(x) for x in v) + "]"
        return str(v)

    canon = sorted("|".join(conv(r[i]) for i in order) for r in rows)
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
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(
                f"[rows-only] {name}: {len(s_rows)} rows in "
                f"{time.perf_counter() - t0:.2f}s"
            )
            continue
        try:
            res = duck.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: oracle raised {type(exc).__name__}: {exc}")
            continue
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{status}] {name}: rows {len(s_rows)}/{len(d_rows)} "
            f"cols={'=' if ok_cols else sorted(s_cols) + sorted(d_cols)} "
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
