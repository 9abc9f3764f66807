"""Oracle-parity harness: mirrors the driver's correctness gate.

For every registered declared query, run the Spark DataFrame and the
DuckDB oracle SQL on the same sf dir, sort columns by name, sort rows,
and compare values — the same shape of check the driver performs at
sf0.01 (/root/repo/__spark_entry__.py docstring). Rows-only queries
(no oracle) are smoke-checked for executability and stable schema.
"""

from __future__ import annotations

import math

import pytest

from pyanamo_spark.registry import ORACLES, QUERIES, load_all

load_all()


def _normalize(rows, cols):
    """Sort columns by name, coerce values to comparable primitives."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def conv(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            # absorb engine summation-order noise; queries additionally
            # round explicitly where magnitudes are large
            r = round(v, 9)
            if r == 0:  # normalize -0.0, mirroring the driver's hash
                r = 0.0
            return r
        if isinstance(v, int):
            return int(v)
        if isinstance(v, (list, tuple)):
            return tuple(conv(x) for x in v)
        return str(v)

    out = [tuple(conv(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for _, c in sorted(zip(cols, cols))], out


def _duck_result(duck, name):
    res = duck.execute(ORACLES[name])
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    return cols, rows


def _strict_canon_hash():
    """The driver-faithful canonicalizer from scripts/driver_sim.py
    (pandas sort_values + astype(str)): the r05 postmortem showed a
    lenient local comparator masks official reds, so parity asserts
    BOTH the readable row-wise comparison (good failure messages) and
    the exact canon the driver hashes."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "driver_sim_parity",
        Path(__file__).resolve().parent.parent / "scripts" / "driver_sim.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.canon_hash


_canon_hash = _strict_canon_hash()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    s_cols = list(df.columns)
    s_rows = [tuple(r) for r in df.collect()]
    assert len(s_cols) == len(set(s_cols)), f"{name}: duplicate column names"
    if name not in ORACLES:
        # rows-only: executable, stable schema, row count sane
        assert isinstance(s_rows, list)
        return
    d_cols, d_rows = _duck_result(duck, name)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    _, s_norm = _normalize(s_rows, s_cols)
    _, d_norm = _normalize(d_rows, d_cols)
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count spark={len(s_norm)} duck={len(d_norm)}"
    )
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert _row_eq(a, b), f"{name}: row {i} differs\n spark={a}\n duck ={b}"
    # the driver's exact hash: pandas-path dtype coercions included
    sh = _canon_hash(df.toPandas())
    dh = _canon_hash(duck.execute(ORACLES[name]).fetchdf())
    assert sh == dh, (
        f"{name}: rows compare equal but the driver canon hashes differ "
        f"({sh} != {dh}) — a pandas dtype coercion (HUGEINT/DECIMAL/date) "
        f"diverges between engines; CAST in the oracle"
    )


def _row_eq(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True
