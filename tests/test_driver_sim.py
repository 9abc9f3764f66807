"""Fidelity pins for scripts/driver_sim.py's canonicalizer.

Round-5 postmortem: the sim's old hand-rolled hash used ``fetchall()``
+ ``str()`` — Python-int-exact and list-tolerant — while the driver
canonicalizes through pandas (``toPandas()`` / ``fetchdf()``,
``sort_values``, ``astype(str)``). Two officially-red seats were green
locally. These tests pin the sim to the driver's coercion behavior so
local green implies official green:

1. DuckDB HUGEINT (unCASTed SUM over BIGINT) coerces to float64 in
   pandas and must HASH-DIFFER from Spark's int64.
2. list/array cells must RAISE (the driver's ``sort_values`` canon
   crashes on them; tolerating them locally masks an official red).
3. all-midnight datetime64 (DuckDB DATE via fetchdf) must hash EQUAL
   to object datetime.date (Spark DateType via toPandas) — the reason
   date-valued green queries stay green.

No Spark session needed: the canon operates on pandas frames.
"""

from __future__ import annotations

import datetime

import importlib.util
from pathlib import Path

import duckdb
import pandas as pd
import pytest

_spec = importlib.util.spec_from_file_location(
    "driver_sim", Path(__file__).resolve().parent.parent / "scripts" / "driver_sim.py"
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
canon_hash = _mod.canon_hash


def test_hugeint_sum_diverges_from_bigint():
    duck = duckdb.connect()
    # SUM over BIGINT -> HUGEINT -> fetchdf float64 ("60158.0")
    hug = duck.execute(
        "SELECT SUM(x) AS s FROM (VALUES (CAST(60000 AS BIGINT)), (158)) t(x)"
    ).fetchdf()
    assert str(hug["s"].dtype) == "float64", "fetchdf no longer coerces HUGEINT"
    spark_like = pd.DataFrame({"s": pd.array([60158], dtype="int64")})
    assert canon_hash(hug) != canon_hash(spark_like)
    # the documented fix restores agreement
    cast = duck.execute(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (CAST(60000 AS BIGINT)), (158)) t(x)"
    ).fetchdf()
    assert canon_hash(cast) == canon_hash(spark_like)


def test_array_cells_raise_like_the_driver():
    pdf = pd.DataFrame({"k": [1, 2], "seq": [["a", "b"], ["c"]]})
    with pytest.raises(TypeError):
        canon_hash(pdf)


def test_date_objects_equal_midnight_datetime64():
    duck_side = pd.DataFrame(
        {"d": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype("datetime64[us]")}
    )
    spark_side = pd.DataFrame(
        {"d": [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]}
    )
    assert canon_hash(duck_side) == canon_hash(spark_side)


def test_hash_is_column_order_and_row_order_insensitive():
    a = pd.DataFrame({"x": [2, 1], "y": ["b", "a"]})
    b = pd.DataFrame({"y": ["a", "b"], "x": [1, 2]})
    assert canon_hash(a) == canon_hash(b)


def test_value_difference_changes_hash():
    a = pd.DataFrame({"x": [1.25]})
    b = pd.DataFrame({"x": [1.26]})
    assert canon_hash(a) != canon_hash(b)
