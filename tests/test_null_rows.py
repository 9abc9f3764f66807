"""Null-row contract: rows with null text / embedding / lang must not
crash any query — Python stage boundaries drop them, expression paths
null-propagate. (The guards this pins were added after a poisoned
sweep crashed simhash, embedding-block, and IVF-assignment UDFs.)"""

from __future__ import annotations

import pytest

from pyanamo_spark.catalog import TABLES
from pyanamo_spark.registry import QUERIES, load_all

load_all()


@pytest.fixture(scope="module")
def nullish_sf(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("nullish_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "documents":
            long_doc = " ".join(f"w{i}" for i in range(10_000))
            poison = spark.createDataFrame(
                [
                    (90001, None, None, "srcX", 0),
                    (90002, "", "en", None, 0),
                    (90003, "汉字 émojis 🚀 mixed with ascii", "zh", "srcX", 28),
                    (90004, long_doc, "en", "srcY", len(long_doc)),
                ],
                df.schema,
            )
            df = df.limit(20).unionByName(poison)
        elif t == "embeddings":
            poison = spark.createDataFrame([(90001, None, None)], df.schema)
            df = df.limit(20).unionByName(poison)
        df.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_every_query_survives_null_rows(spark, nullish_sf):
    failures = []
    for name, fn in QUERIES.items():
        try:
            fn(spark, nullish_sf).limit(5).collect()
        except ValueError:
            pass  # model-fit queries may reject degenerate input loudly
        except Exception as e:  # noqa: BLE001 — the contract being tested
            failures.append((name, type(e).__name__))
    assert not failures, failures
