"""URL canonicalization dedup (dedup/urls.py)."""

from pyspark.sql import functions as F

from pyanamo_spark.dedup.urls import canonical_url


def test_canonicalization_rules(spark):
    variants = [
        # one resource under every kind of mess -> one canonical form
        "http://WWW.Example.COM/p/7?utm_source=feed&id=3",
        "https://example.com:443/p/7/?id=3",
        "https://www.example.com/p/7?id=3&utm_campaign=x#frag",
        # different id -> different canonical form
        "https://example.com/p/7?id=4",
        # no id param at all -> bare canonical
        "http://Example.com/p/7#sec",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    got = [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got[0] == got[1] == got[2] == "https://example.com/p/7?id=3"
    assert got[3] == "https://example.com/p/7?id=4"
    assert got[4] == "https://example.com/p/7"


def test_dedup_url_counts(spark, sf_dir):
    from pyanamo_spark.registry import QUERIES

    rows = QUERIES["q_dedup_url"](spark, sf_dir).collect()
    assert rows, "no canonical families"
    total = sum(r.n_variants for r in rows)
    docs = spark.table("documents").count()
    assert total == docs  # every document lands in exactly one family
    assert any(r.n_variants > 1 for r in rows)  # dedup finds collapses
    for r in rows:
        assert r.canon_url.startswith("https://")
        assert "utm" not in r.canon_url and "#" not in r.canon_url
        assert ":443" not in r.canon_url and "www." not in r.canon_url
