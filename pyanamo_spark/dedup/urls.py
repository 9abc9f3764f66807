"""URL canonicalization dedup — the cheapest, highest-yield dedup
pass a web-crawl corpus gets, run BEFORE any content hashing: the
same resource arrives under http/https, case-varied hosts, a
``www.`` prefix, an explicit default port, trailing slashes,
tracking parameters (utm_*, fbclid, …) and fragments. Canonicalizing
first collapses those families for free and shrinks every downstream
content-dedup join.

``canonical_url`` is the reusable operator: a pure column expression
(regexp extract/replace + lower), so at 100 TB it rides the scan
inside whole-stage codegen — the only shuffle in ``q_dedup_url`` is
the digest-sized groupBy on the canonical key, and no document text
moves at all.

Canonicalization policy (documented, deliberately aggressive the way
crawl dedup is): scheme folded to https, host lowercased, leading
``www.`` and explicit ``:443`` stripped, trailing slash stripped,
fragment dropped, and the query reduced to its load-bearing
parameters (here ``id``) with tracking params discarded.

Reference parity: the reference has no web stage (items arrive via
import_from_file, manager.py:118-170); this extends the X1 dedup
family per SURVEY.md §2.10.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


def canonical_url(url: Column) -> Column:
    """Canonical form of a messy URL, as a pure column expression."""
    host = F.lower(F.regexp_extract(url, r"^https?://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":443$", "")
    path = F.regexp_extract(url, r"^https?://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    idv = F.regexp_extract(url, r"[?&]id=([0-9]+)", 1)
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(idv != "", F.concat(F.lit("?id="), idv)).otherwise(F.lit("")),
    )


def _messy_url() -> Column:
    """Deterministic messy URL per document (mirrored in the oracle):
    scheme, host case, www., :443, trailing slash, tracking params and
    fragments all vary with doc_id so every canonicalization rule has
    work to do."""
    d = F.col("doc_id")
    page = F.floor(d / 4).cast("long")
    site = (page % 40).cast("string")  # page-derived: the four docs of
    # a block hit the same site+page under different mess -> families
    idv = (page % 9).cast("string")
    return F.concat(
        F.when(d % 3 == 0, F.lit("http://")).otherwise(F.lit("https://")),
        F.when(d % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit("Site"), site, F.lit(".COM")))
        .otherwise(F.concat(F.lit("site"), site, F.lit(".com"))),
        F.when(d % 7 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"),
        page.cast("string"),
        F.when(d % 6 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.concat(F.lit("?id="), idv))
        .when(d % 4 == 1, F.concat(F.lit("?utm_source=feed&id="), idv))
        .when(d % 4 == 2, F.concat(F.lit("?id="), idv, F.lit("&utm_campaign=x")))
        .otherwise(F.lit("")),
        F.when(d % 8 == 3, F.lit("#sec")).otherwise(F.lit("")),
    )


_ORACLE = """
WITH urls AS (
  SELECT
    doc_id,
    (CASE WHEN doc_id % 3 = 0 THEN 'http://' ELSE 'https://' END)
    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
             THEN 'Site' || CAST(CAST(FLOOR(doc_id / 4) AS BIGINT) % 40 AS STRING) || '.COM'
             ELSE 'site' || CAST(CAST(FLOOR(doc_id / 4) AS BIGINT) % 40 AS STRING) || '.com' END)
    || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
    || '/p/' || CAST(CAST(FLOOR(doc_id / 4) AS BIGINT) AS STRING)
    || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
    || (CASE
          WHEN doc_id % 4 = 0 THEN
            '?id=' || CAST(CAST(FLOOR(doc_id / 4) AS BIGINT) % 9 AS STRING)
          WHEN doc_id % 4 = 1 THEN
            '?utm_source=feed&id='
            || CAST(CAST(FLOOR(doc_id / 4) AS BIGINT) % 9 AS STRING)
          WHEN doc_id % 4 = 2 THEN
            '?id=' || CAST(CAST(FLOOR(doc_id / 4) AS BIGINT) % 9 AS STRING)
            || '&utm_campaign=x'
          ELSE '' END)
    || (CASE WHEN doc_id % 8 = 3 THEN '#sec' ELSE '' END) AS url
  FROM documents
),
canon AS (
  SELECT
    doc_id,
    'https://'
    || regexp_replace(
         regexp_replace(
           lower(regexp_extract(url, '^https?://([^/?#]+)', 1)),
           '^www\\.', ''),
         ':443$', '')
    || regexp_replace(
         regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1), '/$', '')
    || (CASE WHEN regexp_extract(url, '[?&]id=([0-9]+)', 1) <> ''
             THEN '?id=' || regexp_extract(url, '[?&]id=([0-9]+)', 1)
             ELSE '' END) AS canon_url
  FROM urls
)
SELECT
  canon_url,
  COUNT(*) AS n_variants,
  CAST(MIN(doc_id) AS BIGINT) AS keeper_id
FROM canon
GROUP BY canon_url
"""


@register("q_dedup_url", oracle=_ORACLE)
def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-family dedup: synthesize each document's messy URL,
    canonicalize with :func:`canonical_url`, group by the canonical
    key, keep the lowest doc_id per family. Both synthesis and
    canonicalization are codegen'd expressions — the plan is one scan
    plus one canonical-key aggregate."""
    docs = spark.table("documents").select("doc_id")
    canon = docs.select(
        "doc_id", canonical_url(_messy_url()).alias("canon_url")
    )
    return canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.min("doc_id").alias("keeper_id"),
    )
