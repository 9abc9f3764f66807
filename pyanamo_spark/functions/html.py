"""HTML → text extraction — the step between a raw web crawl and
every text operator in this engine: strip script/style payloads,
drop markup, decode the common entities, collapse whitespace. Done
as a pure column-expression pipeline (regexp_replace + replace), so
at 100 TB it fuses into the scan under whole-stage codegen — no UDF,
no shuffle, linear in payload bytes exactly like a native extractor.

Cross-engine notes (the oracle runs the same pipeline in DuckDB):
Java regex (Spark) replaces globally by default, RE2 (DuckDB) needs
the 'g' flag; whitespace classes differ between the engines
(Java ``\\s`` includes vertical tab), so the collapse step uses an
explicit ``[ \\t\\n\\r]`` class; both engines support ``(?s)`` dotall
and lazy ``.*?`` for the block-element removal.

Entity decode order matters: ``&lt;``/``&gt;``/``&quot;``/``&#39;``
before ``&amp;``, so ``&amp;lt;`` correctly yields ``&lt;`` (the
escaped form) rather than double-decoding to ``<``.

Reference parity: the reference ingests plain files only
(import_from_file, manager.py:118-170); this extends the X4 text
family per SURVEY.md §2.10.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: (entity, char) in decode order — &amp; must come last so that
#: double-encoded text ("&amp;lt;") decodes one level per pass, like
#: every standards-following extractor. The set covers the named and
#: numeric forms that dominate real crawl corpora; each entry is one
#: codegen'd JVM replace, so breadth here is nearly free.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&#x27;", "'"),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&ndash;", "–"),
    ("&mdash;", "—"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&hellip;", "…"),
    ("&bull;", "•"),
    ("&middot;", "·"),
    ("&laquo;", "«"),
    ("&raquo;", "»"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&deg;", "°"),
    ("&times;", "×"),
    ("&eacute;", "é"),
    ("&egrave;", "è"),
    ("&agrave;", "à"),
    ("&uuml;", "ü"),
    ("&ouml;", "ö"),
    ("&auml;", "ä"),
    ("&ccedil;", "ç"),
    ("&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML column, as a pure expression."""
    t = F.regexp_replace(html, r"(?s)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?s)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"[ \t\n\r]+", " "))


def _messy_html() -> Column:
    """Deterministic HTML wrapping of each document's text (mirrored
    in the oracle): head noise, style/script payloads that must NOT
    leak into the text, nested attributed tags, comments, and
    entity-encoded punctuation."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("<html><head><title>Doc "),
        d.cast("string"),
        F.lit("</title><style>p{color:red}\n.c{margin:0}</style></head>"),
        F.lit("<body>"),
        F.when(
            d % 3 == 0,
            F.lit("<script>var x = 1 < 2 && 3 > 0;\nalert('hi')</script>"),
        ).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("<!-- hidden\ncomment -->")).otherwise(
            F.lit("")
        ),
        F.lit('<div class="c'),
        (d % 4).cast("string"),
        F.lit('"><h1>Doc '),
        d.cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p></div>"),
        F.when(
            d % 2 == 0,
            F.lit("<p>Q&amp;A &lt;tag&gt; &quot;quoted&quot; &#39;s&nbsp;end</p>"),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )


_ORACLE = r"""
WITH pages AS (
  SELECT
    doc_id,
    '<html><head><title>Doc ' || CAST(doc_id AS STRING)
    || '</title><style>p{color:red}' || chr(10)
    || '.c{margin:0}</style></head><body>'
    || (CASE WHEN doc_id % 3 = 0
             THEN '<script>var x = 1 < 2 && 3 > 0;' || chr(10)
                  || 'alert(''hi'')</script>'
             ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
             THEN '<!-- hidden' || chr(10) || 'comment -->' ELSE '' END)
    || '<div class="c' || CAST(doc_id % 4 AS STRING) || '"><h1>Doc '
    || CAST(doc_id AS STRING) || '</h1><p>' || text || '</p></div>'
    || (CASE WHEN doc_id % 2 = 0
             THEN '<p>Q&amp;A &lt;tag&gt; &quot;quoted&quot; '
                  || '&#39;s&nbsp;end</p>'
             ELSE '' END)
    || '</body></html>' AS html
  FROM documents
),
stripped AS (
  SELECT
    doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, '(?s)<script\b.*?</script>', ' ', 'g'),
          '(?s)<style\b.*?</style>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
      '<[^>]+>', ' ', 'g') AS t
  FROM pages
)
SELECT
  doc_id,
  trim(regexp_replace(
    replace(replace(replace(replace(replace(replace(
      t, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      '&nbsp;', ' '), '&amp;', '&'),
    '[ ' || chr(9) || chr(10) || chr(13) || ']+', ' ', 'g')) AS clean_text
FROM stripped
"""


@register("q_html_extract", oracle=_ORACLE)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-ingest text extraction: wrap each document in deterministic
    messy HTML (script/style payloads, comments, nested tags,
    entities), then recover the visible text with
    :func:`html_to_text`. Codegen'd expressions end to end.

    The repartition exists for the same reason as q_pdf_extract's
    (sources/pdf.py): the regex cascade is CPU-heavy per row while the
    fixture corpus is a few large parquet splits, so the expression
    stage otherwise inherits the scan's 2-split parallelism and
    strands the other cores (sf1 ratio 6.6× before, scan-bound). One
    narrow (doc_id, text) shuffle beats serializing the regex work."""
    from pyanamo_spark.session import spread

    docs = spread(spark.table("documents"), "doc_id", "text")
    return docs.select(
        "doc_id", html_to_text(_messy_html()).alias("clean_text")
    )
