"""HTML → text extraction (functions/html.py)."""

from pyspark.sql import functions as F

from pyanamo_spark.functions.html import html_to_text


def _extract(spark, html):
    df = spark.createDataFrame([(html,)], ["h"])
    return df.select(html_to_text(F.col("h")).alias("t")).first().t


def test_tags_stripped_and_whitespace_collapsed(spark):
    assert (
        _extract(spark, "<div><p>hello   <b>bold</b>\n\nworld</p></div>")
        == "hello bold world"
    )


def test_script_and_style_payloads_removed(spark):
    html = (
        "<style>p { color: red }</style><p>keep</p>"
        "<script>var x = '<p>not text</p>';</script><p>this</p>"
    )
    assert _extract(spark, html) == "keep this"


def test_comments_removed(spark):
    assert _extract(spark, "a<!-- no\nthing -->b") == "a b"


def test_entities_decoded_in_safe_order(spark):
    # &amp;lt; must decode to the LITERAL '&lt;' (escaped form), not '<'
    assert _extract(spark, "Q&amp;A &lt;x&gt; &amp;lt;") == 'Q&A <x> &lt;'
    assert _extract(spark, "&quot;q&quot; &#39;s&nbsp;z") == "\"q\" 's z"


def test_multiline_script_block(spark):
    html = "<script>\nline1\nline2 < 3 > 1\n</script>after"
    assert _extract(spark, html) == "after"


def test_query_covers_all_documents(spark, sf_dir):
    from pyanamo_spark.registry import QUERIES

    out = QUERIES["q_html_extract"](spark, sf_dir)
    n_docs = spark.table("documents").count()
    rows = out.collect()
    assert len(rows) == n_docs
    for r in rows[:20]:
        assert "<" not in r.clean_text.replace("<tag>", "")
        assert "alert(" not in r.clean_text  # script payload gone
        assert "color:red" not in r.clean_text  # style payload gone
        assert "  " not in r.clean_text


def test_extended_entities_decode(spark):
    """The real-corpus entity set: named punctuation/accents and the
    numeric quote forms all decode; &amp; decodes LAST so
    double-encoded text drops exactly one level per pass."""
    from pyanamo_spark.functions.html import html_to_text

    html = (
        "<p>A&ndash;B &mdash; &ldquo;q&rdquo; &rsquo;s &hellip; "
        "caf&eacute; 10&deg; 3&times;4 &copy; &#x27;x&#39; "
        "&amp;lt;kept&amp;gt;</p>"
    )
    [row] = (
        spark.range(1)
        .select(html_to_text(F.lit(html)).alias("t"))
        .collect()
    )
    assert row.t == "A–B — “q” ’s … café 10° 3×4 © 'x' &lt;kept&gt;"
