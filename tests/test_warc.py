"""WARC source (sources/warc.py): record framing, per-record gzip
member splitting, HTTP decode, and the Spark ingest stage."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.sources.warc import (
    _split_gzip_members,
    build_warc_gz,
    build_warc_record,
    parse_warc,
)


def _records(n=5):
    out = []
    for i in range(n):
        status = 404 if i % 3 == 2 else 200
        body = b"" if status == 404 else f"doc body {i} \xc3\xa9".encode()
        out.append(
            build_warc_record(
                f"https://example.com/{i}",
                body,
                status=status,
                content_type="text/plain",
            )
        )
    return out


def test_plain_roundtrip():
    recs = _records()
    parsed = list(parse_warc(b"".join(recs)))
    assert len(parsed) == 5
    for i, r in enumerate(parsed):
        assert r["target_uri"] == f"https://example.com/{i}"
        assert r["warc_type"] == "response"
        assert r["http_status"] == (404 if i % 3 == 2 else 200)
        if r["http_status"] == 200:
            assert r["body"] == f"doc body {i} \xc3\xa9".encode()
        else:
            assert r["body"] == b""


def test_gzip_member_roundtrip():
    recs = _records(7)
    blob = build_warc_gz(recs)
    # it really is one gzip member per record
    assert len(list(_split_gzip_members(blob))) == 7
    parsed = list(parse_warc(blob))
    assert [r["target_uri"] for r in parsed] == [
        f"https://example.com/{i}" for i in range(7)
    ]


def test_single_member_gzip_would_fuse_without_split():
    # the whole point of per-record members: stdlib decompress fuses
    recs = _records(3)
    fused = gzip.decompress(build_warc_gz(recs))
    assert fused == b"".join(recs)


def test_body_may_contain_crlf_crlf():
    # Content-Length framing must win over separator scanning
    tricky = b"line1\r\n\r\nline2\r\n\r\n"
    rec = build_warc_record("https://x/1", tricky)
    (parsed,) = parse_warc(rec)
    assert parsed["body"] == tricky
    (parsed_gz,) = parse_warc(build_warc_gz([rec]))
    assert parsed_gz["body"] == tricky


def test_bad_version_line_raises():
    with pytest.raises(ValueError, match="version"):
        list(parse_warc(b"NOTWARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))


def test_warc_records_stage(spark):
    from pyanamo_spark.sources.warc import warc_records

    blob = build_warc_gz(_records(4))
    df = spark.createDataFrame(
        [(0, bytearray(blob))], "chunk_id long, payload binary"
    )
    rows = warc_records(df).collect()
    assert len(rows) == 4
    assert {r.http_status for r in rows} == {200, 404}


def test_chain_with_html_extract(spark):
    """The advertised chain: WARC record -> html body -> clean text."""
    from pyspark.sql import functions as F

    from pyanamo_spark.functions.html import html_to_text
    from pyanamo_spark.sources.warc import warc_records

    html = b"<html><body><p>hello &amp; goodbye</p></body></html>"
    rec = build_warc_record(
        "https://x/9", html, content_type="text/html"
    )
    df = spark.createDataFrame(
        [(0, bytearray(build_warc_gz([rec])))],
        "chunk_id long, payload binary",
    )
    out = (
        warc_records(df)
        .select(html_to_text(F.decode("body", "utf-8")).alias("t"))
        .first()
    )
    assert out.t == "hello & goodbye"


def test_chunked_transfer_encoding_roundtrip():
    """Transfer-Encoding: chunked bodies (the wire form most real
    crawl responses arrive in) reassemble exactly — multi-chunk, with
    uneven sizes, empty body, and gzip-member packaging."""
    from pyanamo_spark.sources.warc import (
        build_warc_gz,
        build_warc_record,
        parse_warc,
    )

    bodies = [b"", b"x", b"hello chunked world " * 40]
    recs = [
        build_warc_record(f"https://fixture/{i}", b, chunked=True)
        for i, b in enumerate(bodies)
    ]
    # plain concatenation AND the gzip-member layout
    for payload in (b"".join(recs), build_warc_gz(recs)):
        got = [r["body"] for r in parse_warc(payload)]
        assert got == bodies
    # the chunked wire form really is chunked (body not stored verbatim
    # in one run when it spans chunks)
    assert b"hello chunked world " * 40 not in recs[2]


def test_chunk_extensions_are_ignored():
    """RFC 9112: a chunk size may carry ;extensions — skip them."""
    from pyanamo_spark.sources.warc import _dechunk

    wire = b"5;ext=1\r\nhello\r\n1\r\n!\r\n0\r\n\r\ntrailer: x\r\n\r\n"
    assert _dechunk(wire) == b"hello!"


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400))
def test_property_chunked_roundtrip_any_body(body):
    """Any byte body survives chunked encode → WARC wrap → parse."""
    from pyanamo_spark.sources.warc import build_warc_record, parse_warc

    rec = build_warc_record("https://fixture/p", body, chunked=True)
    [out] = list(parse_warc(rec))
    assert out["body"] == body
