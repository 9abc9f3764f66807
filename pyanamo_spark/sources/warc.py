"""WARC source — the container a 100 TB pretraining crawl actually
arrives in (Common Crawl ships WARC/1.0 records, one gzip member per
record, ISO 28500). This closes the web-ingest chain:

    warc.gz bytes → records (this module) → ``html_to_text``
    (functions/html.py) → every text/dedup operator in the engine.

``parse_warc`` is a real parser: per-record gzip members (multi-member
streams split with stdlib zlib so each record decompresses
independently — exactly why Common Crawl gzips per record: byte-range
fetches), WARC header block (version line + named headers +
Content-Length framing + CRLF CRLF terminators), and the embedded
HTTP response (status line, headers, body). No external library.

Scale design: chunks of WARC bytes ride a binary column; parsing is
an Arrow-batched ``mapInPandas`` stage (bytes-local, zero shuffle),
mirroring how a production job maps whole .warc.gz objects per task.
The registered query plants per-record values derived from doc_id —
status, content length, URI — and the DuckDB oracle recomputes them
straight from the documents table, so the driver hash-checks that the
parser reproduced every planted value through the full
gzip → WARC → HTTP decode stack.

Reference parity: the reference ingests via import_from_file
(manager.py:118-170); this is the S-family source the north star
(SURVEY.md §2.10) directs for web-scale corpora.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

_CRLF = b"\r\n"

RECORD_SCHEMA = (
    "target_uri string, warc_type string, http_status int, "
    "content_type string, body binary"
)


def build_warc_record(
    uri: str,
    body: bytes,
    status: int = 200,
    content_type: str = "text/plain",
    warc_type: str = "response",
    chunked: bool = False,
) -> bytes:
    """One WARC/1.0 record wrapping an HTTP response (fixture writer).

    ``chunked=True`` writes the body with ``Transfer-Encoding:
    chunked`` (split into uneven chunks so multi-chunk reassembly is
    actually exercised) — the wire form most real crawl responses
    arrive in."""
    if chunked:
        wire = bytearray()
        pos, step = 0, 7
        while pos < len(body):
            piece = body[pos : pos + step]
            wire += f"{len(piece):x}\r\n".encode() + piece + b"\r\n"
            pos += len(piece)
            step = step * 3 + 1  # uneven chunk sizes: 7, 22, 67, ...
        wire += b"0\r\n\r\n"
        http = (
            f"HTTP/1.1 {status} X\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Transfer-Encoding: chunked\r\n\r\n"
        ).encode() + bytes(wire)
    else:
        http = (
            f"HTTP/1.1 {status} X\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: <urn:fixture:{uri}>\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return headers + http + _CRLF + _CRLF


def build_warc_gz(records: list[bytes]) -> bytes:
    """Concatenated per-record gzip members (the Common Crawl layout)."""
    return b"".join(gzip.compress(r) for r in records)


def _split_gzip_members(payload: bytes) -> Iterator[bytes]:
    """Split a multi-member gzip stream into decompressed members.

    stdlib ``gzip.decompress`` would fuse members; per-record access
    needs the boundaries, which zlib exposes via ``unused_data``."""
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        out = d.decompress(payload[pos:])
        yield out
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("WARC: stalled gzip member split")
        pos += consumed


def parse_warc(payload: bytes) -> Iterator[dict]:
    """WARC(.gz) bytes → dicts of (target_uri, warc_type, http_status,
    content_type, body)."""
    if payload[:2] == b"\x1f\x8b":
        records = _split_gzip_members(payload)
    else:
        records = _split_plain(payload)
    for raw in records:
        if not raw.strip():
            continue
        head_end = raw.index(_CRLF + _CRLF)
        head_lines = raw[:head_end].split(_CRLF)
        if not head_lines[0].startswith(b"WARC/"):
            raise ValueError("WARC: bad record version line")
        headers = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers[b"content-length"])
        block = raw[head_end + 4 : head_end + 4 + length]
        rec = {
            "target_uri": headers.get(b"warc-target-uri", b"").decode(),
            "warc_type": headers.get(b"warc-type", b"").decode(),
            "http_status": None,
            "content_type": "",
            "body": block,
        }
        if headers.get(b"content-type", b"").startswith(
            b"application/http"
        ):
            http_end = block.index(_CRLF + _CRLF)
            status_line = block[: block.index(_CRLF)].split(b" ")
            rec["http_status"] = int(status_line[1])
            chunked = False
            for line in block[:http_end].split(_CRLF)[1:]:
                k, _, v = line.partition(b":")
                lk = k.strip().lower()
                if lk == b"content-type":
                    rec["content_type"] = v.strip().decode()
                elif lk == b"transfer-encoding":
                    chunked = b"chunked" in v.strip().lower()
            raw_body = block[http_end + 4 :]
            rec["body"] = _dechunk(raw_body) if chunked else raw_body
        yield rec


def _dechunk(wire: bytes) -> bytes:
    """Reassemble an HTTP/1.1 chunked body: ``<hex-size>[;ext]CRLF
    <data>CRLF`` repeated until the 0-size terminator — most real
    crawl responses arrive in this wire form. Trailers after the
    terminator are discarded per RFC 9112 §7.1."""
    out = bytearray()
    pos = 0
    while True:
        nl = wire.index(_CRLF, pos)
        size = int(wire[pos:nl].split(b";")[0], 16)
        if size == 0:
            return bytes(out)
        start = nl + 2
        out += wire[start : start + size]
        pos = start + size + 2  # skip the chunk's trailing CRLF


def _split_plain(payload: bytes) -> Iterator[bytes]:
    """Split uncompressed concatenated records on their framing: each
    record declares its block via Content-Length, then CRLF CRLF."""
    pos = 0
    while pos < len(payload):
        head_end = payload.index(_CRLF + _CRLF, pos)
        head = payload[pos:head_end]
        length = None
        for line in head.split(_CRLF):
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                length = int(v)
        if length is None:
            raise ValueError("WARC: record without Content-Length")
        end = head_end + 4 + length + 4  # block + trailing CRLF CRLF
        yield payload[pos:end]
        pos = end


def warc_records(chunks: DataFrame) -> DataFrame:
    """(chunk_id, payload binary) → one row per WARC record, parsed in
    Arrow-batched bytes-local stages."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "target_uri", "warc_type", "http_status", "content_type",
            "body",
        ]
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                if payload is None:
                    continue
                rows.extend(parse_warc(bytes(payload)))
            yield pd.DataFrame(rows, columns=cols)

    return chunks.mapInPandas(gen, schema=RECORD_SCHEMA)


@register(
    "q_warc_ingest",
    oracle="""
SELECT
  doc_id,
  CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS http_status,
  CASE WHEN doc_id % 17 = 0
       THEN CAST(0 AS BIGINT)
       ELSE CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)
  END AS body_bytes,
  CASE WHEN doc_id % 17 = 0 THEN 'text/html' ELSE 'text/plain' END
    AS content_type
FROM documents
""",
)
def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl-container ingest: pack each document into a
    WARC/1.0 response record (404s carry empty bodies), gzip one
    member per record into 16-record chunk objects, then parse the
    chunks back with the real parser and emit per-record facts the
    oracle recomputes directly from the documents table. A hash match
    proves the gzip-member split, WARC framing, and HTTP decode all
    reproduced the planted values."""
    docs = spark.table("documents").select(
        "doc_id",
        F.col("text"),
        F.floor(F.col("doc_id") / 16).alias("chunk_id"),
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for chunk_id, grp in pdf.groupby("chunk_id"):
                recs = []
                for doc_id, text in zip(grp["doc_id"], grp["text"]):
                    i = int(doc_id)
                    status = 404 if i % 17 == 0 else 200
                    body = b"" if status == 404 else str(text).encode()
                    ctype = "text/html" if status == 404 else "text/plain"
                    recs.append(
                        build_warc_record(
                            f"https://fixture/{i}",
                            body,
                            status=status,
                            content_type=ctype,
                            # every 5th doc ships chunked: the oracle
                            # recomputes body_bytes from the text, so
                            # the hash match proves dechunking too
                            chunked=i % 5 == 1,
                        )
                    )
                out.append(
                    {"chunk_id": int(chunk_id),
                     "payload": build_warc_gz(recs)}
                )
            yield pd.DataFrame(out, columns=["chunk_id", "payload"])

    chunks = docs.repartition("chunk_id").mapInPandas(
        pack, schema="chunk_id bigint, payload binary"
    )
    recs = warc_records(chunks)
    return recs.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("http_status").cast("int").alias("http_status"),
        F.octet_length("body").cast("long").alias("body_bytes"),
        "content_type",
    )
