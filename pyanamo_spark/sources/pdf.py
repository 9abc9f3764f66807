"""PDF text extraction — after HTML, the second-largest text source a
pretraining corpus mines. A baseline extractor needs no library: PDF
is an object graph of dictionaries and streams (ISO 32000); page
content is a stream of operators where text arrives via ``Tj`` /
``'`` (literal or hex strings) and ``TJ`` (arrays with kerning), and
the dominant stream filter is FlateDecode — stdlib zlib.

Scope (documented, like every codec here): uncompressed and
FlateDecode content streams, literal strings with the full escape set
(``\\``, ``\\(``, ``\\)``, ``\\n``, ``\\r``, ``\\t``, ``\\b``,
``\\f``, octal, line continuations), hex strings, nested parentheses,
and the text-positioning operators (``Td``/``TD``/``T*``/``Tm``)
mapped to line breaks. Font/CMap-indirected encodings (subset fonts
that remap byte values) extract as-is — resolving them needs the font
program, which is exactly where a production pipeline swaps in a
native extractor behind the same column contract.

The extraction runs in Arrow-batched bytes-local ``mapInPandas``
stages; the registered query plants each document's text in a
Flate-compressed one-page PDF and the oracle reads the expectation
straight from the documents table — a hash match proves object
parsing, inflate, string unescaping, and operator walking reproduced
every planted byte (same oracle pattern as sources/warc.py).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

_STREAM_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)endstream", re.S
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal, up to 3 digits
            j = i + 1
            while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:  # lone backslash: dropped per spec
            i += 1
    return bytes(out)


def _iter_strings(content: bytes) -> Iterator[tuple[str, bytes]]:
    """Walk a content stream, yielding ('str', payload) for each
    literal/hex string and ('op', name) for each operator token."""
    i = 0
    n = len(content)
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                ch = content[j : j + 1]
                if ch == b"\\":
                    buf += content[j : j + 2]
                    j += 2
                    continue
                if ch == b"(":
                    depth += 1
                elif ch == b")":
                    depth -= 1
                    if depth == 0:
                        break
                buf += ch
                j += 1
            yield "str", _unescape(bytes(buf))
            i = j + 1
        elif c == b"<" and content[i + 1 : i + 2] != b"<":
            j = content.index(b">", i)
            hexs = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            yield "str", bytes.fromhex(hexs.decode("ascii"))
            i = j + 1
        elif c == b"<":  # dictionary << — skip both
            i += 2
        elif c == b"%":  # comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = re.match(rb"[A-Za-z'\"*]+", content[i:])
            if m:
                yield "op", m.group()
                i += m.end()
            else:
                i += 1


def extract_pdf_text(payload: bytes) -> str:
    """Visible text of a PDF, page-content operators walked in order;
    Td/TD/T*/Tm position changes become newlines, Tj/'/TJ append."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF: bad header")
    pieces: list[bytes] = []
    for m in _STREAM_RE.finditer(payload):
        d, body = m.group("dict"), m.group("body")
        # authoritative framing: the dict's /Length — a Flate stream's
        # own bytes can end in 0x0A, so newline-stripping heuristics
        # corrupt 1 stream in 256; heuristics only when /Length is an
        # indirect reference this baseline parser doesn't resolve
        lm = re.search(rb"/Length\s+(\d+)(?!\s+0\s+R)", d)
        if lm:
            body = body[: int(lm.group(1))]
        elif body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n"):
            body = body[:-1]
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error as e:
                raise ValueError(f"PDF: bad Flate stream: {e}") from e
        elif b"/Filter" in d:
            continue  # unsupported filter: image/font streams etc.
        pending: list[bytes] = []
        line: list[bytes] = []
        for kind, tok in _iter_strings(body):
            if kind == "str":
                pending.append(tok)
            elif tok == b"Tj":
                if pending:
                    line.append(pending[-1])
                pending = []
            elif tok in (b"'", b'"'):  # draw on the NEXT line
                if line:
                    pieces.append(b" ".join(line))
                line = [pending[-1]] if pending else []
                pending = []
            elif tok == b"TJ":
                line.append(b"".join(pending))
                pending = []
            elif tok in (b"Td", b"TD", b"T*", b"Tm"):
                if line:
                    pieces.append(b" ".join(line))
                    line = []
                pending = []
            else:
                pending = []
        if line:
            pieces.append(b" ".join(line))
    return b"\n".join(pieces).decode("utf-8", errors="replace")


# ------------------------------------------------------------ fixture


def build_pdf(text: str, compress: bool = True) -> bytes:
    """Minimal legal one-page PDF whose content stream draws ``text``
    (one Tj per line), Flate-compressed by default."""
    esc = (
        text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    )
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for ln in esc.split("\n"):
        ops.append(b"(" + ln.encode("utf-8") + b") Tj 0 -14 Td")
    ops.append(b"ET")
    content = b" ".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


@register(
    "q_pdf_extract",
    oracle="""
SELECT
  doc_id,
  text AS pdf_text
FROM documents
""",
)
def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-source ingest through the PDF stack: plant each
    document's text in a Flate-compressed one-page PDF, extract it
    back with the real parser, and return (doc_id, text). The oracle
    is the documents table itself — a hash match proves object/stream
    parsing, inflate, unescaping, and operator walking reproduced
    every planted byte.

    The explicit repartition exists because the parse is CPU-heavy
    per row while the input is few large splits: without it the
    mapInPandas stage inherits the scan's parallelism (2 partitions at
    sf1) and strands the other cores. One narrow (doc_id, text)
    shuffle costs far less than serializing the parse — the same call
    a production job makes before any compute-bound stage."""
    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.table("documents")
        .select("doc_id", "text")
        .repartition(par)
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                blob = build_pdf(str(text), compress=int(doc_id) % 4 != 3)
                rows.append(
                    {"doc_id": doc_id,
                     "pdf_text": extract_pdf_text(blob)}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "pdf_text"])

    return docs.mapInPandas(roundtrip, schema="doc_id bigint, pdf_text string")
