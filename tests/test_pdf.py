"""PDF text extraction (sources/pdf.py): string escapes, hex strings,
TJ arrays, positioning operators, Flate framing edge cases."""

from __future__ import annotations

import re
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.sources.pdf import (
    _unescape,
    build_pdf,
    extract_pdf_text,
)


def _with_content(content: bytes) -> bytes:
    """A legal PDF whose page content stream is exactly ``content``."""
    raw = build_pdf("PLACEHOLDER", compress=False)
    out = re.sub(
        rb"stream\n.*?\nendstream",
        b"stream\n" + content + b"\nendstream",
        raw,
        flags=re.S,
    )
    # keep /Length honest for the replaced stream
    return re.sub(
        rb"/Length \d+", b"/Length " + str(len(content)).encode(), out
    )


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "line one\nline two\nline three",
        "escape (parens) and \\ backslash",
        "unicode é café",
    ],
)
def test_build_extract_roundtrip(compress, text):
    assert extract_pdf_text(build_pdf(text, compress=compress)) == text


def test_flate_stream_ending_in_newline_byte():
    """A compressed body whose last byte is 0x0A must not be truncated
    by end-of-stream newline heuristics — /Length framing wins."""
    hits = 0
    for seed in range(3000):
        text = (
            f"document {seed} " + chr(97 + seed % 26) * (seed % 23)
        )
        if zlib.compress(
            b" ".join(
                [b"BT /F1 12 Tf 72 720 Td"]
                + [b"(" + text.encode() + b") Tj 0 -14 Td", b"ET"]
            )
        ).endswith(b"\n"):
            assert extract_pdf_text(build_pdf(text)) == text
            hits += 1
            if hits >= 3:
                return
    assert hits > 0, "no seed produced a 0x0A-terminated flate stream"


def test_hex_strings_tj_arrays_and_quote_ops():
    content = (
        b"BT (first) Tj 0 -14 Td [(a) -120 (b)] TJ (next) ' "
        b"<68656c6c6f> Tj ET"
    )
    assert extract_pdf_text(_with_content(content)) == "first\nab\nnext hello"


def test_nested_parens_and_octal():
    content = b"BT (nest (inner) done \\101\\102) Tj ET"
    assert extract_pdf_text(_with_content(content)) == "nest (inner) done AB"


def test_line_continuation_and_controls():
    content = b"BT (split\\\nword tab\\there) Tj ET"
    assert extract_pdf_text(_with_content(content)) == "splitword tab\there"


def test_comments_and_dicts_skipped():
    content = b"BT % a comment (not text)\n(real) Tj << /Ignored (x) >> ET"
    out = extract_pdf_text(_with_content(content))
    assert out == "real"


def test_unsupported_filter_streams_skipped():
    # an image stream with /DCTDecode must not break text extraction
    raw = build_pdf("kept text", compress=False)
    img = b"6 0 obj\n<< /Filter /DCTDecode /Length 4 >>\nstream\n\xff\xd8\xff\xd9\nendstream\nendobj\n"
    patched = raw.replace(b"xref\n", img + b"xref\n", 1)
    assert extract_pdf_text(patched) == "kept text"


def test_bad_header_raises():
    with pytest.raises(ValueError, match="header"):
        extract_pdf_text(b"NOPE")


@settings(max_examples=60, deadline=None)
@given(st.text(st.characters(codec="ascii", min_codepoint=32), max_size=80))
def test_property_roundtrip_printable(text):
    assert extract_pdf_text(build_pdf(text)) == text


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=60))
def test_unescape_inverts_builder_escape(raw):
    esc = (
        raw.replace(b"\\", rb"\\")
        .replace(b"(", rb"\(")
        .replace(b")", rb"\)")
    )
    assert _unescape(esc) == raw
