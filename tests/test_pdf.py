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


def test_indirect_length_multidigit_falls_back_to_heuristic():
    """``/Length 92 0 R`` must not backtrack to a prefix match ("9"):
    the indirect reference is unresolvable here, so framing falls back
    to the end-of-stream newline heuristic and the text survives."""
    text = "indirect length document body"
    raw = build_pdf(text, compress=False)
    patched = re.sub(rb"/Length \d+", b"/Length 92 0 R", raw)
    assert extract_pdf_text(patched) == text


def test_generation_one_indirect_length_not_misframed():
    """``/Length 92 1 R`` (generation 1) is exactly as indirect as
    generation 0: the direct-length branch must not accept "92" and
    truncate the body to 92 bytes (ADVICE r07). Unresolvable here, so
    framing falls back to the newline heuristic and the text
    survives."""
    text = "a generation-one indirect length reference document body " * 3
    raw = build_pdf(text.strip(), compress=False)
    patched = re.sub(rb"/Length \d+", b"/Length 92 1 R", raw)
    assert extract_pdf_text(patched) == text.strip()


def test_indirect_length_any_generation_resolves_via_object_graph():
    """``/Length 5 2 R`` resolves through the object graph just like
    the generation-0 form."""
    from pyanamo_spark.sources.pdf import _assemble

    content = b"BT /F1 12 Tf 72 720 Td (gen two framing) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length 5 2 R >>\nstream\n" + content + b"\nendstream",
        str(len(content)).encode(),
    ]
    assert extract_pdf_text(_assemble(objs)) == "gen two framing"


def test_cmap_run_near_bmp_ceiling_stays_four_hex_digits():
    """16+ codepoint-consecutive chars starting near 0xFFF0 must not
    emit a bfrange whose incremented destination exceeds 0xFFFF (a
    5-hex-digit dst crashes bytes.fromhex in the decoder — ADVICE
    r07); the builder bounds runs to one 256-codepoint block, so the
    roundtrip survives."""
    from pyanamo_spark.sources.pdf import build_pdf_cmap

    text = "".join(chr(c) for c in range(0xFFE8, 0xFFEE)) + "".join(
        chr(c) for c in range(0xFF00, 0xFF20)
    )
    assert extract_pdf_text(build_pdf_cmap(text)) == text


def test_nonzero_generation_references_resolve_everywhere():
    """Every indirect-reference site (/Contents, /Resources, /Font,
    /ToUnicode, /Length) accepts any generation number — rewriting all
    ``N 0 R`` references to generation 3 must not change extraction
    (the reader keys objects by number; a gen-0-only regex silently
    drops the CMap walk and garbles Type0 text)."""
    from pyanamo_spark.sources.pdf import build_pdf_cmap

    text = "generation three references everywhere"
    blob = build_pdf_cmap(text, compress=False).replace(b" 0 R", b" 3 R")
    assert extract_pdf_text(blob) == text


def test_cmap_run_never_crosses_a_low_byte_block():
    """Per the CMap spec only the last byte of a range destination
    increments: a consecutive run crossing a 256-codepoint boundary
    (U+00F8..U+0107) must split into per-block ranges and still
    roundtrip."""
    from pyanamo_spark.sources.pdf import build_pdf_cmap

    text = "".join(chr(c) for c in range(0x00F8, 0x0108))
    blob = build_pdf_cmap(text, compress=False)
    assert extract_pdf_text(blob) == text
    # no emitted bfrange spans the 0x0100 block boundary in its dst:
    # every <lo> <hi> <dst> line keeps dst+span-1 within dst's block
    import re as _re

    for lo, hi, dst in _re.findall(
        rb"<([0-9A-F]{4})> <([0-9A-F]{4})> <([0-9A-F]{4})>", blob
    ):
        span = int(hi, 16) - int(lo, 16)
        d = int(dst, 16)
        assert (d + span) >> 8 == d >> 8, (lo, hi, dst)


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


# ------------------------------------------------------- CMap decoding


def test_cmap_roundtrip_basic():
    from pyanamo_spark.sources.pdf import build_pdf_cmap

    for text in [
        "hello cmap world",
        "line one\nline two",
        "unicode é café naïve",
        "abcdefg runs xyz 0123456789",
    ]:
        for compress in (True, False):
            assert (
                extract_pdf_text(build_pdf_cmap(text, compress=compress))
                == text
            )


def test_cmap_codes_are_not_the_text():
    """The content stream of a CMap PDF must not contain the plaintext
    — proving extraction really went through the ToUnicode walk."""
    import zlib

    from pyanamo_spark.sources.pdf import build_pdf_cmap

    text = "secret plaintext sentence"
    blob = build_pdf_cmap(text, compress=False)
    assert text.encode() not in blob
    assert extract_pdf_text(blob) == text
    # compressed variant: inflate every stream, still no plaintext
    blob_z = build_pdf_cmap(text, compress=True)
    assert text.encode() not in zlib.decompressobj().decompress(
        blob_z.split(b"stream\n", 1)[1]
    )


def test_cmap_bfrange_array_form_and_one_byte_codes():
    """A hand-built simple font with a 1-byte ToUnicode CMap using the
    array destination form ``<lo> <hi> [<d0> <d1> ...]``."""
    from pyanamo_spark.sources.pdf import _assemble

    cmap = (
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfrange <41> <43> [<0058> <0059> <005A>] endbfrange\n"
        b"1 beginbfchar <20> <0020> endbfchar\n"
    )
    content = b"BT /F1 12 Tf 72 720 Td (ABC CBA) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /FAKEBB+Map "
        b"/ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream",
    ]
    # A=0x41→X, B→Y, C→Z via the array range; space via bfchar
    assert extract_pdf_text(_assemble(objs)) == "XYZ ZYX"


def test_indirect_stream_length_resolves_via_object_graph():
    """``/Length 6 0 R`` pointing at a bare-integer object resolves
    exactly (the pre-r07 parser could only fall back to heuristics)."""
    from pyanamo_spark.sources.pdf import _assemble

    content = b"BT /F1 12 Tf 72 720 Td (exact framing) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length 5 0 R >>\nstream\n" + content + b"\nendstream",
        str(len(content)).encode(),
    ]
    assert extract_pdf_text(_assemble(objs)) == "exact framing"


def test_font_without_tounicode_passes_bytes_through():
    """A font carrying no /ToUnicode keeps the baseline behavior:
    string bytes extract as-is."""
    assert extract_pdf_text(build_pdf("plain bytes")) == "plain bytes"


@settings(max_examples=40, deadline=None)
@given(st.text(st.characters(codec="utf-8", min_codepoint=32), max_size=60))
def test_property_cmap_roundtrip(text):
    from pyanamo_spark.sources.pdf import build_pdf_cmap

    assert extract_pdf_text(build_pdf_cmap(text)) == text


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0x20, max_value=0xFFDF),
    st.integers(min_value=2, max_value=32),
)
def test_property_cmap_consecutive_runs(start, length):
    """Codepoint-consecutive runs anywhere in the BMP — including runs
    that straddle a 256-codepoint block boundary or press against
    0xFFFF — must roundtrip through the bounded bfrange builder
    (random text rarely generates long consecutive runs, so this
    drives the range path directly)."""
    from pyanamo_spark.sources.pdf import build_pdf_cmap

    cps = [c for c in range(start, start + length) if not (0xD800 <= c <= 0xDFFF)]
    text = "".join(map(chr, cps))
    assert extract_pdf_text(build_pdf_cmap(text)) == text


def test_dict_scanner_survives_hex_strings_hugging_closers():
    """``/ID <41>>>``: the hex string's '>' must not pair with the
    dictionary's closing '>>' and truncate the balanced scan."""
    from pyanamo_spark.sources.pdf import _read_dict

    d = _read_dict(b"junk << /A << /ID <41> /B 2 >> /C 3 >> tail")
    assert d.endswith(b"/C 3 >>")
    d2 = _read_dict(b"<< /ID <4142>>>")
    assert d2 == b"<< /ID <4142>>>"


def test_object_stream_packed_dictionaries_resolve():
    """Modern (PDF 1.5+) files pack page/font dictionaries into a
    compressed /ObjStm; the object-graph walk must find them there.
    The content stream draws PRIVATE glyph codes through a Type0 font
    whose dict lives inside the object stream — the text decodes only
    if the packed objects (catalog, pages, page, font) really resolve,
    so the stream-walk fallback cannot fake a pass."""
    import zlib as _z

    from pyanamo_spark.sources.pdf import _assemble

    cmap = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"3 beginbfchar <0001> <0068> <0002> <0069> <0003> <0021> "
        b"endbfchar\n"
    )
    packed = [
        (10, b"<< /Type /Catalog /Pages 11 0 R >>"),
        (11, b"<< /Type /Pages /Kids [12 0 R] /Count 1 >>"),
        (12, b"<< /Type /Page /Parent 11 0 R /Contents 2 0 R "
             b"/Resources << /Font << /F1 13 0 R >> >> >>"),
        (13, b"<< /Type /Font /Subtype /Type0 /BaseFont /FAKECC+S "
             b"/Encoding /Identity-H /ToUnicode 3 0 R >>"),
    ]
    offsets, blob = [], b""
    for num, body in packed:
        offsets.append((num, len(blob)))
        blob += body + b"\n"
    header = " ".join(f"{n} {o}" for n, o in offsets).encode() + b"\n"
    stm = _z.compress(header + blob)
    # codes 1,2,3 -> "hi!" only via the packed font's CMap
    content = b"BT /F1 12 Tf 72 720 Td <000100020003> Tj ET"
    objs = [
        b"<< /Type /ObjStm /N 4 /First " + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length " + str(len(stm)).encode()
        + b" >>\nstream\n" + stm + b"\nendstream",
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream",
    ]
    assert extract_pdf_text(_assemble(objs)) == "hi!"


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(st.characters(codec="utf-8", min_codepoint=32), max_size=30),
        min_size=1,
        max_size=4,
    )
)
def test_property_multiline_cmap_roundtrip(lines):
    """Multi-line text through the Type0/CMap route: newline structure
    and every character survive."""
    from pyanamo_spark.sources.pdf import build_pdf_cmap

    text = "\n".join(lines)
    assert extract_pdf_text(build_pdf_cmap(text)) == text


def test_differences_roundtrip_basic():
    """A simple font with NO ToUnicode but an /Encoding /Differences
    array must extract through glyph-name resolution (AGL names and
    uniXXXX forms), including multi-line text and non-Latin chars."""
    from pyanamo_spark.sources.pdf import build_pdf_differences

    text = "café — naïve\nΩmega §1.2 «quoted»\nplain ascii ()\\"
    assert extract_pdf_text(build_pdf_differences(text)) == text
    # uncompressed variant exercises the raw stream path
    assert (
        extract_pdf_text(build_pdf_differences(text, compress=False))
        == text
    )


def test_differences_codes_are_not_the_text():
    """The planted byte codes must NOT equal the original bytes — the
    roundtrip must prove the glyph-name walk, not a passthrough."""
    from pyanamo_spark.sources.pdf import build_pdf_differences

    text = "secret payload"
    blob = build_pdf_differences(text, compress=False)
    assert text.encode() not in blob
    assert extract_pdf_text(blob) == text


def test_differences_overfull_alphabet_delegates_to_cmap():
    """Texts exceeding a simple font's 1-byte code space must still
    roundtrip (the builder switches to the Type0/CMap fixture, as a
    real producer would)."""
    from pyanamo_spark.sources.pdf import build_pdf_differences

    big = "".join(chr(0x100 + i) for i in range(300))
    assert extract_pdf_text(build_pdf_differences(big)) == big


def test_winansi_name_form_encoding():
    """/Encoding given as a bare base-encoding NAME (no Differences)
    must decode cp1252 bytes, including the 0x80-0x9F specials."""
    from pyanamo_spark.sources.pdf import _assemble

    text = "café • déjà vu — “quoted” …"
    payload = text.encode("cp1252")
    esc = (
        payload.replace(b"\\", rb"\\")
        .replace(b"(", rb"\(")
        .replace(b")", rb"\)")
    )
    content = b"BT /F1 12 Tf 72 720 Td (" + esc + b") Tj ET"
    blob = _assemble([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial "
        b"/Encoding /WinAnsiEncoding >>",
    ])
    assert extract_pdf_text(blob) == text


def test_differences_overlay_base_encoding():
    """Differences entries override only their codes; other codes keep
    the base-encoding mapping (here: WinAnsi base, one remapped code)."""
    from pyanamo_spark.sources.pdf import _assemble

    # code 0x41 ('A' in WinAnsi) remapped to /eacute; 'B' untouched
    content = b"BT /F1 12 Tf 72 720 Td (AB) Tj ET"
    blob = _assemble([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 65 /eacute ] >> >>",
    ])
    assert extract_pdf_text(blob) == "éB"


def test_subset_font_without_any_table_keeps_bytes():
    """Embedded subset fonts with neither ToUnicode nor Encoding stay
    the documented native-extractor swap point: bytes pass through."""
    from pyanamo_spark.sources.pdf import _assemble

    content = b"BT /F1 12 Tf 72 720 Td (raw bytes) Tj ET"
    blob = _assemble([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /ABCDEF+SubsetSans >>",
    ])
    assert extract_pdf_text(blob) == "raw bytes"


@settings(max_examples=40, deadline=None)
@given(st.text(st.characters(codec="utf-8", min_codepoint=32), max_size=60))
def test_property_differences_roundtrip(text):
    from pyanamo_spark.sources.pdf import build_pdf_differences

    assert extract_pdf_text(build_pdf_differences(text)) == text
