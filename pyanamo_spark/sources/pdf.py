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
the text-positioning operators (``Td``/``TD``/``T*``/``Tm``) mapped
to line breaks, and — the most common real-corpus shape — fonts that
remap character codes, resolved through their **/ToUnicode CMap**
(``bfchar``/``bfrange`` blocks, 1- and 2-byte code widths, Type0/
Identity-H composite fonts included). The object graph is walked for
page → contents → resources → font structure, so indirect ``/Length``
references resolve and non-content streams (font programs, the CMap
itself, images) never leak into the text. Simple fonts carrying no
ToUnicode table fall back (r09) to **/Encoding glyph-name
resolution**: base-encoding tables (WinAnsi/Standard/MacRoman)
overlaid with the /Differences array, each name mapped to Unicode via
the Adobe Glyph List subset plus the algorithmic ``uniXXXX``/``uXXXX``
forms — the standard fallback chain (pdfminer/poppler do the same).
Only embedded subset fonts with NEITHER table extract bytes as-is;
recovering those needs the font program's own glyph table, which is
where a production pipeline swaps in a native extractor behind the
same column contract.

The extraction runs in Arrow-batched bytes-local ``mapInPandas``
stages; the registered query plants each document's text in a
one-page PDF — doc %4==1 through a Type0/Identity-H font whose codes
only a CMap walk can map back, %4==2 through a ToUnicode-less simple
font whose codes only the /Differences fallback can map back — and
the oracle reads the expectation straight from the documents table: a
hash match proves object parsing, inflate, string unescaping,
operator walking, CMap decoding, AND glyph-name resolution reproduced
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

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.S)

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
    literal/hex string, ('name', ident) for each /Name token, and
    ('op', name) for each operator token."""
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
        elif c == b"/":
            m = re.match(rb"/([^\s/<>\[\]()%]*)", content[i:])
            yield "name", m.group(1)
            i += m.end()
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


# --------------------------------------------------------- object graph


def _parse_objects(payload: bytes) -> dict[int, bytes]:
    """``N G obj ... endobj`` bodies keyed by object number, plus the
    objects packed inside compressed object streams (``/Type /ObjStm``
    — how most post-1.5 PDFs store their page/font dictionaries): the
    stream's ``/N`` pairs of ``objnum offset`` index its decompressed
    body, and each slice registers as a regular object."""
    objs = {
        int(m.group(1)): m.group(2)
        for m in _OBJ_RE.finditer(payload)
    }
    for num, body in list(objs.items()):
        sm = re.search(rb"stream\r?\n", body)
        if sm is None:
            continue
        d = _read_dict(body[: sm.start()])
        if not re.search(rb"/Type\s*/ObjStm\b", d):
            continue
        data = _object_stream(objs, num)
        nm = re.search(rb"/N\s+(\d+)", d)
        fm = re.search(rb"/First\s+(\d+)", d)
        if data is None or nm is None or fm is None:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        pairs = [int(x) for x in data[:first].split()][: 2 * n]
        entries = list(zip(pairs[0::2], pairs[1::2]))
        for i, (onum, off) in enumerate(entries):
            end = (
                first + entries[i + 1][1]
                if i + 1 < len(entries)
                else len(data)
            )
            objs.setdefault(onum, data[first + off : end])
    return objs


def _read_dict(data: bytes) -> bytes:
    """The first balanced ``<< ... >>`` in ``data`` (nested dicts
    counted, literal strings skipped); empty if none."""
    start = data.find(b"<<")
    if start < 0:
        return b""
    depth = 0
    i = start
    n = len(data)
    while i < n - 1:
        two = data[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
            continue
        if two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
            continue
        c = data[i : i + 1]
        if c == b"(":
            j = i + 1
            d = 1
            while j < n and d:
                cj = data[j : j + 1]
                if cj == b"\\":
                    j += 2
                    continue
                if cj == b"(":
                    d += 1
                elif cj == b")":
                    d -= 1
                j += 1
            i = j
            continue
        if c == b"<":  # single '<': a hex string — skip it whole, or
            # "<41>>>" would pair the hex close with the dict's first
            # '>' and truncate the dict one level early
            j = data.find(b">", i + 1)
            i = (j + 1) if j >= 0 else n
            continue
        i += 1
    return data[start:]


def _frame_stream(d: bytes, raw: bytes, objs: dict[int, bytes]) -> bytes:
    """Cut a stream body to its /Length — resolving INDIRECT length
    references through the object graph (``/Length 6 0 R`` where
    object 6 is a bare integer) — falling back to the end-of-stream
    newline heuristic only when neither form resolves. (?!\\d) forbids
    prefix matches: without it, "/Length 92 0 R" backtracks to accept
    "9" and truncates the body to 9 bytes. The indirect guard accepts
    ANY generation number ("/Length 92 1 R" is as indirect as
    "/Length 92 0 R"), so the direct branch must look ahead for
    \\d+\\s+R, not just 0\\s+R."""
    lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", d)
    if lm:
        return raw[: int(lm.group(1))]
    im = re.search(rb"/Length\s+(\d+)\s+\d+\s+R", d)
    if im:
        ref = objs.get(int(im.group(1)))
        if ref is not None and ref.strip().isdigit():
            return raw[: int(ref.strip())]
    if raw.endswith(b"\r\n"):
        return raw[:-2]
    if raw.endswith(b"\n"):
        return raw[:-1]
    return raw


def _object_stream(objs: dict[int, bytes], num: int) -> bytes | None:
    """Decoded stream bytes of object ``num`` (None: no stream, or an
    unsupported filter)."""
    body = objs.get(num)
    if body is None:
        return None
    sm = re.search(rb"stream\r?\n", body)
    if sm is None:
        return None
    d = _read_dict(body[: sm.start()])
    raw = body[sm.end() :]
    em = raw.rfind(b"endstream")
    if em >= 0:
        raw = raw[:em]
    raw = _frame_stream(d, raw, objs)
    if b"/FlateDecode" in d:
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise ValueError(f"PDF: bad Flate stream: {e}") from e
    if b"/Filter" in d:
        return None  # unsupported filter: image/font programs etc.
    return raw


# --------------------------------------------------------- ToUnicode


def _parse_tounicode(cmap: bytes) -> tuple[int, dict[int, str]]:
    """(code width in bytes, code → text) from a ToUnicode CMap's
    bfchar/bfrange blocks. Range destinations increment the final
    UTF-16 code unit per the CMap spec; the array destination form
    ``<lo> <hi> [<d0> <d1> ...]`` is supported."""
    mapping: dict[int, str] = {}
    width = 1

    def dst_text(h: bytes) -> str:
        return bytes.fromhex(h.decode("ascii")).decode(
            "utf-16-be", errors="replace"
        )

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for sm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            src, dst = sm.groups()
            width = max(width, len(src) // 2)
            mapping[int(src, 16)] = dst_text(dst)
    # one alternation, scanned left-to-right: the array form consumes
    # its brackets BEFORE the simple form can see the <dN> tokens
    # inside them (two independent passes once mis-parsed
    # "<lo> <hi> [<d0> <d1> ...]" as a simple entry over d0/d1)
    entry_re = re.compile(
        rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
        rb"(?:\[(.*?)\]|<([0-9A-Fa-f]+)>)",
        re.S,
    )
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        for sm in entry_re.finditer(m.group(1)):
            lo, hi, arr, dst = sm.groups()
            width = max(width, len(lo) // 2)
            span = int(hi, 16) - int(lo, 16) + 1
            if arr is not None:
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", arr)
                for off in range(min(span, len(dsts))):
                    mapping[int(lo, 16) + off] = dst_text(dsts[off])
            else:
                base = int(dst, 16)
                for off in range(span):
                    hs = f"{base + off:0{len(dst)}X}"
                    if len(hs) % 2:  # foreign CMap whose run overflows
                        # its declared width (spec-illegal — only the
                        # last byte may increment): pad rather than
                        # crash the whole document's decode
                        hs = "0" + hs
                    mapping[int(lo, 16) + off] = dst_text(hs.encode("ascii"))
    return width, mapping


# ------------------------------------------- glyph-name fallback
#
# Fonts without a /ToUnicode table are recoverable when they are
# SIMPLE fonts (Type1/TrueType, 1-byte codes) carrying an /Encoding:
# code → glyph NAME (base encoding table, overridden by a
# /Differences array) → Unicode via the Adobe Glyph List. This is the
# standard-glyph-list fallback every real extractor implements
# (pdfminer/poppler do the same dance); only embedded subset fonts
# with neither table keep their raw bytes. Reference behavior bar:
# text-bearing docs the executor's log miner ingests
# (/root/reference/code/use-cases/example_docker/managing-item-logs.py:61-71).

#: Adobe Glyph List subset: every printable-Latin-1 name, the cp1252
#: specials, and the ASCII punctuation names — the names simple-font
#: /Differences arrays actually use. ``uniXXXX`` / ``uXXXXXX`` forms
#: are resolved algorithmically in _glyph_to_char.
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # Standard-encoding typographic names
    "quoteright": "’", "quoteleft": "‘",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "fi": "ﬁ", "fl": "ﬂ",
    "florin": "ƒ", "circumflex": "ˆ", "caron": "ˇ",
    "tilde": "˜", "trademark": "™", "Euro": "€",
    "OE": "Œ", "oe": "œ", "Scaron": "Š",
    "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "Ydieresis": "Ÿ", "dotlessi": "ı",
    # Latin-1 upper half
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "twosuperior": "²",
    "threesuperior": "³", "acute": "´", "mu": "µ",
    "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "onesuperior": "¹",
    "ordmasculine": "º", "guillemotright": "»",
    "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿",
    "multiply": "×", "divide": "÷",
}
# A-Z / a-z map to themselves; accented Latin-1 letters follow the
# AGL naming convention (<letter><accent-name>)
_AGL.update({c: c for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"})
for _name, _cp in (
    ("Agrave", 0xC0), ("Aacute", 0xC1), ("Acircumflex", 0xC2),
    ("Atilde", 0xC3), ("Adieresis", 0xC4), ("Aring", 0xC5),
    ("AE", 0xC6), ("Ccedilla", 0xC7), ("Egrave", 0xC8),
    ("Eacute", 0xC9), ("Ecircumflex", 0xCA), ("Edieresis", 0xCB),
    ("Igrave", 0xCC), ("Iacute", 0xCD), ("Icircumflex", 0xCE),
    ("Idieresis", 0xCF), ("Eth", 0xD0), ("Ntilde", 0xD1),
    ("Ograve", 0xD2), ("Oacute", 0xD3), ("Ocircumflex", 0xD4),
    ("Otilde", 0xD5), ("Odieresis", 0xD6), ("Oslash", 0xD8),
    ("Ugrave", 0xD9), ("Uacute", 0xDA), ("Ucircumflex", 0xDB),
    ("Udieresis", 0xDC), ("Yacute", 0xDD), ("Thorn", 0xDE),
    ("germandbls", 0xDF), ("agrave", 0xE0), ("aacute", 0xE1),
    ("acircumflex", 0xE2), ("atilde", 0xE3), ("adieresis", 0xE4),
    ("aring", 0xE5), ("ae", 0xE6), ("ccedilla", 0xE7),
    ("egrave", 0xE8), ("eacute", 0xE9), ("ecircumflex", 0xEA),
    ("edieresis", 0xEB), ("igrave", 0xEC), ("iacute", 0xED),
    ("icircumflex", 0xEE), ("idieresis", 0xEF), ("eth", 0xF0),
    ("ntilde", 0xF1), ("ograve", 0xF2), ("oacute", 0xF3),
    ("ocircumflex", 0xF4), ("otilde", 0xF5), ("odieresis", 0xF6),
    ("oslash", 0xF8), ("ugrave", 0xF9), ("uacute", 0xFA),
    ("ucircumflex", 0xFB), ("udieresis", 0xFC), ("yacute", 0xFD),
    ("thorn", 0xFE), ("ydieresis", 0xFF),
):
    _AGL[_name] = chr(_cp)

#: char → canonical glyph name (for the fixture builder)
_AGL_REV: dict[str, str] = {}
for _n, _c in _AGL.items():
    _AGL_REV.setdefault(_c, _n)


def _glyph_to_char(name: str) -> str | None:
    """AGL lookup plus the algorithmic ``uniXXXX`` / ``uXXXX[XX]``
    forms; None for names outside the subset (code stays unmapped)."""
    got = _AGL.get(name)
    if got is not None:
        return got
    if re.fullmatch(r"uni[0-9A-F]{4}", name):
        cp = int(name[3:], 16)
        return chr(cp) if not 0xD800 <= cp <= 0xDFFF else None
    if re.fullmatch(r"u[0-9A-F]{4,6}", name):
        cp = int(name[1:], 16)
        return chr(cp) if cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF else None
    return None


def _ascii_names(quote: str, grave: str) -> dict[int, str]:
    table = {}
    for code in range(32, 127):
        ch = chr(code)
        nm = _AGL_REV.get(ch)
        if code == 0x27:
            nm = quote
        elif code == 0x60:
            nm = grave
        if nm:
            table[code] = nm
    return table


#: PDF base encodings as code → glyph-name tables (PDF spec App. D).
#: WinAnsi = cp1252; Standard differs at the quote characters and
#: leaves the upper half to its older charset (subset here — unmapped
#: upper codes surface as U+FFFD, same as any absent glyph).
_WIN_ANSI: dict[int, str] = _ascii_names("quotesingle", "grave")
for _code, _nm in (
    (0x80, "Euro"), (0x82, "quotesinglbase"), (0x83, "florin"),
    (0x84, "quotedblbase"), (0x85, "ellipsis"), (0x86, "dagger"),
    (0x87, "daggerdbl"), (0x88, "circumflex"), (0x89, "perthousand"),
    (0x8A, "Scaron"), (0x8B, "guilsinglleft"), (0x8C, "OE"),
    (0x8E, "Zcaron"), (0x91, "quoteleft"), (0x92, "quoteright"),
    (0x93, "quotedblleft"), (0x94, "quotedblright"), (0x95, "bullet"),
    (0x96, "endash"), (0x97, "emdash"), (0x98, "tilde"),
    (0x99, "trademark"), (0x9A, "scaron"), (0x9B, "guilsinglright"),
    (0x9C, "oe"), (0x9E, "zcaron"), (0x9F, "Ydieresis"),
):
    _WIN_ANSI[_code] = _nm
for _code in range(0xA1, 0x100):
    _nm = _AGL_REV.get(chr(_code))
    if _nm:
        _WIN_ANSI[_code] = _nm
_STANDARD: dict[int, str] = _ascii_names("quoteright", "quoteleft")
_MAC_ROMAN: dict[int, str] = _ascii_names("quotesingle", "grave")

_BASE_ENCODINGS = {
    b"WinAnsiEncoding": _WIN_ANSI,
    b"StandardEncoding": _STANDARD,
    b"MacRomanEncoding": _MAC_ROMAN,
    b"PDFDocEncoding": _WIN_ANSI,
}

_DIFF_TOKEN = re.compile(rb"(\d+)|/([^\s/\[\]<>()]+)")


def _encoding_map(
    objs: dict[int, bytes], font_dict: bytes
) -> tuple[int, dict[int, str]] | None:
    """code → text mapping for a simple font from its /Encoding entry
    (base-encoding name and/or /Differences array), or None when the
    font carries no resolvable encoding (embedded subset fonts keep
    raw bytes — the documented native-extractor swap point is now only
    needed for THOSE)."""
    if re.search(rb"/Subtype\s*/Type0", font_dict):
        return None  # composite font: codes are CIDs, not byte codes
    m = re.search(rb"/Encoding\s+(\d+)\s+\d+\s+R", font_dict)
    if m:
        body = objs.get(int(m.group(1)))
        if body is None:
            return None
        enc = _read_dict(body)
    else:
        m = re.search(rb"/Encoding\s*(<<.*?>>|/[A-Za-z]+)", font_dict, re.S)
        if m is None:
            return None
        enc = m.group(1)
    names: dict[int, str] = {}
    bm = re.search(rb"/(?:BaseEncoding\s*/)?([A-Za-z]+Encoding)", enc)
    base = _BASE_ENCODINGS.get(bm.group(1)) if bm else None
    # per the spec, Differences overlay the base encoding; with no
    # BaseEncoding the font's built-in encoding applies, for which
    # Standard is the portable stand-in
    names.update(base if base is not None else _STANDARD)
    dm = re.search(rb"/Differences\s*\[(.*?)\]", enc, re.S)
    if dm is not None:
        code = 0
        for num, nm in _DIFF_TOKEN.findall(dm.group(1)):
            if num:
                code = int(num)
            else:
                names[code] = nm.decode("latin-1")
                code += 1
    elif base is None:
        return None  # no encoding information at all
    mapping: dict[int, str] = {}
    for code, nm in names.items():
        ch = _glyph_to_char(nm)
        if ch is not None:
            mapping[code] = ch
    return (1, mapping) if mapping else None


def _font_cmap(
    objs: dict[int, bytes], fnum: int
) -> tuple[int, dict[int, str]] | None:
    body = objs.get(fnum)
    if body is None:
        return None
    d = _read_dict(body)
    tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", d)
    if tm is None:
        return _encoding_map(objs, d)
    stream = _object_stream(objs, int(tm.group(1)))
    if stream is None:
        return _encoding_map(objs, d)
    return _parse_tounicode(stream)


def _page_contents(
    objs: dict[int, bytes],
) -> list[tuple[bytes, dict[bytes, tuple[int, dict[int, str]]]]]:
    """(content stream, font-name → CMap) per page, page-object order.
    Resources may be inline or an indirect reference."""
    out = []
    for num in sorted(objs):
        d = _read_dict(objs[num])
        if not re.search(rb"/Type\s*/Page(?![A-Za-z])", d):
            continue
        am = re.search(rb"/Contents\s*\[(.*?)\]", d, re.S)
        if am:
            c_nums = [
                int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", am.group(1))
            ]
        else:
            cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", d)
            c_nums = [int(cm.group(1))] if cm else []
        res = d
        rm = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", d)
        if rm:
            res = _read_dict(objs.get(int(rm.group(1)), b""))
        fonts: dict[bytes, tuple[int, dict[int, str]]] = {}
        fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
        if fm:
            for name, fnum in re.findall(
                rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fm.group(1)
            ):
                cmap = _font_cmap(objs, int(fnum))
                if cmap is not None:
                    fonts[name] = cmap
        for cn in c_nums:
            stream = _object_stream(objs, cn)
            if stream is not None:
                out.append((stream, fonts))
    return out


# --------------------------------------------------------- text walk


def _decode_codes(
    raw: bytes, cmap: tuple[int, dict[int, str]] | None
) -> bytes:
    """Map a drawn string's bytes through the active font's CMap
    (fixed code width, unmapped codes → U+FFFD); identity when the
    font carries no ToUnicode table."""
    if cmap is None:
        return raw
    width, mapping = cmap
    chars = []
    for i in range(0, len(raw) - width + 1, width):
        code = int.from_bytes(raw[i : i + width], "big")
        chars.append(mapping.get(code, "�"))
    return "".join(chars).encode("utf-8")


def _walk_content(
    content: bytes,
    fonts: dict[bytes, tuple[int, dict[int, str]]],
) -> list[bytes]:
    """Text pieces (one per drawn line) of one content stream.
    ``Tf`` switches the active font — and with it the CMap applied to
    every subsequently drawn string."""
    pieces: list[bytes] = []
    pending: list[bytes] = []
    line: list[bytes] = []
    cur: tuple[int, dict[int, str]] | None = None
    last_name: bytes | None = None
    for kind, tok in _iter_strings(content):
        if kind == "name":
            last_name = tok
        elif kind == "str":
            pending.append(tok)
        elif tok == b"Tf":
            cur = fonts.get(last_name) if last_name else None
            pending = []
        elif tok == b"Tj":
            if pending:
                line.append(_decode_codes(pending[-1], cur))
            pending = []
        elif tok in (b"'", b'"'):  # draw on the NEXT line
            if line:
                pieces.append(b" ".join(line))
            line = [_decode_codes(pending[-1], cur)] if pending else []
            pending = []
        elif tok == b"TJ":
            line.append(
                b"".join(_decode_codes(p, cur) for p in pending)
            )
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
    return pieces


def extract_pdf_text(payload: bytes) -> str:
    """Visible text of a PDF: page-content operators walked in page
    order, Td/TD/T*/Tm position changes become newlines, Tj/'/TJ
    append, and strings drawn with a ToUnicode-carrying font decode
    through its CMap. When no page structure parses (stream
    fragments), every stream is walked CMap-less — the pre-r07
    baseline behavior."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF: bad header")
    objs = _parse_objects(payload)
    pages = _page_contents(objs)
    pieces: list[bytes] = []
    if pages:
        for body, fonts in pages:
            pieces += _walk_content(body, fonts)
    else:
        for m in _STREAM_RE.finditer(payload):
            d, body = m.group("dict"), m.group("body")
            body = _frame_stream(d, body, objs)
            if b"/FlateDecode" in d:
                try:
                    body = zlib.decompress(body)
                except zlib.error as e:
                    raise ValueError(f"PDF: bad Flate stream: {e}") from e
            elif b"/Filter" in d:
                continue
            pieces += _walk_content(body, {})
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
    return _assemble(objs)


def build_pdf_cmap(text: str, compress: bool = True) -> bytes:
    """One-page PDF drawing ``text`` through a Type0/Identity-H font:
    every character becomes a PRIVATE 2-byte glyph code (assigned in
    first-appearance order — the bytes in the content stream share no
    relationship with Unicode), recoverable only via the font's
    /ToUnicode CMap. Runs of codepoint-consecutive characters emit as
    ``bfrange`` entries, the rest as ``bfchar`` (≤100 per block per
    the CMap spec) — both decode paths are exercised by any
    real-world-shaped text."""
    chars: list[str] = []
    index: dict[str, int] = {}
    for ch in text:
        if ch != "\n" and ch not in index:
            index[ch] = len(chars) + 1
            chars.append(ch)
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for ln in text.split("\n"):
        hexs = "".join(f"{index[ch]:04X}" for ch in ln)
        ops.append(b"<" + hexs.encode("ascii") + b"> Tj 0 -14 Td")
    ops.append(b"ET")
    content = b" ".join(ops)
    # greedy bfranges over (code-consecutive, codepoint-consecutive)
    # runs of BMP chars; singletons and astral chars go to bfchar.
    # Per the CMap spec only the LAST byte of a range destination
    # increments, so a run must stay inside one 256-codepoint low-byte
    # block (which also keeps every incremented destination ≤ 0xFFFF —
    # an unbounded run starting near 0xFFF0 would format a 5-hex-digit
    # destination the decoder's bytes.fromhex rejects)
    bfranges: list[tuple[int, int, str]] = []
    bfchars: list[tuple[int, str]] = []
    i = 0
    while i < len(chars):
        j = i
        while (
            j + 1 < len(chars)
            and ord(chars[i]) <= 0xFFFF
            and ord(chars[j + 1]) == ord(chars[i]) + (j + 1 - i)
            and (ord(chars[i]) + (j + 1 - i)) >> 8 == ord(chars[i]) >> 8
        ):
            j += 1
        if j > i:
            bfranges.append((i + 1, j + 1, chars[i]))
        else:
            bfchars.append((i + 1, chars[i]))
        i = j + 1
    cm = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    for k in range(0, len(bfranges), 100):
        blk = bfranges[k : k + 100]
        cm.append(f"{len(blk)} beginbfrange".encode("ascii"))
        for lo, hi, ch in blk:
            cm.append(f"<{lo:04X}> <{hi:04X}> <{ord(ch):04X}>".encode())
        cm.append(b"endbfrange")
    for k in range(0, len(bfchars), 100):
        blk = bfchars[k : k + 100]
        cm.append(f"{len(blk)} beginbfchar".encode("ascii"))
        for code, ch in blk:
            dst = ch.encode("utf-16-be").hex().upper()
            cm.append(f"<{code:04X}> <{dst}>".encode("ascii"))
        cm.append(b"endbfchar")
    cm += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    cmap_body = b"\n".join(cm)
    filt = b""
    cfilt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
        cmap_body = zlib.compress(cmap_body)
        cfilt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FAKEAA+Synth "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap_body)).encode() + cfilt
        + b" >>\nstream\n" + cmap_body + b"\nendstream",
    ]
    return _assemble(objs)


def build_pdf_differences(text: str, compress: bool = True) -> bytes:
    """One-page PDF drawing ``text`` through a simple TrueType font
    with NO /ToUnicode table: every character gets a private 1-byte
    code (first-appearance order, starting at 33 — unrelated to its
    Unicode value), recoverable only by resolving the font's
    /Encoding /Differences array through the standard glyph list
    (AGL names where they exist, ``uniXXXX`` otherwise). The
    Differences array restarts its integer code token every 32 names
    so both token kinds are exercised. Texts with more than 223
    distinct characters exceed a simple font's code space and build
    through the Type0/CMap fixture instead — the switch real PDF
    producers also make."""
    chars: list[str] = []
    index: dict[str, int] = {}
    for ch in text:
        if ch != "\n" and ch not in index:
            index[ch] = 33 + len(chars)
            chars.append(ch)
    if len(chars) > 223:  # codes 33..255
        return build_pdf_cmap(text, compress=compress)
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for ln in text.split("\n"):
        hexs = "".join(f"{index[ch]:02X}" for ch in ln)
        ops.append(b"<" + hexs.encode("ascii") + b"> Tj 0 -14 Td")
    ops.append(b"ET")
    content = b" ".join(ops)
    diff_parts: list[bytes] = []
    for i, ch in enumerate(chars):
        if i % 32 == 0:
            diff_parts.append(str(33 + i).encode("ascii"))
        nm = _AGL_REV.get(ch)
        if nm is None:
            cp = ord(ch)
            nm = f"uni{cp:04X}" if cp <= 0xFFFF else f"u{cp:06X}"
        diff_parts.append(b"/" + nm.encode("ascii"))
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
        b"<< /Type /Font /Subtype /TrueType /BaseFont /FAKECC+Synth "
        b"/Encoding 6 0 R >>",
        b"<< /Type /Encoding /Differences [ "
        + b" ".join(diff_parts) + b" ] >>",
    ]
    return _assemble(objs)


def _assemble(objs: list[bytes]) -> bytes:
    """Number the objects 1..n, append xref + trailer."""
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
    document's text in a one-page PDF — doc_id %4==1 via a
    Type0/Identity-H font whose private glyph codes only the
    /ToUnicode CMap walk can map back, %4==2 via a simple font with
    NO ToUnicode whose private byte codes only the /Encoding
    /Differences glyph-name resolution can map back (r09), the rest
    as plain (un)compressed literal-string PDFs — extract it back
    with the real parser, and return (doc_id, text). The oracle is
    the documents table itself — a hash match proves object/stream
    parsing, inflate, unescaping, operator walking, CMap decoding,
    and glyph-name fallback reproduced every planted byte.

    The explicit repartition exists because the parse is CPU-heavy
    per row while the input is few large splits: without it the
    mapInPandas stage inherits the scan's parallelism (2 partitions at
    sf1) and strands the other cores. One narrow (doc_id, text)
    shuffle costs far less than serializing the parse — the same call
    a production job makes before any compute-bound stage."""
    from pyanamo_spark.session import spread

    docs = spread(spark.table("documents"), "doc_id", "text")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if int(doc_id) % 4 == 1:
                    blob = build_pdf_cmap(str(text))
                elif int(doc_id) % 4 == 2:
                    blob = build_pdf_differences(str(text))
                else:
                    blob = build_pdf(
                        str(text), compress=int(doc_id) % 4 != 3
                    )
                rows.append(
                    {"doc_id": doc_id,
                     "pdf_text": extract_pdf_text(blob)}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "pdf_text"])

    return docs.mapInPandas(roundtrip, schema="doc_id bigint, pdf_text string")
