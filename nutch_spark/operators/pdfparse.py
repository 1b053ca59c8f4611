"""Minimal PDF text extraction as a MIME parse family (X12 parse-tika
analogue for application/pdf).

The reference routes PDFs through Tika (plugin/parse-tika/.../
TikaParser.java:71-171): the parser emits text + title, and because a PDF
produces no DOM anchor elements, outlinks fall back to
``OutlinkExtractor.getOutlinks(text)`` — a plain-text URL regex sweep
(TikaParser.java:157-161, OutlinkExtractor.java:60-140). This module
re-creates that observable behavior with a stdlib-only extractor over the
synthetic corpus's PDF documents, like the zip/feed treatment:

- content streams are located by the ``stream``/``endstream`` keywords,
  FlateDecode streams are zlib-inflated (PDF 32000-1:2008 §7.3.8, §7.4.4);
- shown text is recovered from the text-showing operators ``Tj``, ``'``,
  ``"`` and ``TJ`` (§9.4.3), with literal-string escapes (octal, \\( \\)
  \\n..., line continuations; §7.3.4.2) and hex strings (§7.3.4.3)
  decoded; TJ array elements concatenate (kerning numbers dropped);
- the document title comes from the Info dictionary's ``/Title`` entry
  (§14.3.3), mirroring Tika's metadata TITLE -> ParseData title
  (TikaParser.java:148-152);
- a body without the ``%PDF-`` header is the ParseStatus.FAILED path:
  no documents (TikaParser.java:95-101).

Declared-minimal (disclosed): no xref/object-graph walk, no font CMap
decoding (text is assumed latin-1-showable, true for the synthetic
corpus), no encryption. Real Tika is a binary-library dependency the
sandbox cannot carry; the dispatch plumbing, text/ outlink/title
contracts, and failure paths are real and oracle-tested (``pdf_parse``).
"""

from __future__ import annotations

import re
import zlib

_WS_RE = re.compile(r"\s+")

# Exact port of OutlinkExtractor.java:60 URL_PATTERN (Perl5, case-insensitive
# there via compile flags default — the pattern itself is case-explicit).
OUTLINK_URL_RE = re.compile(
    r"[A-Za-z][A-Za-z0-9+.-]{1,120}:[A-Za-z0-9/]"
    r"(?:[A-Za-z0-9$_.+!*,;/?:@&~=-]|%[A-Fa-f0-9]{2}){1,333}"
    r"(?:#[a-zA-Z0-9][a-zA-Z0-9$_.+!*,;/?:@&~=%-]{0,1000})?"
)


def extract_text_outlinks(text: str) -> list[str]:
    """OutlinkExtractor.getOutlinks(plainText) (OutlinkExtractor.java:84-140):
    every URL_PATTERN match in document order, empty anchor."""
    return OUTLINK_URL_RE.findall(text or "")


_WHITESPACE = b" \t\r\n\x00\x0c"
_DELIMS = b"()<>[]{}/%"
_ESC = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}


def _parse_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at data[i] == '('. Balanced
    parens nest; backslash escapes per §7.3.4.2."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESC:
                out.append(_ESC[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                j = i
                while j < n and j - i < 3 and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation: swallowed
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # \( \) \\ and unknown escapes: literal char
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return out.decode("latin-1"), i


def _parse_hex(data: bytes, i: int) -> tuple[str, int]:
    """Parse a hex string starting at data[i] == '<' (§7.3.4.3: whitespace
    ignored, odd final digit padded with 0)."""
    j = data.find(b">", i + 1)
    if j < 0:
        return "", len(data)
    digits = bytes(c for c in data[i + 1:j] if c not in _WHITESPACE)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")).decode("latin-1"), j + 1
    except ValueError:
        return "", j + 1


def _next_token(data: bytes, i: int) -> tuple[bytes, int]:
    n = len(data)
    while i < n and data[i] in _WHITESPACE:
        i += 1
    j = i
    while j < n and data[j] not in _WHITESPACE and data[j] not in _DELIMS:
        j += 1
    if j == i and i < n:
        j = i + 1  # lone delimiter char
    return data[i:j], j


def _array_strings(data: bytes, i: int) -> tuple[list[str], int]:
    """Collect string elements of an array starting at data[i] == '['."""
    elems: list[str] = []
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5D:  # ]
            return elems, i + 1
        if c == 0x28:
            s, i = _parse_literal(data, i)
            elems.append(s)
        elif c == 0x3C:
            s, i = _parse_hex(data, i)
            elems.append(s)
        else:
            i += 1
    return elems, i


def _stream_text_parts(stream: bytes) -> list[str]:
    """Shown-text strings from one decoded content stream, in operator
    order: (s) Tj / (s) ' / (s) " show s; [ ... ] TJ concatenates its
    string elements (§9.4.3)."""
    parts: list[str] = []
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # ( literal
            s, i = _parse_literal(stream, i)
            tok, j = _next_token(stream, i)
            if tok in (b"Tj", b"'", b'"'):
                parts.append(s)
                i = j
        elif c == 0x3C and not (i + 1 < n and stream[i + 1] == 0x3C):  # hex
            s, i = _parse_hex(stream, i)
            tok, j = _next_token(stream, i)
            if tok in (b"Tj", b"'", b'"'):
                parts.append(s)
                i = j
        elif c == 0x5B:  # [ ... ] TJ
            elems, i2 = _array_strings(stream, i)
            tok, j = _next_token(stream, i2)
            if tok == b"TJ":
                parts.append("".join(elems))
                i = j
            else:
                i = i2
        else:
            i += 1
    return parts


def _iter_streams(data: bytes):
    """Yield decoded content-stream bytes. FlateDecode detected by scanning
    the preceding dictionary window (no object-graph walk, disclosed)."""
    pos = 0
    n = len(data)
    while True:
        k = data.find(b"stream", pos)
        if k < 0:
            return
        after = k + len(b"stream")
        # must be the keyword: followed by EOL, not 'endstream'/identifier
        if data[max(0, k - 1):k].isalnum() or after >= n or data[after] not in b"\r\n":
            pos = after
            continue
        start = after + (2 if data[after:after + 2] == b"\r\n" else 1)
        end = data.find(b"endstream", start)
        if end < 0:
            return
        # window = the ENCLOSING object's dictionary only: bound at the
        # previous endobj/endstream so a neighboring object's /Length or
        # /FlateDecode (or compressed bytes that happen to contain them)
        # can't be misattributed when objects sit closer than 600 bytes
        wstart = max(0, k - 600)
        eo = data.rfind(b"endobj", wstart, k)
        es = data.rfind(b"endstream", wstart, k)
        wstart = max(wstart,
                     eo + len(b"endobj") if eo >= 0 else 0,
                     es + len(b"endstream") if es >= 0 else 0)
        window = data[wstart:k]
        # binary stream bytes may legitimately end in 0x0A/0x0D, so the
        # EOL before 'endstream' cannot be stripped greedily: honor the
        # dict's /Length when present (the LAST one in the window — the
        # nearest dict), else drop at most ONE EOL (§7.3.8)
        lm = None
        for lm in _LENGTH_RE.finditer(window):
            pass
        if lm and start + int(lm.group(1)) <= end:
            raw = data[start:start + int(lm.group(1))]
        else:
            raw = data[start:end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        if b"/FlateDecode" in window:
            try:  # decompressobj tolerates trailing bytes past the stream
                yield zlib.decompressobj().decompress(raw)
            except zlib.error:
                pass  # undecodable stream: skipped, like a Tika sub-parse error
        else:
            yield raw
        pos = end + len(b"endstream")


# direct lengths only: '/Length 8 0 R' is an INDIRECT object reference
# (§7.3.10) whose integer is an object number, not a byte count — treating
# it as one truncates the stream to garbage; the lookahead sends indirect
# cases to the endstream-scan fallback
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R\b)")
_TITLE_LIT_RE = re.compile(rb"/Title\s*\(")
_TITLE_HEX_RE = re.compile(rb"/Title\s*<(?!<)")


def extract_pdf(data: bytes) -> tuple[str, str, list[str]] | None:
    """(title, text, outlinks) for one PDF body, or None for a body
    without the %PDF- header (the FAILED / empty-parse path)."""
    if not data.startswith(b"%PDF-"):
        return None
    parts: list[str] = []
    for stream in _iter_streams(data):
        parts.extend(_stream_text_parts(stream))
    text = _WS_RE.sub(" ", " ".join(parts)).strip()
    title = ""
    m = _TITLE_LIT_RE.search(data)
    if m:
        title = _parse_literal(data, m.end() - 1)[0]
    else:
        m = _TITLE_HEX_RE.search(data)
        if m:
            title = _parse_hex(data, m.end() - 1)[0]
    return title.strip(), text, extract_text_outlinks(text)
