"""parse-swf analogue tests: hand-built SWF binaries (tag headers, RECTs,
bit-packed glyph entries) through extract_swf (no Spark session needed)."""

import struct
import zlib

from nutch_spark.operators.swfparse import UNKNOWN_FONT_MARKER, extract_swf


def tag(code: int, body: bytes) -> bytes:
    if len(body) >= 0x3F:
        return struct.pack("<HI", (code << 6) | 0x3F, len(body)) + body
    return struct.pack("<H", (code << 6) | len(body)) + body


RECT0 = b"\x00"  # nbits=0: '00000' + pad


def edittext(char_id: int, text: str | None, var: str = "v") -> bytes:
    f1 = 0x08 | (0x80 if text is not None else 0)  # ReadOnly | HasText
    body = struct.pack("<H", char_id) + RECT0 + bytes([f1, 0x00])
    body += var.encode() + b"\x00"
    if text is not None:
        body += text.encode() + b"\x00"
    return tag(37, body)


def definefont2(font_id: int, codes: list[int]) -> bytes:
    n = len(codes)
    body = struct.pack("<H", font_id) + bytes([0x04, 0x00, 0x00])  # wide codes
    body += struct.pack("<H", n)
    body += b"\x00\x00" * n                      # offset table (unused)
    body += struct.pack("<H", n * 2 + 2)         # code table offset
    body += b"".join(struct.pack("<H", c) for c in codes)
    return tag(48, body)


def definetext(char_id: int, font_id: int, glyphs: list[int],
               second_line: list[int] | None = None) -> bytes:
    gb = ab = 8
    body = struct.pack("<H", char_id) + RECT0 + b"\x00"  # matrix: 7 zero bits
    body += bytes([gb, ab])

    def record(glyph_idxs, with_y):
        flags = 0x80 | 0x08 | (0x02 if with_y else 0)
        r = bytes([flags]) + struct.pack("<H", font_id)
        if with_y:
            r += struct.pack("<h", 100)
        r += struct.pack("<H", 240)  # text height
        r += bytes([len(glyph_idxs)])
        for g in glyph_idxs:
            r += bytes([g, 0])  # index ub8 + advance sb8, byte aligned
        return r

    body += record(glyphs, with_y=True)
    if second_line is not None:
        body += record(second_line, with_y=True)
    body += b"\x00"
    return tag(11, body)


def doaction(pool: list[str], pushes: list, url: str | None) -> bytes:
    body = b""
    pd = struct.pack("<H", len(pool)) + b"".join(s.encode() + b"\x00" for s in pool)
    body += bytes([0x88]) + struct.pack("<H", len(pd)) + pd
    push = b""
    for p in pushes:
        if isinstance(p, str):
            push += b"\x00" + p.encode() + b"\x00"
        else:
            push += b"\x08" + bytes([p])  # constant8
    body += bytes([0x96]) + struct.pack("<H", len(push)) + push
    if url is not None:
        gd = url.encode() + b"\x00" + b"_blank\x00"
        body += bytes([0x83]) + struct.pack("<H", len(gd)) + gd
    body += b"\x00"
    return tag(12, body)


def swf(tags: bytes, compressed: bool = False) -> bytes:
    body = RECT0 + struct.pack("<H", 0x0C00) + struct.pack("<H", 1) + tags + tag(0, b"")
    if compressed:
        payload = zlib.compress(body)
        return b"CWS" + bytes([6]) + struct.pack("<I", 8 + len(body)) + payload
    return b"FWS" + bytes([6]) + struct.pack("<I", 8 + len(body)) + body


def test_edittext_initial_text():
    text, urls = extract_swf(swf(edittext(1, "hello flash world")))
    assert "hello flash world" in text
    assert urls == []


def test_glyph_text_through_font_code_table():
    """DefineFont2 code table translates DefineText glyph indices; a
    second Y offset dumps a newline between runs (SWFParser.java:282-287)."""
    codes = [ord(c) for c in "swfig"]  # glyph i -> char
    tags = definefont2(7, codes) + definetext(2, 7, [0, 1, 2], [2, 3, 4])
    text, _ = extract_swf(swf(tags))
    assert "swf" in text and "fig" in text
    assert text.index("swf") < text.index("fig")
    assert "\n" in text[text.index("swf") : text.index("fig")]


def test_glyph_index_past_table_is_char_code():
    """Index >= code table length -> the index IS the char (the reference's
    System Font fallback, SWFParser.java:305-311)."""
    tags = definefont2(7, [ord("a")]) + definetext(2, 7, [0, ord("b"), ord("c")])
    text, _ = extract_swf(swf(tags))
    assert "abc" in text


def test_unknown_font_dumps_marker():
    text, _ = extract_swf(swf(definetext(2, 99, [0, 1])))
    assert UNKNOWN_FONT_MARKER.strip() in text


def test_actions_pool_push_and_geturl():
    """Constant-pool + pushed strings land SORTED after the divider; the
    GetURL url leaves the string set and becomes an outlink
    (SWFParser.java:96-110,396-404)."""
    url = "http://swf.example.com/click"
    tags = doaction(["zeta", "alpha", url], ["pushed", 0], url)
    text, urls = extract_swf(swf(tags))
    assert urls == [url]
    head, _, atext = text.partition("\n--------\n")
    assert atext.splitlines() == ["alpha", "pushed", "zeta"]
    assert url not in atext


def test_compressed_cws_container():
    tags = edittext(1, "compressed body text")
    text, _ = extract_swf(swf(tags, compressed=True))
    assert "compressed body text" in text


def test_rejects_non_swf_and_bad_deflate():
    assert extract_swf(b"GIF89a not a swf") is None
    assert extract_swf(b"CWS\x06\x10\x00\x00\x00corrupted!") is None
    assert extract_swf(b"ZWS\x0d\x10\x00\x00\x00") is None  # LZMA: declared out
    assert extract_swf(b"") is None


def test_edittext_without_text_flag_contributes_nothing():
    text, _ = extract_swf(swf(edittext(1, None)))
    assert text == ""
