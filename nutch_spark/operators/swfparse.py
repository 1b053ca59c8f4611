"""parse-swf analogue: Flash text + link extraction, stdlib only.

The reference plugin (parse/swf/SWFParser.java) drives the javaswf tag
reader and collects, in tag order (ExtractText, SWFParser.java:160-330):

- DefineEditText initial text (tagDefineTextField:244-251);
- DefineText/DefineText2 glyph runs translated through the defining
  font's code table (DefineFont2/3 + DefineFontInfo/2 populate fontCodes,
  :208-241); a glyph index past the table is taken as the char code
  itself ("System Font?", :305-315); an UNKNOWN font id dumps the marker
  line "\\n**** ?????????????? ****\\n" instead of guessing (:297-301); a
  Y-offset change mid-text and each record end dump "\\n" (:282-287,325-328);
- ActionScript: constant-pool strings (lookupTable:381-388) and pushed
  strings into a string set, GetURL urls into the url list (the url and
  target leave the string set, :396-404); jump/label/comment operands
  leave the set too (:406-459).

getText() joins the string list with single spaces (:176-184); when any
action strings survive, the SORTED set is appended after a
"\\n--------\\n" divider (:98-100,186-195). Outlinks = the GetURL urls
plus the OutlinkExtractor regex over the final text (:102-110); title is
"" and an unparseable body is the FAILED path (:111-114).

This port reads the SWF container directly (FWS plain / CWS zlib; ZWS
LZMA is declared out) with a bit reader for RECTs and glyph entries.
Declared approximation: the reference's SmallStack spill-to-strings
behavior for deeply nested action pushes is simplified to
"pool + pushed strings enter the set; GetURL/jump/label operands leave
it" — the dominant observable behavior for real-world SWFs.
"""

from __future__ import annotations

import struct
import zlib


class _Bits:
    """MSB-first bit reader over bytes (SWF RECT / glyph entries)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def align(self) -> None:
        if self.bit:
            self.pos += 1
            self.bit = 0

    def ub(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def sb(self, n: int) -> int:
        v = self.ub(n)
        if n and v & (1 << (n - 1)):
            v -= 1 << n
        return v

    def u8(self) -> int:
        self.align()
        v = self.data[self.pos]
        self.pos += 1
        return v

    def u16(self) -> int:
        self.align()
        v = struct.unpack_from("<H", self.data, self.pos)[0]
        self.pos += 2
        return v

    def s16(self) -> int:
        self.align()
        v = struct.unpack_from("<h", self.data, self.pos)[0]
        self.pos += 2
        return v

    def u32(self) -> int:
        self.align()
        v = struct.unpack_from("<I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def cstring(self) -> str:
        self.align()
        end = self.data.index(b"\x00", self.pos)
        s = self.data[self.pos : end].decode("utf-8", "replace")
        self.pos = end + 1
        return s

    def skip_rect(self) -> None:
        self.align()
        n = self.ub(5)
        self.ub(4 * n)
        self.align()


UNKNOWN_FONT_MARKER = "\n**** ?????????????? ****\n"


def _parse_font2(body: bytes, wide_codes_always: bool) -> tuple[int, list[int]]:
    """DefineFont2/3 -> (font_id, code table). Glyph shapes are skipped by
    jumping straight to the code table via CodeTableOffset."""
    b = _Bits(body)
    font_id = b.u16()
    flags = b.u8()
    b.u8()  # language code
    name_len = b.u8()
    b.pos += name_len
    num_glyphs = b.u16()
    wide_offsets = bool(flags & 0x08)
    wide_codes = wide_codes_always or bool(flags & 0x04)
    table_base = b.pos
    osz = 4 if wide_offsets else 2
    # offset table (num_glyphs entries) then CodeTableOffset
    code_off_pos = table_base + num_glyphs * osz
    if num_glyphs == 0:
        return font_id, []
    if wide_offsets:
        code_table_off = struct.unpack_from("<I", body, code_off_pos)[0]
    else:
        code_table_off = struct.unpack_from("<H", body, code_off_pos)[0]
    p = table_base + code_table_off
    codes = []
    step = 2 if wide_codes else 1
    for _ in range(num_glyphs):
        if p + step > len(body):
            break
        codes.append(struct.unpack_from("<H" if wide_codes else "<B", body, p)[0])
        p += step
    return font_id, codes


def _parse_fontinfo(body: bytes, info2: bool) -> tuple[int, list[int]]:
    b = _Bits(body)
    font_id = b.u16()
    name_len = b.u8()
    b.pos += name_len
    flags = b.u8()
    if info2:
        b.u8()  # language code
    wide = bool(flags & 0x01)
    codes = []
    step = 2 if wide else 1
    while b.pos + step <= len(body):
        codes.append(struct.unpack_from("<H" if wide else "<B", body, b.pos)[0])
        b.pos += step
    return font_id, codes


def _parse_definetext(body: bytes, rgba: bool, font_codes: dict,
                      strings: list[str]) -> None:
    b = _Bits(body)
    b.u16()  # character id
    b.skip_rect()
    # text matrix: HasScale(1)[+2 fields], HasRotate(1)[+2], translate 2
    b.align()
    if b.ub(1):
        n = b.ub(5)
        b.ub(2 * n)
    if b.ub(1):
        n = b.ub(5)
        b.ub(2 * n)
    n = b.ub(5)
    b.ub(2 * n)
    b.align()
    glyph_bits = b.u8()
    advance_bits = b.u8()
    font_id: int | None = None
    first_y = True
    while True:
        flags = b.u8()
        if flags == 0:
            break
        if flags & 0x80:  # style record (TextRecordType=1)
            if flags & 0x08:
                font_id = b.u16()
            if flags & 0x04:
                b.pos += 4 if rgba else 3
                b.bit = 0
            if flags & 0x01:
                b.s16()  # x offset
            if flags & 0x02:
                b.s16()  # y offset -> new line unless first
                if first_y:
                    first_y = False
                else:
                    strings.append("\n")
            if flags & 0x08:
                b.u16()  # text height
            count = b.u8()
            codes = font_codes.get(font_id)
            chars = []
            for _ in range(count):
                idx = b.ub(glyph_bits)
                b.sb(advance_bits)
                if codes is None:
                    continue
                chars.append(chr(idx if idx >= len(codes) else codes[idx]))
            b.align()
            if codes is None:
                strings.append(UNKNOWN_FONT_MARKER)
            elif chars:
                strings.append("".join(chars))
        else:
            break  # malformed record type
    strings.append("\n")


def _parse_edittext(body: bytes, strings: list[str]) -> None:
    b = _Bits(body)
    b.u16()  # character id
    b.skip_rect()
    f1 = b.u8()
    f2 = b.u8()
    has_text = bool(f1 & 0x80)
    has_font = bool(f1 & 0x01)
    has_color = bool(f1 & 0x04)
    has_maxlen = bool(f1 & 0x02)
    has_fontclass = bool(f2 & 0x80)
    has_layout = bool(f2 & 0x20)
    if has_font:
        b.u16()  # font id
    if has_fontclass:
        b.cstring()
    if has_font:
        b.u16()  # font height
    if has_color:
        b.pos += 4  # RGBA
    if has_maxlen:
        b.u16()
    if has_layout:
        b.pos += 9  # align u8 + margins/indent u16*3 + leading s16
    b.cstring()  # variable name
    if has_text:
        txt = b.cstring()
        if txt:
            strings.append(txt)


def _parse_actions(body: bytes, start: int, action_strings: set,
                   urls: list[str]) -> None:
    pool: list[str] = []
    p, n = start, len(body)
    while p < n:
        code = body[p]
        p += 1
        if code == 0:
            break
        data = b""
        if code >= 0x80:
            if p + 2 > n:
                break
            ln = struct.unpack_from("<H", body, p)[0]
            p += 2
            data = body[p : p + ln]
            p += ln
        if code == 0x88:  # ConstantPool
            cnt = struct.unpack_from("<H", data, 0)[0]
            q = 2
            pool = []
            for _ in range(cnt):
                end = data.index(b"\x00", q)
                s = data[q:end].decode("utf-8", "replace")
                pool.append(s)
                action_strings.add(s)
                q = end + 1
        elif code == 0x96:  # Push
            q = 0
            while q < len(data):
                t = data[q]
                q += 1
                if t == 0:
                    end = data.index(b"\x00", q)
                    action_strings.add(data[q:end].decode("utf-8", "replace"))
                    q = end + 1
                elif t == 1:
                    q += 4
                elif t in (4, 5):
                    q += 1
                elif t == 6:
                    q += 8
                elif t == 7:
                    q += 4
                elif t == 8:
                    if data[q] < len(pool):
                        action_strings.add(pool[data[q]])
                    q += 1
                elif t == 9:
                    i = struct.unpack_from("<H", data, q)[0]
                    if i < len(pool):
                        action_strings.add(pool[i])
                    q += 2
                else:
                    q += 1
        elif code == 0x83:  # GetURL
            end = data.index(b"\x00")
            url = data[:end].decode("utf-8", "replace")
            end2 = data.index(b"\x00", end + 1)
            target = data[end + 1 : end2].decode("utf-8", "replace")
            action_strings.discard(url)
            action_strings.discard(target)
            urls.append(url)
        elif code in (0x8C, 0x81):  # GoToLabel / GotoFrame
            if b"\x00" in data:
                action_strings.discard(
                    data[: data.index(b"\x00")].decode("utf-8", "replace"))


def extract_swf(data: bytes) -> tuple[str, list[str]] | None:
    """(text, getURL urls) from an SWF body; None when it isn't one we can
    read (bad magic, LZMA 'ZWS', corrupt deflate)."""
    if len(data) < 8:
        return None
    sig = data[:3]
    if sig == b"FWS":
        body = data[8:]
    elif sig == b"CWS":
        try:
            body = zlib.decompress(data[8:])
        except zlib.error:
            return None
    else:
        return None
    b = _Bits(body)
    try:
        b.skip_rect()
        b.u16()  # frame rate
        b.u16()  # frame count
    except (IndexError, struct.error):
        return None

    strings: list[str] = []
    action_strings: set = set()
    urls: list[str] = []
    font_codes: dict[int | None, list[int]] = {}

    while b.pos + 2 <= len(body):
        code_len = struct.unpack_from("<H", body, b.pos)[0]
        b.pos += 2
        tag, ln = code_len >> 6, code_len & 0x3F
        if ln == 0x3F:
            ln = struct.unpack_from("<I", body, b.pos)[0]
            b.pos += 4
        tag_body = body[b.pos : b.pos + ln]
        b.pos += ln
        b.bit = 0
        try:
            if tag == 0:  # End
                break
            elif tag in (48, 75):  # DefineFont2 / DefineFont3
                fid, codes = _parse_font2(tag_body, wide_codes_always=(tag == 75))
                font_codes[fid] = codes
            elif tag in (13, 62):  # DefineFontInfo / 2
                fid, codes = _parse_fontinfo(tag_body, info2=(tag == 62))
                font_codes[fid] = codes
            elif tag in (11, 33):  # DefineText / DefineText2
                _parse_definetext(tag_body, rgba=(tag == 33),
                                  font_codes=font_codes, strings=strings)
            elif tag == 37:  # DefineEditText
                _parse_edittext(tag_body, strings)
            elif tag == 12:  # DoAction
                _parse_actions(tag_body, 0, action_strings, urls)
            elif tag == 59:  # DoInitAction (sprite id u16 first)
                _parse_actions(tag_body, 2, action_strings, urls)
        except (IndexError, ValueError, struct.error):
            continue  # tolerate one malformed tag, keep walking

    text = " ".join(strings)
    if action_strings:
        text += "\n--------\n" + "\n".join(sorted(action_strings))
    return text, urls
