"""Office-document text extraction without Tika: RTF and OpenDocument.

The reference routes rich-text and office formats to parse-tika
(conf/parse-plugins.xml maps application/rtf and the
application/vnd.oasis.opendocument.* family to the tika plugin;
TikaParser.java:71-171 turns them into title + plain text + regex
outlinks). Tika itself is a library this container doesn't ship, but two
of its most common office formats need no library at all:

- RTF is a TEXT format: a control-word walk with a group stack
  (destination skipping, \\'hh and \\uN escapes, \\par/\\tab) recovers the
  document text and the {\\info{\\title ...}} title;
- OpenDocument (odt/ods/odp) is a ZIP holding content.xml (body text) and
  meta.xml (dc:title) — stdlib zipfile + ElementTree.

Both feed the same ParseResult shape the PDF family uses: title + one
text span + OutlinkExtractor regex links over the text
(TikaParser.java:157-161). Legacy binary .doc/.ppt/.xls remain declared
out (OLE2 container, genuinely library-sized).
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree

_RTF_CTRL_RE = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?|\\([^a-zA-Z])")

# destination groups whose content is NOT document text (RTF 1.9 spec;
# the set TextExtractor-class strippers skip)
_RTF_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"listtable",
    b"listoverridetable", b"pict", b"object", b"header", b"footer",
    b"headerl", b"headerr", b"headerf", b"footerl", b"footerr", b"footerf",
    b"footnote", b"xe", b"tc", b"field", b"fldinst", b"themedata",
    b"colorschememapping", b"datastore", b"latentstyles", b"generator",
}
_RTF_NEWLINES = {b"par", b"line", b"sect", b"page", b"row"}
_RTF_LITERALS = {
    b"tab": "\t", b"cell": "\t", b"emdash": "\u2014", b"endash": "\u2013",
    b"lquote": "\u2018", b"rquote": "\u2019", b"ldblquote": "\u201c",
    b"rdblquote": "\u201d", b"bullet": "\u2022", b"emspace": " ",
    b"enspace": " ", b"qmspace": " ", b"~": "\u00a0", b"_": "-",
}


def extract_rtf(data: bytes) -> tuple[str, str] | None:
    """(title, text) from an RTF body; None when the magic is absent.

    Group-stack walk: each '{' pushes (skip?, uc), '}' pops; a group whose
    first control word is a skip destination (or any \\* destination we
    don't know) contributes nothing. \\'hh decodes through cp1252 — the
    codepage \\ansicpgN picks the single-byte codec when present. \\uN
    emits the BMP char and swallows the next `uc` fallback bytes."""
    if not data.startswith(b"{\\rtf"):
        return None
    m = re.search(rb"\\ansicpg(\d+)", data[:256])
    codec = f"cp{m.group(1).decode()}" if m else "cp1252"
    try:
        "x".encode(codec)
    except LookupError:
        codec = "cp1252"

    out: list[str] = []
    title: list[str] = []
    # state: (skipping, uc_count, in_title)
    stack: list[tuple[bool, int, bool]] = []
    skipping, uc, in_title = False, 1, False
    group_start = False  # just entered a group: next control may be a dest
    pending_skip_bytes = 0
    sink = out

    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            stack.append((skipping, uc, in_title))
            group_start = True
            i += 1
            continue
        if c == 0x7D:  # }
            if stack:
                skipping, uc, in_title = stack.pop()
                sink = title if in_title else out
            group_start = False
            i += 1
            continue
        if c == 0x5C:  # backslash
            m = _RTF_CTRL_RE.match(data, i)
            if not m:
                i += 1
                continue
            i = m.end()
            word, num, sym = m.group(1), m.group(2), m.group(3)
            if sym is not None:
                if sym == b"*" and group_start:
                    skipping = True  # unknown \* destination
                elif sym in (b"\\", b"{", b"}"):
                    if not skipping and pending_skip_bytes == 0:
                        sink.append(sym.decode("ascii"))
                elif sym == b"'":
                    hexpair = data[i : i + 2]
                    i += 2
                    if pending_skip_bytes > 0:
                        pending_skip_bytes -= 1
                    elif not skipping:
                        try:
                            sink.append(bytes.fromhex(hexpair.decode("ascii")).decode(codec, "replace"))
                        except ValueError:
                            pass
                elif sym in _RTF_LITERALS and not skipping:
                    sink.append(_RTF_LITERALS[sym])
                group_start = False
                continue
            # alphabetic control word
            if group_start:
                if word in _RTF_SKIP_DESTS or word == b"info":
                    # info subgroups (author, company, timestamps) are
                    # metadata, not body text; \title re-enables capture
                    # into the title sink below
                    skipping = True
                elif word == b"title":
                    in_title, sink, skipping = True, title, False
                group_start = False
            if word == b"uc" and num is not None:
                uc = int(num)
            elif word == b"u" and num is not None:
                if not skipping:
                    cp = int(num)
                    sink.append(chr(cp + 65536 if cp < 0 else cp))
                pending_skip_bytes = uc
            elif word in _RTF_NEWLINES:
                if not skipping:
                    sink.append("\n")
            elif word in _RTF_LITERALS:
                if not skipping:
                    sink.append(_RTF_LITERALS[word])
            continue
        # plain byte
        if c in (0x0D, 0x0A, 0x00):
            i += 1
            continue
        if pending_skip_bytes > 0:
            pending_skip_bytes -= 1
        elif not skipping:
            sink.append(bytes((c,)).decode(codec, "replace"))
        group_start = False
        i += 1

    text = re.sub(r"[ \t]+", " ", "".join(out)).strip()
    text = re.sub(r" ?\n ?", "\n", text)
    return "".join(title).strip(), text


_ODF_TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODF_DC_NS = "http://purl.org/dc/elements/1.1/"


def extract_odf(data: bytes) -> tuple[str, str] | None:
    """(title, text) from an OpenDocument package (odt/ods/odp); None when
    the payload is not a readable ODF zip. Paragraphs (text:p) and
    headings (text:h) become newline-separated lines in document order;
    dc:title comes from meta.xml."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile:
        return None
    names = set(zf.namelist())
    if "content.xml" not in names:
        return None
    try:
        root = ElementTree.fromstring(zf.read("content.xml"))
    except (ElementTree.ParseError, KeyError, zlib.error):
        return None
    lines = []
    for el in root.iter():
        tag = el.tag
        if tag == f"{{{_ODF_TEXT_NS}}}p" or tag == f"{{{_ODF_TEXT_NS}}}h":
            line = "".join(el.itertext()).strip()
            if line:
                lines.append(line)
    title = ""
    if "meta.xml" in names:
        try:
            meta = ElementTree.fromstring(zf.read("meta.xml"))
            t = meta.find(f".//{{{_ODF_DC_NS}}}title")
            if t is not None and t.text:
                title = t.text.strip()
        except (ElementTree.ParseError, zlib.error):
            pass
    return title, "\n".join(lines)


def encode_odf(text_paragraphs: list[str], title: str = "",
               mimetype: str = "application/vnd.oasis.opendocument.text") -> bytes:
    """Minimal valid ODF package for fixtures: mimetype (stored first,
    uncompressed, per spec), content.xml, meta.xml."""
    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                 .replace(">", "&gt;"))

    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="{_ODF_TEXT_NS}">'
        "<office:body><office:text>"
        + "".join(f"<text:p>{esc(p)}</text:p>" for p in text_paragraphs)
        + "</office:text></office:body></office:document-content>"
    )
    meta = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-meta xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        f'xmlns:dc="{_ODF_DC_NS}"><office:meta>'
        f"<dc:title>{esc(title)}</dc:title></office:meta></office:document-meta>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", mimetype, compress_type=zipfile.ZIP_STORED)
        zf.writestr("content.xml", content, compress_type=zipfile.ZIP_DEFLATED)
        zf.writestr("meta.xml", meta, compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()
