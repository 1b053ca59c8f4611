"""TestContent port (src/test/org/apache/nutch/protocol/TestContent.java:
31-106): the spell-checked metadata lookup on a Content record and the
eight getContentType resolution cases (declared type vs url extension vs
mime magic). The Writable roundtrip half of the test is serialization
plumbing Spark supplies."""

from nutch_spark.functions.content import (
    OCTET_STREAM,
    normalize_header_name,
    resolve_content_type,
)


def test_spellchecked_content_type_lookup():
    # testContent (:38-54): Content metadata answers for misspelled and
    # case-mangled Content-Type keys
    meta = {normalize_header_name("Content-Type"): "text/html"}
    for asked in ("Content-Type", "content-type", "CONTENTYPE"):
        assert meta.get(normalize_header_name(asked)) == "text/html", asked


def test_get_content_type_cases():
    # testGetContentType (:57-106), all eight cases in order
    cases = [
        # (declared, url, data, expected)
        ("text/html; charset=UTF-8", "http://www.foo.com/", b"", "text/html"),
        ("", "http://www.foo.com/foo.html", b"", "text/html"),
        (None, "http://www.foo.com/foo.html", b"", "text/html"),
        ("", "http://www.foo.com/", b"<html></html>", "text/html"),
        ("text/plain", "http://www.foo.com/foo.html", b"<html></html>", "text/html"),
        ("text/plain", "http://www.foo.com/foo.png", b"<html></html>", "text/html"),
        ("", "http://www.foo.com/", b"", OCTET_STREAM),
    ]
    for declared, url, data, want in cases:
        assert resolve_content_type(declared, url, data) == want, (declared, url)
    # final case (:100-105): null declared type still resolves to SOMETHING
    assert resolve_content_type(None, "http://www.foo.com/", b"") is not None


def test_utf8_valid_doc_split_at_sniff_boundary():
    """A multibyte char straddling the 2000-byte sniff window must not
    flip detection to the windows-1252 default (mojibake for the whole
    document): the head is trimmed back to the last complete sequence."""
    from nutch_spark.functions.content import decode_content, guess_encoding

    data = b"x" * 1999 + "é tail é more".encode("utf-8")
    assert guess_encoding(data) == "utf-8"
    assert decode_content(data).endswith("é tail é more")


def test_trim_only_lead_byte_is_weak_evidence():
    """A window whose ONLY non-ASCII byte is its last byte is ambiguous —
    a truncated UTF-8 lead and a lone cp1252 'é' are the same bytes. The
    trim-only clue must be sub-certain: a declared header (or meta sniff)
    overrides it, and only with no other clue does it beat the default."""
    from nutch_spark.functions.content import (
        CHUNK_SIZE, _detect_statistical, guess_encoding)

    cp1252 = b"x" * (CHUNK_SIZE - 1) + "é more café text".encode("cp1252")
    det = _detect_statistical(cp1252)
    assert det and det[0][0] == "utf-8" and det[0][1] < 100
    # declared charset wins over the ambiguous trim-only clue
    assert guess_encoding(cp1252, header_charset="windows-1252") == "windows-1252"
    # no other clue: the weak utf-8 clue still beats the blind default
    assert guess_encoding(cp1252) == "utf-8"
    # a window with OTHER validated multibyte content stays certain
    utf8 = ("é " + "x" * (CHUNK_SIZE - 4)).encode("utf-8") + "é tail".encode("utf-8")
    det2 = _detect_statistical(utf8)
    assert det2 and det2[0] == ("utf-8", 100)
    assert guess_encoding(utf8, header_charset="windows-1252") == "utf-8"


def test_unzip_best_effort_bare_magic_is_none():
    """GZIPUtils.unzipBestEffort returns null for a header truncated
    before the deflate stream; a bare magic prefix must not read as a
    zero-byte successful payload."""
    import gzip as _gzip

    from nutch_spark.functions.content import unzip_best_effort

    assert unzip_best_effort(b"\x1f\x8b") is None
    assert unzip_best_effort(b"\x1f\x8b\x08") is None
    # a genuinely EMPTY payload still decodes to b''
    assert unzip_best_effort(_gzip.compress(b"")) == b""
