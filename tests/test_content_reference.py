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
