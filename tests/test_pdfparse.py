"""parse-tika PDF analogue (operators/pdfparse.py): text-showing operator
recovery, string escapes, FlateDecode, Info /Title, the OutlinkExtractor
regex fallback (TikaParser.java:157-161), and MIME dispatch."""

import zlib

import pytest

from nutch_spark.operators.pdfparse import (
    extract_pdf,
    extract_text_outlinks,
    _parse_literal,
    _stream_text_parts,
)


def _wrap(ops: bytes, flate: bool = False, extra: bytes = b"") -> bytes:
    if flate:
        body, filt = zlib.compress(ops), b"/Filter /FlateDecode "
    else:
        body, filt = ops, b""
    return (b"%PDF-1.4\n1 0 obj\n<< " + filt + b"/Length "
            + str(len(body)).encode() + b" >>\nstream\n" + body
            + b"\nendstream\nendobj\n" + extra + b"%%EOF\n")


def test_not_a_pdf_is_failed_path():
    assert extract_pdf(b"GIF89a nope") is None
    assert extract_pdf(b"") is None


def test_tj_and_quote_operators():
    title, text, links = extract_pdf(
        _wrap(b"BT (hello) Tj (world) ' (again) \" ET"))
    assert text == "hello world again"
    assert title == ""
    assert links == []


def test_tj_array_concatenates_dropping_kerning():
    _, text, _ = extract_pdf(_wrap(b"BT [(ab)-250(cd) 12 (ef)] TJ ET"))
    assert text == "abcdef"


def test_literal_string_escapes():
    # octal, \( \) \\, named escapes, line continuation
    s, _ = _parse_literal(b"(a\\050b\\)c\\\\d\\ne\\\nf)", 0)
    assert s == "a(b)c\\d\ne" + "f"
    # balanced parens nest without escapes
    s, _ = _parse_literal(b"(a(b)c)", 0)
    assert s == "a(b)c"


def test_hex_strings():
    parts = _stream_text_parts(b"BT <68656c6c 6f> Tj ET")
    assert parts == ["hello"]
    # odd digit count pads with 0
    parts = _stream_text_parts(b"BT <889> Tj ET")
    assert parts == ["\x88\x90"]


def test_non_text_strings_ignored():
    # a string not followed by a text-showing operator is not text
    parts = _stream_text_parts(b"BT (skipme) foo (keep) Tj ET")
    assert parts == ["keep"]


def test_flatedecode_stream():
    _, text, _ = extract_pdf(_wrap(b"BT (inflated) Tj ET", flate=True))
    assert text == "inflated"


def test_title_from_info_dict():
    title, _, _ = extract_pdf(_wrap(
        b"BT (x) Tj ET",
        extra=b"2 0 obj\n<< /Title (My \\(quoted\\) doc) >>\nendobj\n"))
    assert title == "My (quoted) doc"


def test_outlink_extractor_regex():
    # OutlinkExtractor.java:60 URL_PATTERN over plain text
    text = "see http://a.example.com/x.html and https://b.example.org/y?z=1 end"
    assert extract_text_outlinks(text) == [
        "http://a.example.com/x.html", "https://b.example.org/y?z=1"]
    assert extract_text_outlinks("no urls here") == []


def test_pdf_outlinks_from_text():
    _, text, links = extract_pdf(
        _wrap(b"BT (visit http://h3.example.com/p.html today) Tj ET"))
    assert links == ["http://h3.example.com/p.html"]


@pytest.mark.usefixtures("spark")
def test_mime_dispatch_pdf(spark):
    from pyspark.sql import functions as F

    from nutch_spark.operators.parse import extract_documents_by_mime

    rows = [
        ("http://x.example.com/a.pdf",
         bytearray(_wrap(b"BT (doc a) Tj ET",
                         extra=b"2 0 obj\n<< /Title (TA) >>\nendobj\n")),
         "application/pdf"),
        ("http://x.example.com/bad.pdf", bytearray(b"not a pdf"),
         "application/pdf"),
    ]
    df = spark.createDataFrame(
        rows, "url string, content binary, content_type string")
    got = extract_documents_by_mime(df).select(
        "doc_id", "title", F.element_at("spans", 1)["text"].alias("text")
    ).collect()
    assert len(got) == 1  # FAILED path emits nothing
    assert got[0].doc_id == "http://x.example.com/a.pdf"
    assert got[0].title == "TA"
    assert got[0].text == "doc a"


def test_iter_streams_window_bounded_at_previous_object():
    """A neighboring object's /Length (or /FlateDecode) within 600 bytes
    must not be attributed to the next stream: the dict window is bounded
    at the previous endobj/endstream and takes the LAST /Length."""
    from nutch_spark.operators.pdfparse import _iter_streams

    s1, s2 = b"hello", b"0123456789abcdef"
    pdf = (b"1 0 obj<</Length 5>>stream\n" + s1 + b"\nendstream endobj "
           b"2 0 obj<<>>stream\n" + s2 + b"\nendstream endobj")
    assert list(_iter_streams(pdf)) == [s1, s2]

    import zlib
    z = zlib.compress(b"BT (x) Tj ET")
    pdf2 = (b"1 0 obj<</Filter /FlateDecode /Length %d>>stream\n" % len(z)
            + z + b"\nendstream endobj "
            b"2 0 obj<</Length 3>>stream\nraw\nendstream endobj")
    assert list(_iter_streams(pdf2)) == [b"BT (x) Tj ET", b"raw"]


def test_indirect_length_reference_falls_back_to_endstream_scan():
    """'/Length 8 0 R' is an indirect object reference (§7.3.10): its
    integer is an OBJECT NUMBER, not a byte count. Treating it as a
    direct length truncated the stream to 8 bytes of garbage; the parser
    must fall back to scanning for endstream."""
    import zlib

    from nutch_spark.operators.pdfparse import _iter_streams

    body = zlib.compress(b"BT (indirect length ok) Tj ET")
    pdf = (b"1 0 obj\n<< /Length 8 0 R /Filter /FlateDecode >>\nstream\n"
           + body + b"\nendstream\nendobj\n"
           b"8 0 obj\n" + str(len(body)).encode() + b"\nendobj\n")
    streams = list(_iter_streams(pdf))
    assert any(b"indirect length ok" in s for s in streams)

    # a DIRECT length is still honored exactly
    pdf2 = (b"1 0 obj\n<< /Length " + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n"
            + body + b"\nendstream\nendobj\n")
    streams2 = list(_iter_streams(pdf2))
    assert any(b"indirect length ok" in s for s in streams2)
