"""RTF / OpenDocument extractor tests (operators/officeparse.py — the
stdlib office-format slice of the parse-tika surface)."""

from nutch_spark.operators.officeparse import (
    encode_odf, extract_odf, extract_rtf,
)

# control-word soup: font/color/style tables, info group with title,
# \'hh cp1252 escapes, a \uN unicode escape (8212 = em dash) with \uc1
# fallback byte, unknown \* destination, embedded pict data
RTF_DOC = (
    rb"{\rtf1\ansi\ansicpg1252{\fonttbl{\f0 Times New Roman;}}"
    rb"{\colortbl;\red0\green0\blue0;}"
    rb"{\info{\title My Title}{\author someone}}"
    rb"{\stylesheet{\s0 Normal;}}"
    rb"\uc1 Hello \b bold\b0  world \'e9 caf\'e9 " + b"\\u" + rb"8212? dash\par "
    rb"Second paragraph with http://rtf.example.com/x\par"
    rb"{\*\unknowndest should not appear}"
    rb"{\pict 0011223344}"
    rb" End.}"
)


def test_rtf_text_title_and_skips():
    title, text = extract_rtf(RTF_DOC)
    assert title == "My Title"
    assert "Hello bold world é café — dash" in text
    assert "Second paragraph with http://rtf.example.com/x" in text
    # table/destination/picture content never leaks into the text
    assert "should not appear" not in text
    assert "0011223344" not in text
    assert "Times New Roman" not in text and "Normal" not in text
    assert "someone" not in text  # info group is not body text
    assert "End." in text


def test_rtf_par_breaks_lines():
    _t, text = extract_rtf(rb"{\rtf1 a\par b\line c}")
    assert text == "a\nb\nc"


def test_rtf_uc_skips_fallback_bytes():
    # \uc2 -> TWO fallback bytes after \uN must be swallowed
    _t, text = extract_rtf(
        rb"{\rtf1\uc2 x" + b"\\u" + rb"8212ZZ y}")
    assert text == "x— y"


def test_rtf_non_rtf_returns_none():
    assert extract_rtf(b"plain text") is None
    assert extract_rtf(b"") is None


def test_odf_roundtrip_and_title():
    odt = encode_odf(["First para", "Second with http://odf.example.com/y", ""],
                     title="Doc T")
    title, text = extract_odf(odt)
    assert title == "Doc T"
    assert text == "First para\nSecond with http://odf.example.com/y"


def test_odf_rejects_non_zip_and_missing_content():
    import io
    import zipfile

    assert extract_odf(b"not a zip") is None
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
    assert extract_odf(buf.getvalue()) is None


def test_odf_escaped_entities():
    odt = encode_odf(["a < b & c > d"], title="T&T")
    title, text = extract_odf(odt)
    assert title == "T&T" and text == "a < b & c > d"
