"""TestMoreIndexingFilter port (plugin/index-more/src/test/.../
TestMoreIndexingFilter.java:36-105): content-type cleaning, mime parts,
the indexMimeTypeParts knob, and the Content-Disposition title reset."""

from dataclasses import replace

from pyspark.sql import functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.operators.indexer import _type_col, disposition_title_col


def _types(spark, cfg, content_type):
    df = spark.createDataFrame(
        [("http://www.example.com/", content_type)],
        "url string, content_type string")
    return df.select(
        _type_col(cfg, True, F.col("url")).alias("type")).first()["type"]


def test_content_type_cleaning(spark):
    # testContentType (:36-41): charset parameter stripped from the mime
    cfg = CrawlConfig()
    assert _types(spark, cfg, "text/html")[0] == "text/html"
    assert _types(spark, cfg, "text/html; charset=UTF-8")[0] == "text/html"


def test_mime_parts(spark):
    # testGetParts (:43-46): text/html -> [text, html]; with the default
    # indexMimeTypeParts the type field is [full, primary, sub]
    cfg = CrawlConfig()
    assert _types(spark, cfg, "text/html") == ["text/html", "text", "html"]


def test_no_parts_knob(spark):
    # testNoParts (:48-73): moreIndexingFilter.indexMimeTypeParts=false
    # leaves a single-valued type field
    cfg = replace(CrawlConfig(), more_index_mime_type_parts=False)
    assert _types(spark, cfg, "text/html") == ["text/html"]


def test_content_disposition_title(spark):
    # testContentDispositionTitle (:75-88) + resetTitle pattern order
    # (:283-287): quoted pattern (greedy) first, then the bare token
    rows = [
        ("filename=filename.ext", "filename.ext"),          # the test's case
        ('inline; filename="foo.ppt"', "foo.ppt"),           # header comment :273-275
        ("attachment; filename='a b.pdf'; x=y", "a b.pdf"),
        # greedy quoted form spans to the LAST quote (reference quirk)
        ('filename="a".ext; q="z"', 'a".ext; q="z'),
        ("inline", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(d,) for d, _ in rows], "content_disposition string")
    got = [r["t"] for r in df.select(
        disposition_title_col(F.col("content_disposition")).alias("t")
    ).collect()]
    assert got == [want for _, want in rows]
