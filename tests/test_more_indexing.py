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


def test_duplicate_success_fetch_rows_index_once(spark):
    """fetch_out can carry a url twice with SUCCESS (fetchlist row + an
    in-thread redirect hop landing on it — the same duplication updatedb
    dedupes with max_by(seq)). The indexer must keep ONE fetch datum per
    url like IndexerMapReduce, not fan the document out into duplicate
    index entries; the newest fetch_ts wins."""
    from nutch_spark import schemas
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators.indexer import build_index

    url = "http://a.example.com/x"
    frontier = spark.createDataFrame(
        [(url, 2, 1.0, 1_000, "sig")],
        "url string, status int, score float, fetch_time long, signature string")
    fo = spark.createDataFrame(
        [(url, schemas.STATUS_FETCH_SUCCESS, 5_000, 100),
         (url, schemas.STATUS_FETCH_SUCCESS, 9_000, 120)],
        "url string, fetch_status int, fetch_ts long, content_length long")
    ptext = spark.createDataFrame([(url, "body text")], "url string, text string")
    pdata = spark.createDataFrame([(url, "T")], "url string, title string")
    idx = build_index(frontier, fo, ptext, pdata, None, CrawlConfig()).collect()
    assert len(idx) == 1
    assert idx[0]["tstamp"] == 9_000  # newest fetch wins
