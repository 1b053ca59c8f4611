"""jobs/nutch_tool.py — the bin/nutch standalone-tool dispatch (CLI smoke:
each command wires the right library function over parquet in/out)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jobs.nutch_tool import main  # noqa: E402


@pytest.fixture(scope="module")
def tool_data(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tool")
    crawldb = spark.createDataFrame(
        [("http://a.example.com/", 2, 1_000, 0, 86400, 1.5, "s1"),
         ("http://b.example.com/", 3, 2_000, 1, 86400, 0.5, "s2"),
         ("http://c.other.org/", 1, 3_000, 0, 86400, 2.5, "s3")],
        "url string, status int, fetch_time long, retries int, "
        "fetch_interval long, score float, signature string",
    )
    crawldb.write.parquet(f"{root}/crawldb")
    inlinks = spark.createDataFrame(
        [("http://t.example.com/", "http://a.example.com/", "one"),
         ("http://t.example.com/", "http://b.example.com/", "two")],
        "to_url string, from_url string, anchor string",
    )
    inlinks.write.parquet(f"{root}/linkdb")
    index = spark.createDataFrame(
        [("http://a.example.com/", "d1", 1.0),
         ("http://b.example.com/", "d1", 2.0),
         ("http://c.other.org/", "d2", 1.0)],
        "url string, digest string, boost double",
    )
    index.write.parquet(f"{root}/index")
    return str(root)


def _run(argv, capsys):
    rc = main(["--master", "local[4]"] + argv)
    assert rc == 0
    return capsys.readouterr().out


def test_readdb_stats_and_get(tool_data, capsys):
    out = _run(["readdb", f"{tool_data}/crawldb", "-stats"], capsys)
    assert "max_retries" in out
    out = _run(["readdb", f"{tool_data}/crawldb",
                "-url", "http://a.example.com/"], capsys)
    assert "http://a.example.com/" in out


def test_readdb_topn_writes_parquet(tool_data, capsys, spark, tmp_path):
    _run(["readdb", f"{tool_data}/crawldb", "-topn", "2",
          "--out", str(tmp_path / "top")], capsys)
    rows = spark.read.parquet(str(tmp_path / "top")).collect()
    assert len(rows) == 2
    assert {r.url for r in rows} == {"http://c.other.org/",
                                     "http://a.example.com/"}


def test_readlinkdb_dump_and_url(tool_data, capsys):
    out = _run(["readlinkdb", f"{tool_data}/linkdb", "-dump"], capsys)
    assert "fromUrl: http://a.example.com/ anchor: one" in out
    out = _run(["readlinkdb", f"{tool_data}/linkdb",
                "-url", "http://t.example.com/"], capsys)
    assert "one" in out and "two" in out


def test_solrclean_and_dedup(tool_data, capsys, spark, tmp_path):
    _run(["solrclean", f"{tool_data}/index", f"{tool_data}/crawldb",
          "--out", str(tmp_path / "clean")], capsys)
    kept = {r.url for r in spark.read.parquet(str(tmp_path / "clean")).collect()}
    assert kept == {"http://a.example.com/", "http://c.other.org/"}  # b gone
    out = _run(["solrdedup", f"{tool_data}/index"], capsys)
    assert "http://b.example.com/" in out  # d1 winner (boost 2.0)


def test_domainstats(tool_data, capsys):
    out = _run(["domainstats", f"{tool_data}/crawldb", "-mode", "domain"],
               capsys)
    assert "example.com" in out and "other.org" in out


def test_mergesegs_seg_ids_override_position(tool_data, capsys, spark,
                                             tmp_path):
    """Inputs without a 'segment' column are stamped by argument position,
    so 'newest per url' silently means last-listed; -seg-ids makes recency
    explicit. Here the OLDER segment is listed last: positional stamping
    would resurrect its stale row, -seg-ids keeps the newer one."""
    spark.createDataFrame([("http://u/", "new")], "url string, v string") \
        .write.parquet(str(tmp_path / "segA"))
    spark.createDataFrame([("http://u/", "stale")], "url string, v string") \
        .write.parquet(str(tmp_path / "segB"))
    out = str(tmp_path / "merged")
    _run(["mergesegs", str(tmp_path / "segA"), str(tmp_path / "segB"),
          "-seg-ids", "20240102000000", "20240101000000", "--out", out],
         capsys)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].v == "new"

    # mismatched id count is an argument error, not a silent mis-stamp
    with pytest.raises(SystemExit):
        main(["--master", "local[4]", "mergesegs", str(tmp_path / "segA"),
              str(tmp_path / "segB"), "-seg-ids", "1", "--out", out])


def test_fileproto_cli(tool_data, capsys, tmp_path):
    f = tmp_path / "doc.html"
    f.write_text("<html><head><title>FP</title></head><body>b</body></html>")
    out = _run(["fileproto", f"file://{f}", "-dumpContent"], capsys)
    assert "200" in out and "FP" in out
    out = _run(["fileproto", f"file://{tmp_path}/missing.html"], capsys)
    assert "404" in out


def test_parsechecker_cli(tool_data, capsys, tmp_path):
    html = tmp_path / "p.html"
    html.write_text(
        "<html><head><title>T1</title></head><body>"
        '<a href="http://x.example.com/">x</a></body></html>')
    out = _run(["parsechecker", str(html), "http://site.example.com/p",
                "-dumpText"], capsys)
    assert "T1" in out


def test_indexchecker_cli(tool_data, capsys, tmp_path):
    html = tmp_path / "q.html"
    html.write_text("<html><head><title>T2</title></head><body>b</body></html>")
    out = _run(["indexchecker", str(html), "http://site.example.com/q"], capsys)
    assert "title" in out and "T2" in out


def test_dataset_build_cli(tool_data, capsys, spark, tmp_path):
    docs = spark.createDataFrame(
        [(i,
          "the and of to in is that for with was " * 4 + f"doc {i}",
          f"src{i % 3}")
         for i in range(30)]
        + [(100 + i, "le la les et des est pour dans que une " * 4, "srcX")
           for i in range(3)],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(str(tmp_path / "docs"))
    _run(["dataset", str(tmp_path / "docs"), "-quota", "5",
          "-valFrac", "0.1", "--out", str(tmp_path / "manifest")], capsys)
    rows = spark.read.parquet(str(tmp_path / "manifest")).collect()
    # french docs gated out; quota 5 per source over 3 english sources
    assert len(rows) == 15
    assert all(r.lang_pred == "en" and r.split in ("train", "val")
               for r in rows)
