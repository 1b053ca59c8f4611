"""Tests for the round-2 surface: C8-C10 content kernels, S8 ARC import,
S9 DMOZ import, R10 outlink following, duplicate clustering."""

import gzip
import zlib

import pytest
from pyspark.sql import functions as F

from nutch_spark.functions.content import (
    decode_content, guess_encoding, inflate_best_effort, magic_type,
    resolve_content_type, sniff_charset_meta, unzip_best_effort,
    url_extension_type,
)
from nutch_spark.sources.arc import (
    parse_arc_record, read_arc, split_arc_members, write_arc_file,
)
from nutch_spark.sources.dmoz import (
    md5_hashcode, parse_dmoz_text, read_dmoz, subset_selected,
)


# ---------------------------------------------------------------------------
# C8 charset
# ---------------------------------------------------------------------------

def test_sniff_meta_charset():
    html = b'<html><head><meta http-equiv="Content-Type" content="text/html; charset=GB2312"></head>'
    assert sniff_charset_meta(html) == "GB2312"
    # single quotes accepted (NUTCH-1006)
    html2 = b"<meta http-equiv='content-type' content='text/html; charset=utf-8'>"
    assert sniff_charset_meta(html2) == "utf-8"
    assert sniff_charset_meta(b"<html>no meta</html>") is None
    # meta past CHUNK_SIZE is not seen (reference scans first 2000 bytes)
    far = b"x" * 2100 + b'<meta http-equiv="content-type" content="charset=utf-8">'
    assert sniff_charset_meta(far) is None


def test_guess_encoding_priority():
    # BOM (a certain detect clue) wins over meta
    bom = b"\xef\xbb\xbf" + b'<meta http-equiv="content-type" content="charset=gbk">'
    assert guess_encoding(bom) == "utf-8"
    # header outranks the in-document meta tag — the reference's clue order
    # (EncodingDetector header clue :191, HtmlParser sniff appended after,
    # HtmlParser.java:155-157); alias resolution applies to the header
    meta = b'<meta http-equiv="content-type" content="text/html; charset=gbk">'
    assert guess_encoding(meta, header_charset="iso-8859-1") == "windows-1252"
    # meta sniff used when no header (GBK -> GB18030 mislabel map, :145)
    assert guess_encoding(meta) == "gb18030"
    # header when no meta (alias resolution applies)
    assert guess_encoding(b"plain ascii", header_charset="ISO-8859-1") == "windows-1252"
    # strict multibyte UTF-8 is a certain detect clue (beats the header)
    assert guess_encoding("héllo".encode("utf-8"), header_charset="gbk") == "utf-8"
    assert guess_encoding("héllo".encode("utf-8")) == "utf-8"
    # default
    assert guess_encoding(b"\xfd\xff binary-ish \x81") == "windows-1252"


def test_decode_content_roundtrip():
    txt = "中文 content ok"
    data = ('<meta http-equiv="content-type" content="charset=gb18030">' + txt).encode("gb18030")
    assert txt in decode_content(data)
    assert decode_content(None) is None


# ---------------------------------------------------------------------------
# C9 gzip/deflate
# ---------------------------------------------------------------------------

def test_unzip_roundtrip_and_truncated():
    payload = b"hello web archive " * 500
    gz = gzip.compress(payload)
    assert unzip_best_effort(gz) == payload
    # truncated stream -> best-effort partial prefix, never None
    part = unzip_best_effort(gz[: len(gz) // 2])
    assert part is not None and payload.startswith(part) and len(part) > 0
    # garbage -> None
    assert unzip_best_effort(b"not gzip at all") is None
    assert unzip_best_effort(None) is None
    # size limit honored
    assert unzip_best_effort(gz, size_limit=100) == payload[:100]


def test_inflate_best_effort():
    payload = b"deflate me " * 100
    raw = zlib.compress(payload)[2:-4]  # raw deflate (no zlib header)
    assert inflate_best_effort(raw) == payload
    assert inflate_best_effort(zlib.compress(payload)) == payload  # zlib-wrapped fallback
    assert inflate_best_effort(b"\x00garbage\xff") in (None, b"", b"\x00")  # nothing real


# ---------------------------------------------------------------------------
# C10 MIME
# ---------------------------------------------------------------------------

def test_magic_and_extension():
    assert magic_type(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert magic_type(b"  <!DOCTYPE html><html>") == "text/html"
    assert magic_type(b"plain readable text") == "text/plain"
    assert magic_type(b"\x00\x01\x02\x03") == "application/octet-stream"
    assert url_extension_type("http://a.com/x/y.pdf?dl=1") == "application/pdf"
    assert url_extension_type("http://a.com/noext") is None


def test_resolve_content_type_order():
    # declared cleaned (params stripped)
    assert resolve_content_type("text/html; charset=utf-8", "http://a.com/x", b"<html>") == "text/html"
    # octet-stream declared -> url extension
    assert resolve_content_type("application/octet-stream", "http://a.com/p.png",
                                b"\x89PNG\r\n\x1a\n") == "image/png"
    # magic override: declared text/html but bytes are a PDF
    assert resolve_content_type("text/html", "http://a.com/x", b"%PDF-1.4 ...") == "application/pdf"
    # magic never downgrades to plain/octet (reference excludes those)
    assert resolve_content_type("text/html", "http://a.com/x", b"just words") == "text/html"
    # nothing declared, no extension -> magic
    assert resolve_content_type(None, "http://a.com/x", b"GIF89a...") == "image/gif"


def test_content_udfs(spark):
    df = spark.createDataFrame(
        [("http://a.com/x.html", "text/html; charset=utf-8",
          bytearray(gzip.compress(b"<html><p>hi</p></html>")))],
        "url string, declared string, raw binary",
    )
    from nutch_spark.functions.content import resolve_mime_udf, unzip_udf

    out = (
        df.withColumn("content", unzip_udf(F.col("raw")))
        .withColumn("mime", resolve_mime_udf(F.col("declared"), F.col("url"), F.col("content")))
        .collect()[0]
    )
    assert bytes(out["content"]) == b"<html><p>hi</p></html>"
    assert out["mime"] == "text/html"


# ---------------------------------------------------------------------------
# S8 ARC
# ---------------------------------------------------------------------------

def _arc_records(n=5):
    return [
        {"url": f"http://site{i % 2}.example.com/doc/{i}", "ip": "10.0.0.1",
         "archive_date": "20080101000000", "content_type": "text/html",
         "content": f"<html><p>doc {i}</p></html>".encode()}
        for i in range(n)
    ]


def test_arc_roundtrip(tmp_path):
    path = str(tmp_path / "t.arc.gz")
    recs = _arc_records()
    write_arc_file(path, recs)
    data = open(path, "rb").read()
    members = list(split_arc_members(data))
    assert len(members) == len(recs) + 1  # + version block
    parsed = [parse_arc_record(m) for m in members]
    assert parsed[0] is None  # filedesc skipped
    got = [p for p in parsed if p is not None]
    assert [g["url"] for g in got] == [r["url"] for r in recs]
    assert got[0]["content"] == recs[0]["content"]
    assert got[0]["declared_length"] == len(recs[0]["content"])


def test_arc_corrupt_member_skipped(tmp_path):
    path = str(tmp_path / "c.arc.gz")
    recs = _arc_records(3)
    write_arc_file(path, recs)
    data = open(path, "rb").read()
    # corrupt the middle: flip bytes inside the 3rd member (index 2 incl.
    # version block) far enough after its gzip header
    import gzip as _g
    blocks = []
    version = data  # rebuild properly instead: write members separately
    member_bytes = []
    pos = 0
    while True:
        nxt = data.find(b"\x1f\x8b", pos + 1) if pos else 0
        nxt2 = data.find(b"\x1f\x8b", nxt + 2)
        member_bytes.append(data[nxt: nxt2 if nxt2 > 0 else len(data)])
        if nxt2 < 0:
            break
        pos = nxt2 - 1
    assert len(member_bytes) == 4
    bad = bytearray(member_bytes[2])
    for i in range(12, min(len(bad) - 9, 40)):
        bad[i] ^= 0xFF
    corrupted = member_bytes[0] + member_bytes[1] + bytes(bad) + member_bytes[3]
    got = [parse_arc_record(m) for m in split_arc_members(corrupted)]
    urls = [g["url"] for g in got if g is not None]
    # first and last survive; the corrupted middle is skipped best-effort
    assert recs[0]["url"] in urls and recs[2]["url"] in urls


def test_read_arc_spark(spark, tmp_path):
    for f in range(2):
        write_arc_file(str(tmp_path / f"p{f}.arc.gz"), _arc_records(4))
    df = read_arc(spark, str(tmp_path / "*.arc.gz"))
    rows = df.collect()
    assert len(rows) == 8
    assert all(r["content_type"] == "text/html" for r in rows)
    from nutch_spark.sources.arc import arc_to_segment

    seg = arc_to_segment(df).collect()
    assert len(seg) == 8
    assert all(s["content_type"] == "text/html" for s in seg)


# ---------------------------------------------------------------------------
# S9 DMOZ
# ---------------------------------------------------------------------------

_DMOZ = """<?xml version="1.0" encoding="UTF-8"?>
<RDF xmlns:r="http://www.w3.org/TR/RDF/">
<Topic r:id="Top/Computers/Software">
  <link r:resource="http://sw.example.com/"/>
</Topic>
<ExternalPage about="http://sw.example.com/">
  <d:Title>Software Site</d:Title>
</ExternalPage>
<ExternalPage about="http://sw2.example.com/">
  <d:Title>Another</d:Title>
</ExternalPage>
<Topic r:id="Top/Adult/Stuff">
</Topic>
<ExternalPage about="http://adult.example.com/">
  <d:Title>Filtered</d:Title>
</ExternalPage>
<Topic r:id="Top/Sports">
</Topic>
<ExternalPage about="http://sports.example.com/">
  <d:Title>Sports</d:Title>
</ExternalPage>
</RDF>
"""


def test_dmoz_parse_and_filters():
    rows = parse_dmoz_text(_DMOZ)
    urls = [r["url"] for r in rows]
    assert "http://adult.example.com/" not in urls  # Top/Adult skipped
    assert "http://sw.example.com/" in urls and "http://sports.example.com/" in urls
    assert rows[0]["title"] == "Software Site"
    assert rows[0]["topic"] == "Top/Computers/Software"
    # includeAdult restores it
    urls_adult = [r["url"] for r in parse_dmoz_text(_DMOZ, include_adult=True)]
    assert "http://adult.example.com/" in urls_adult
    # topic regex (full match like Java matches())
    only_sports = parse_dmoz_text(_DMOZ, topic_pattern=r"Top/Sports.*")
    assert [r["url"] for r in only_sports] == ["http://sports.example.com/"]


def test_dmoz_subset_deterministic():
    urls = [f"http://h{i}.example.com/" for i in range(2000)]
    sel = [u for u in urls if subset_selected(u, subset_denom=8)]
    # deterministic and ~1/8
    assert sel == [u for u in urls if subset_selected(u, 8)]
    assert 2000 / 8 * 0.5 < len(sel) < 2000 / 8 * 1.6
    # skew changes the subset
    sel_skew = [u for u in urls if subset_selected(u, 8, skew=12345)]
    assert sel != sel_skew
    # int32 semantics: hashcode fits in int32
    assert -(1 << 31) <= md5_hashcode("http://x.com/") < (1 << 31)


def test_read_dmoz_spark(spark, tmp_path):
    p = tmp_path / "dmoz.rdf.u8"
    p.write_text(_DMOZ)
    df = read_dmoz(spark, str(p))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"http://sw.example.com/", "http://sw2.example.com/",
                         "http://sports.example.com/"}
    from nutch_spark.sources.dmoz import dmoz_seeds

    seeds = dmoz_seeds(df).collect()
    assert all(s["score"] == 1.0 for s in seeds)
    assert rows["http://sports.example.com/"]["topic"] == "Top/Sports"


# ---------------------------------------------------------------------------
# R10 outlink following
# ---------------------------------------------------------------------------

def test_select_followup_budget_and_order(spark):
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators.followup import (
        intended_outlinks_by_depth, select_followup_outlinks,
    )

    cfg = CrawlConfig(follow_outlinks_depth=2, follow_outlinks_num_links=2,
                      follow_outlinks_ignore_external=True)
    links = spark.createDataFrame(
        [("http://a.com/p", f"http://a.com/t{i}", i) for i in range(5)]
        + [("http://a.com/p", "http://ext.com/x", 99)],
        "url string, to_url string, offset int",
    )
    out = select_followup_outlinks(links, depth=0, cfg=cfg).collect()
    got = sorted(r["url"] for r in out)
    # effective cap = num.links (2), in outlink order; external dropped
    assert got == ["http://a.com/t0", "http://a.com/t1"]
    # past the depth limit nothing is followed
    assert select_followup_outlinks(links, depth=2, cfg=cfg).count() == 0
    # the reference's dead formula (documented quirk): depth 0 -> 4 at
    # divisor=2, num=2; depth 2 -> 0
    assert intended_outlinks_by_depth(0, cfg) == 4
    assert intended_outlinks_by_depth(2, cfg) == 0


def test_fetch_with_outlink_following(spark, corpus_tables):
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators.followup import fetch_with_outlink_following
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject

    cfg = CrawlConfig(num_partitions=4, fetcher_threads=4, topn=40,
                      fetcher_parse=True, follow_outlinks_depth=1,
                      follow_outlinks_num_links=3,
                      fetcher_server_delay_ms=10, fetch_duration_ms=1)
    seeds = corpus_tables["seeds"].limit(10)
    frontier = inject(None, seeds, cfg, 1_700_000_000_000)
    fl = generate(frontier, cfg, 1_700_000_000_000 + 1)
    res = fetch_with_outlink_following(
        fl, corpus_tables["web_graph"], corpus_tables["robots"],
        corpus_tables["raw_content"], cfg, cycle=1, start_ms=1_700_000_000_000,
    )
    n0 = fl.count()
    total = res["fetch_out"].count()
    assert total > n0  # depth-1 follow-ups actually fetched
    # no URL fetched twice across depths
    fetched = res["fetch_out"].select("url").collect()
    urls = [r["url"] for r in fetched]
    assert len(urls) == len(set(urls))
    res["cleanup"]()  # documented MUST-call contract: releases fetch+parse caches


def test_resize_media(spark):
    """REAL resize: the synth payload is an actual image (8x8 RGB), the
    kernel decodes it, 2x2 box-filters, and re-encodes as PPM — output
    dims come from the decoded array, pixels are floor-means."""
    import numpy as np

    from nutch_spark.functions.imaging import decode_ppm
    from nutch_spark.operators.media import (
        resize_media, synth_media_table, synth_pixels)

    refs = ["http://img.example-cdn.com/7.jpg", "http://cdn.example.com/v/9.mp4"]
    out = resize_media(synth_media_table(spark, refs), scale=2).collect()
    assert len(out) == 1  # only images resize
    r = out[0]
    assert (r["width"], r["height"]) == (4, 4)
    got = decode_ppm(bytes(r["payload"]))
    px = synth_pixels(7).astype(np.uint32)
    want = (px.reshape(4, 2, 4, 2, 3).sum(axis=(1, 3)) // 4).astype(np.uint8)
    assert (got == want).all()


# ---------------------------------------------------------------------------
# duplicate clustering
# ---------------------------------------------------------------------------

def test_duplicate_clusters_transitive(spark):
    from nutch_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        "a long, b long",
    )
    got = {r["doc_id"]: r["component"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20, 24: 20}


def test_duplicate_clusters_from_minhash(spark, corpus_tables):
    """End-to-end: exact+near pairs over a small planted corpus collapse to
    components keyed by the minimum doc id."""
    from nutch_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(100, 200), (200, 300), (5, 6)], "a long, b long"
    )
    comp = duplicate_clusters(pairs)
    groups = (
        comp.groupBy("component").agg(F.count("*").alias("n")).collect()
    )
    sizes = sorted(g["n"] for g in groups)
    assert sizes == [2, 3]


# ---------------------------------------------------------------------------
# L3 Loops
# ---------------------------------------------------------------------------

def test_find_loops_rings_and_chains(spark):
    """3-ring A->B->C->A found at depth 2; 2-cycle found at depth 1 (pass
    one); pure chains never found; loop_set = first-hop edges on a cycle."""
    from nutch_spark.operators.webgraph import find_loops

    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "A"),          # 3-ring
         ("X", "Y"), ("Y", "X"),                      # 2-cycle
         ("P", "Q"), ("Q", "R"), ("R", "S")],         # chain
        "src string, dst string",
    )
    got = {r["url"]: (list(r["loop_set"]), r["n_loops"])
           for r in find_loops(edges, depth=2).collect()}
    assert got["A"] == (["B"], 1)
    assert got["B"] == (["C"], 1)
    assert got["C"] == (["A"], 1)
    assert got["X"] == (["Y"], 1)
    assert got["Y"] == (["X"], 1)
    assert "P" not in got and "Q" not in got and "R" not in got

    # depth=1 finds only the 2-cycle (reference: depth passes bound cycle
    # length at depth+1 links)
    got1 = {r["url"] for r in find_loops(edges, depth=1).collect()}
    assert got1 == {"X", "Y"}


def test_find_loops_inlink_gate(spark):
    """Routes only seed from nodes WITH inlinks (Loops.java:261-263): a
    source-only node on a cycle-free path seeds nothing."""
    from nutch_spark.operators.webgraph import find_loops

    edges = spark.createDataFrame(
        [("S", "A"), ("A", "B"), ("B", "A")], "src string, dst string"
    )
    got = {r["url"] for r in find_loops(edges, depth=2).collect()}
    assert got == {"A", "B"}  # S has no inlinks -> no route; A,B cycle


# ---------------------------------------------------------------------------
# X12 parse-js
# ---------------------------------------------------------------------------

def test_extract_js_links():
    from nutch_spark.operators.parse import extract_js_links

    script = (
        'var a = "/rel/page.html";\n'
        "var b = 'www.other.com/x.y';\n"
        'var c = "justaword";\n'           # fails URI full-match (no / or .)
        'var d = "u.php?a=1&amp;b=2";\n'
        'var e = "http://abs.example.com/z.html";'
    )
    got = extract_js_links(script, "http://js.example.com/dir/app.js")
    assert got == [
        "http://js.example.com/rel/page.html",
        "http://www.other.com/x.y",
        "http://js.example.com/dir/u.php?a=1&b=2",
        "http://abs.example.com/z.html",
    ]


def test_js_mime_dispatch(spark):
    from nutch_spark.operators.parse import extract_documents_by_mime

    df = spark.createDataFrame(
        [("http://a.com/s.js", 'var x = "/f/1.html";', "application/javascript"),
         ("http://a.com/p.html", "<p>hi</p>", "text/html"),
         ("http://a.com/b.bin", "zz", "application/octet-stream")],  # skipped
        "url string, content string, content_type string",
    )
    docs = {r["doc_id"]: r for r in extract_documents_by_mime(df).collect()}
    assert set(docs) == {"http://a.com/s.js", "http://a.com/p.html"}
    js_spans = docs["http://a.com/s.js"]["spans"]
    assert js_spans[0]["kind"] == "text"
    assert js_spans[1]["kind"] == "link"
    assert js_spans[1]["media_ref"] == "http://a.com/f/1.html"


def test_extract_zip_parse():
    """parse-zip member walk (ZipParser.java:56-109,
    ZipTextExtractor.java:79-134): entry order, extension dispatch,
    '<name> <text> ' concatenation, member outlinks; directory /
    extension-less / parser-less members skipped; corrupt archive -> None."""
    import io
    import zipfile

    from nutch_spark.operators.parse import extract_zip_parse

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("d/", b"")
        zf.writestr("a.html", '<p>one  two</p><a href="http://x.com/1.html">go</a>')
        zf.writestr("NOEXT", "skipped")
        zf.writestr("b.txt", "three\n four ")
        zf.writestr("c.js", 'var u = "/rel/p.html";')
        zf.writestr("e.bin", b"\x00\x01")
    text, links = extract_zip_parse(buf.getvalue(), "http://h.com/p.zip")
    assert text == 'a.html one two b.txt three four c.js var u = "/rel/p.html"; '
    # html link raw href; js link resolved against member url (our js parser)
    assert links == [("http://x.com/1.html", "go"),
                     ("http://h.com/rel/p.html", "")]
    assert extract_zip_parse(b"PK\x03\x04 not a zip", "http://h.com/x.zip") is None


def test_zip_mime_dispatch(spark):
    import io
    import zipfile

    from nutch_spark.operators.parse import extract_documents_by_mime

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("m.txt", "hello zip")
    df = spark.createDataFrame(
        [("http://a.com/p.zip", bytearray(buf.getvalue()), "application/zip")],
        "url string, content binary, content_type string",
    )
    docs = extract_documents_by_mime(df).collect()
    assert len(docs) == 1
    assert docs[0]["spans"][0]["text"] == "m.txt hello zip "
