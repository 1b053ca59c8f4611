"""TestInjector port (src/test/org/apache/nutch/crawl/TestInjector.java:
65-131) — the full two-pass scenario verbatim: inject 100 seeds carrying
nutch.score / nutch.fetchInterval / custom metadata, then re-inject a plain
list of 200 urls (100 overlapping) with db.injector.update=true and verify
the overlap rows keep their original interval, non-default score, and
metadata while the 100 new urls appear."""

import pytest

from nutch_spark.config import CrawlConfig
from nutch_spark.operators.inject import inject


@pytest.fixture(scope="module")
def seed_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("inject-ref")
    # TestInjector.java:69-74 — urls with tab-separated reserved + custom MD
    p1 = d / "urls1.txt"
    p1.write_text("".join(
        f"http://zzz.com/{i}.html\tnutch.score=2.{i}"
        f"\tnutch.fetchInterval=171717\tkey=value\n"
        for i in range(100)))
    # :89-95 — second pass: 100 new + the 100 overlapping urls, no metadata
    p2 = d / "urls2.txt"
    p2.write_text("".join(
        f"http://xxx.com/{i}.html\nhttp://zzz.com/{i}.html\n"
        for i in range(100)))
    return str(p1), str(p2)


def test_injector_two_pass_update(spark, seed_files):
    from jobs.crawl_job import parse_seed_file

    p1, p2 = seed_files
    cfg = CrawlConfig()

    # pass 1: inject into an empty crawldb (:75-86)
    frontier = inject(None, parse_seed_file(spark, p1), cfg, cur_time_ms=1_000)
    rows1 = {r["url"]: r for r in frontier.collect()}
    assert len(rows1) == 100
    assert set(rows1) == {f"http://zzz.com/{i}.html" for i in range(100)}
    # reserved keys override score/interval and stay out of metadata (:69-74)
    assert rows1["http://zzz.com/7.html"]["score"] == pytest.approx(2.7)
    assert rows1["http://zzz.com/7.html"]["fetch_interval"] == 171717
    assert rows1["http://zzz.com/7.html"]["metadata"] == {"key": "value"}

    # pass 2: db.injector.update=true (:96-104)
    cfg2 = CrawlConfig(inject_update=True)
    frontier2 = inject(frontier, parse_seed_file(spark, p2), cfg2, cur_time_ms=2_000)
    rows2 = {r["url"]: r for r in frontier2.collect()}

    # :108-115 — 200 records (100 overwritten in place, 100 new)
    assert len(rows2) == 200
    expected = ({f"http://zzz.com/{i}.html" for i in range(100)}
                | {f"http://xxx.com/{i}.html" for i in range(100)})
    assert set(rows2) == expected

    for i in (0, 42, 99):
        r = rows2[f"http://zzz.com/{i}.html"]
        # :122-124 — original custom fetch interval preserved (the injected
        # default-interval datum must NOT clobber it)
        assert r["fetch_interval"] == 171717
        # :126 — score stays the seed override, not db.score.injected
        assert r["score"] != pytest.approx(1.0)
        assert r["score"] == pytest.approx(float(f"2.{i}"))
        # :128 — metadata key=value preserved through the update overlay
        assert r["metadata"] == {"key": "value"}
        # res=old: first-pass fetch_time survives the update pass
        assert r["fetch_time"] == 1_000

    for i in (0, 99):
        r = rows2[f"http://xxx.com/{i}.html"]
        assert r["score"] == pytest.approx(1.0)
        assert r["fetch_interval"] == cfg.db_fetch_interval_default
        assert r["fetch_time"] == 2_000


def test_injector_default_mode_old_wins_entirely(spark, seed_files):
    """The closing if/else (Injector.java:233-238): without update mode the
    old datum survives UNTOUCHED — no metadata union, no score change —
    and db.injector.overwrite is dead code in this fork (its res=injected
    at :218 is clobbered at :238)."""
    from jobs.crawl_job import parse_seed_file

    p1, _ = seed_files
    cfg = CrawlConfig()
    frontier = inject(None, parse_seed_file(spark, p1), cfg, cur_time_ms=1_000)

    seeds2 = spark.createDataFrame(
        [("http://zzz.com/7.html", {"key": "OTHER", "fresh": "yes"})],
        "url string, metadata map<string,string>")
    for mode_cfg in (CrawlConfig(), CrawlConfig(inject_overwrite=True)):
        merged = inject(frontier, seeds2, mode_cfg, cur_time_ms=9_000)
        r = {x["url"]: x for x in merged.collect()}["http://zzz.com/7.html"]
        assert r["score"] == pytest.approx(2.7)
        assert r["fetch_interval"] == 171717
        assert r["fetch_time"] == 1_000
        assert r["metadata"] == {"key": "value"}  # no union in default mode


def test_injector_update_default_score_is_not_an_override(spark, tmp_path):
    """Injector.java:229 compares the injected score against
    db.score.injected as float==float. With db.score.injected=0.1 (not
    exactly representable) a double-literal comparison promotes the float
    column — float32(0.1) != double(0.1) — so a plain re-injected seed
    looked like a nutch.score override and clobbered the old row's
    accumulated score. Both sides must compare at float precision."""
    from pyspark.sql import functions as F

    from jobs.crawl_job import parse_seed_file

    p = tmp_path / "seeds.txt"
    p.write_text("http://zzz.com/0.html\n")
    cfg = CrawlConfig(db_score_injected=0.1)
    f1 = inject(None, parse_seed_file(spark, str(p)), cfg, cur_time_ms=1000)
    old = f1.withColumn("score", F.lit(5.0).cast("float"))

    cfg2 = CrawlConfig(db_score_injected=0.1, inject_update=True)
    f2 = inject(old, parse_seed_file(spark, str(p)), cfg2, cur_time_ms=2000)
    r = f2.collect()[0]
    assert r["score"] == pytest.approx(5.0)  # old accumulated score kept
