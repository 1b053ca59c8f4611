"""Multi-cycle crawl + resume-from-checkpoint (north_rule requirements)."""

import pytest
from pyspark.sql import functions as F

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.plans.crawl_cycle import CrawlDriver, crawl
from nutch_spark.storage import Catalog


@pytest.fixture()
def cfg():
    return CrawlConfig(num_partitions=4, topn=2000, fetcher_threads=4,
                       fetch_duration_ms=10, fetcher_server_delay_ms=50,
                       seen_buckets=8, seen_bits_per_bucket=1 << 16)


def test_three_cycle_crawl_discovers_web(spark, corpus_tables, cfg, tmp_path):
    res = crawl(
        spark, str(tmp_path / "cat"), cfg,
        corpus_tables["seeds"], corpus_tables["web_graph"],
        corpus_tables["robots"], corpus_tables["raw_content"], depth=3,
    )
    assert len(res) == 3
    # frontier grows monotonically as outlinks are discovered
    assert res[0].frontier_size < res[1].frontier_size <= res[2].frontier_size
    # later cycles fetch newly discovered URLs
    assert res[1].fetched > 0
    cat = Catalog(str(tmp_path / "cat"))
    frontier = cat.table("frontier").read(spark)
    statuses = {r.status for r in frontier.select("status").distinct().collect()}
    assert schemas.STATUS_DB_FETCHED in statuses
    # lineage + metrics tables exist with per-partition/stage rows
    assert cat.table("lineage").read(spark).count() >= 12
    assert cat.table("fetch_metrics").read(spark).count() > 0


def test_resume_from_checkpoint_identical_seen_set(spark, corpus_tables, cfg, tmp_path):
    """Kill after cycle 1, resume, final seen set == uninterrupted run
    (SURVEY §5 resume test)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    args = (corpus_tables["seeds"], corpus_tables["web_graph"],
            corpus_tables["robots"], corpus_tables["raw_content"])

    crawl(spark, a, cfg, *args, depth=3)                       # uninterrupted

    crawl(spark, b, cfg, *args, depth=1)                       # "killed" after c1
    resumed = crawl(spark, b, cfg, *args, depth=3)             # resume
    assert [r.cycle for r in resumed] == [2, 3]                # c1 skipped

    fa = Catalog(a).table("frontier").read(spark)
    fb = Catalog(b).table("frontier").read(spark)
    sa = {r.url for r in fa.select("url").collect()}
    sb = {r.url for r in fb.select("url").collect()}
    assert sa == sb
    # full row equality, not just the URL set
    cols = ["url", "status", "retries", "fetch_interval", "signature"]
    ra = {tuple(r) for r in fa.select(*cols).collect()}
    rb = {tuple(r) for r in fb.select(*cols).collect()}
    assert ra == rb


def test_crawl_ordering_deterministic(spark, corpus_tables, cfg, tmp_path):
    """Same seed list + politeness budget -> identical fetch order
    (url, partition, seq) across independent runs."""
    def run(root):
        crawl(spark, root, cfg,
              corpus_tables["seeds"], corpus_tables["web_graph"],
              corpus_tables["robots"], corpus_tables["raw_content"], depth=2)
        fs = Catalog(root).table("fetch_status").read(spark)
        return sorted((r.url, r.partition_id, r.seq) for r in fs.collect())

    assert run(str(tmp_path / "r1")) == run(str(tmp_path / "r2"))


def test_resume_mid_cycle_crash_windows(spark, corpus_tables, cfg, tmp_path):
    """Two-phase frontier commit crash windows (storage.prepare/install).

    Window A: crash after the frontier data write but before any commit —
    redo recomputes the same snapshot id and overwrites in place.
    Window B: crash after the sketch commit but before the frontier pointer
    install — the sketch is a SUPERSET of the installed frontier (bloom OR
    is idempotent), so redoing the cycle keeps sketch ⊇ frontier and lands
    the same final state as an uninterrupted run."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    args = (corpus_tables["seeds"], corpus_tables["web_graph"],
            corpus_tables["robots"], corpus_tables["raw_content"])

    crawl(spark, a, cfg, *args, depth=2)  # uninterrupted run to compare

    # run cycle 1 normally, then simulate a cycle-2 crash in window B:
    # frontier PREPARED + sketch COMMITTED, pointer never installed
    crawl(spark, b, cfg, *args, depth=1)
    drv = CrawlDriver(spark, b, cfg, corpus_tables["web_graph"],
                      corpus_tables["robots"], corpus_tables["raw_content"])
    orig_install = drv.frontier_t.install
    drv.frontier_t.install = lambda pending: (_ for _ in ()).throw(
        RuntimeError("injected crash before pointer install"))
    with pytest.raises(RuntimeError, match="injected crash"):
        drv.run_cycle(2)
    drv.frontier_t.install = orig_install
    # the crash left cycle 1 as the last COMPLETE cycle
    assert drv.last_completed_cycle() == 1
    # sketch is ahead of the frontier pointer (window B) — still a superset

    resumed = crawl(spark, b, cfg, *args, depth=2)  # redo cycle 2
    assert [r.cycle for r in resumed] == [2]

    fa = Catalog(a).table("frontier").read(spark)
    fb = Catalog(b).table("frontier").read(spark)
    cols = ["url", "status", "retries", "fetch_interval", "signature"]
    assert ({tuple(r) for r in fa.select(*cols).collect()}
            == {tuple(r) for r in fb.select(*cols).collect()})

    # sketch ⊇ frontier invariant after the redo: probing every frontier
    # URL against the committed sketch yields zero bloom false negatives
    from nutch_spark.operators.seen import probe_seen_flags
    cat = Catalog(b)
    sketch = cat.table("seen_sketch").read(spark)
    frontier_urls = fb.select("url")
    misses = (probe_seen_flags(frontier_urls, sketch, cfg)
              .filter(~F.col("maybe_seen")).count())
    assert misses == 0


def test_snapshot_expiry_keeps_resume_intact(spark, corpus_tables, cfg, tmp_path):
    """snapshot_keep GC (CrawlDb.install current+old rotation / Iceberg
    expire_snapshots analogue): state tables keep only the newest K
    snapshots, old data dirs are gone from disk, and both resume and the
    final frontier are identical to a keep-everything run."""
    import os

    a, b = str(tmp_path / "keepall"), str(tmp_path / "gc")
    args = (corpus_tables["seeds"], corpus_tables["web_graph"],
            corpus_tables["robots"], corpus_tables["raw_content"])
    gc_cfg = CrawlConfig(**{**cfg.__dict__, "snapshot_keep": 2})

    crawl(spark, a, cfg, *args, depth=3)      # keep-all reference run
    crawl(spark, b, gc_cfg, *args, depth=2)   # "killed" after cycle 2
    cat = Catalog(b)
    front = cat.table("frontier")
    snaps = front.snapshots()
    assert len(snaps) == 2                    # current + old, like CrawlDb.install
    assert [s.tag for s in snaps] == ["cycle-1", "cycle-2"]
    # expired snapshot data dirs are actually gone from disk
    live = {os.path.basename(s.path) for s in snaps}
    on_disk = {d for d in os.listdir(front.root) if d.startswith("snap-")}
    assert on_disk == live  # no dead snap dirs linger

    resumed = crawl(spark, b, gc_cfg, *args, depth=3)  # resume past the GC
    assert [r.cycle for r in resumed] == [3]
    fa = Catalog(a).table("frontier").read(spark)
    fb = cat.table("frontier").read(spark)
    cols = ["url", "status", "retries", "fetch_interval", "signature"]
    assert ({tuple(r) for r in fa.select(*cols).collect()}
            == {tuple(r) for r in fb.select(*cols).collect()})
    # sketch table GC'd too
    assert len(cat.table("seen_sketch").snapshots()) == 2


def test_expire_snapshots_preserves_append_chain(spark, tmp_path):
    """An append snapshot is a logical union back to its base full commit:
    expire_snapshots must keep the whole retained chain alive. Trimming
    log[:-keep] blindly used to delete the base full commit's data while
    live appends still referenced it — read() silently lost its rows."""
    from nutch_spark.storage import Catalog

    t = Catalog(str(tmp_path / "cat")).table("ap")
    df = lambda i: spark.createDataFrame([(f"u{i}", i)], "url string, v int")  # noqa: E731
    t.commit(df(0), tag="full")           # full commit (the chain base)
    for i in (1, 2, 3):
        t.append(df(i), tag=f"a{i}")      # appends depending on the base
    assert t.expire_snapshots(keep=2) == 0  # whole chain must survive
    got = {r.url for r in t.read(spark).collect()}
    assert got == {"u0", "u1", "u2", "u3"}

    # unknown snapshot id is a KeyError, not a bare StopIteration
    import pytest as _pytest
    with _pytest.raises(KeyError):
        t.read(spark, snapshot_id=999)

    # a new FULL commit starts a fresh chain: older chain now expirable
    t.commit(spark.createDataFrame([("u9", 9)], "url string, v int"),
             tag="full2")
    assert t.expire_snapshots(keep=1) > 0
    assert {r.url for r in t.read(spark).collect()} == {"u9"}


def test_bench_corpus_host_ids_above_9999_do_not_collide(spark):
    """Spark's lpad TRUNCATES beyond the pad width: hid 12345 used to
    render as h1234..., colliding with hid 1234 and silently shrinking the
    bench corpus after inject's dedup."""
    from pyspark.sql import functions as F

    from nutch_spark.bench_corpus import _host

    df = spark.range(1).select(
        _host(F.lit(12345)).alias("big"), _host(F.lit(1234)).alias("small"),
        _host(F.lit(7)).alias("tiny"))
    r = df.collect()[0]
    assert r.big == "h12345.bench.example.com"
    assert r.small == "h1234.bench.example.com"
    assert r.tiny == "h0007.bench.example.com"
    assert r.big != r.small
