"""Bloom seen-set: no false negatives; anti-join exactness; determinism."""

from pyspark.sql import functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.operators.seen import build_seen_sketch, new_urls, probe_seen_sketch


def mk(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_no_false_negatives(spark):
    cfg = CrawlConfig(seen_buckets=4, seen_bits_per_bucket=1 << 16)
    seen = [f"http://h{i % 7}.com/p/{i}.html" for i in range(500)]
    frontier = mk(spark, seen)
    sketch = build_seen_sketch(frontier, cfg).cache()
    assert sketch.count() <= 4
    # every seen URL must be filtered out by the probe
    out = probe_seen_sketch(mk(spark, seen), sketch, cfg)
    assert out.count() == 0


def test_new_urls_exact(spark):
    cfg = CrawlConfig(seen_buckets=4, seen_bits_per_bucket=1 << 16)
    seen = [f"http://h{i % 7}.com/p/{i}.html" for i in range(300)]
    novel = [f"http://new{i}.com/x.html" for i in range(50)]
    frontier = mk(spark, seen)
    sketch = build_seen_sketch(frontier, cfg)
    got = {r.url for r in new_urls(mk(spark, seen + novel), frontier, cfg, sketch).collect()}
    assert got == set(novel)


def test_sketch_deterministic(spark):
    cfg = CrawlConfig(seen_buckets=4, seen_bits_per_bucket=1 << 16)
    urls = [f"http://h{i % 5}.com/p/{i}.html" for i in range(200)]
    s1 = {(r.bucket, bytes(r.bitmap)) for r in build_seen_sketch(mk(spark, urls), cfg).collect()}
    s2 = {(r.bucket, bytes(r.bitmap)) for r in
          build_seen_sketch(mk(spark, urls).repartition(7), cfg).collect()}
    assert s1 == s2
