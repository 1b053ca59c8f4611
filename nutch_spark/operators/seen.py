"""URL-seen set: partitioned bloom sidecar + exact anti-join.

The reference has no explicit seen-set — a URL is "seen" iff it has a
frontier row, enforced implicitly by the updatedb group-by
(crawl/CrawlDbReducer.java:183-198). At 10^10 URLs the implicit version
means every cycle's candidate outlinks join against the full frontier.
The north_rule demands the explicit performance layer:

- a partitioned bloom bitmap (numpy uint8, k hashes via h1 + i*h2
  double-hashing over md5 lanes), one bitmap row per bucket, built and
  UPDATED incrementally with a cogroup kernel — each cycle ORs only the
  new URLs into the previous cycle's bitmaps (no full-frontier rebuild);
- probe: COGROUP candidates with the sketch on bucket — the bucket's
  bitmap crosses into the Arrow kernel ONCE PER BUCKET, never per row
  (the round-1 per-row broadcast-join attach was ~bitmap_size x n_rows
  of Arrow traffic — a scale-killer at 10^8 candidates/cycle);
- routing: bloom-NEGATIVE candidates are definitely new (no join needed);
  bloom-POSITIVE candidates go to the exact left-anti join against the
  frontier, so bloom false positives are recovered, never dropped. The
  frontier anti-join's left side shrinks by the novelty rate.

Determinism: hashes are seed-fixed; bitmaps are pure functions of the
inserted URL set, so N-core and 4N-core runs build identical sketches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from nutch_spark.config import CrawlConfig

SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
        T.StructField("n_urls", T.LongType(), False),
    ]
)


def _bucket_col(cfg: CrawlConfig):
    return F.pmod(F.xxhash64(F.col("url"), F.lit(1)), F.lit(cfg.seen_buckets)).cast("int")


def _hash_positions(urls: pd.Series, bits: int, k: int) -> np.ndarray:
    """k bit positions per url via double hashing of two md5-derived 64-bit
    lanes (one md5 per url; the k positions are vectorized)."""
    import hashlib

    n = len(urls)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    for i, u in enumerate(urls):
        d = hashlib.md5(u.encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1
    ks = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) % np.uint64(bits)).astype(np.int64)


def update_seen_sketch(sketch: DataFrame | None, new_urls_df: DataFrame,
                       cfg: CrawlConfig) -> DataFrame:
    """OR new URLs' bits into the previous sketch (incremental). With
    sketch=None this is the full build. One cogroup kernel call per bucket;
    buckets without new URLs pass their bitmap through untouched."""
    bits, k = cfg.seen_bits_per_bucket, cfg.seen_num_hashes
    spark = new_urls_df.sparkSession
    if sketch is None:
        sketch = spark.createDataFrame([], SKETCH_SCHEMA)
    urls_b = new_urls_df.select("url").withColumn("bucket", _bucket_col(cfg))

    def build(key, url_pdf: pd.DataFrame, sk_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(sk_pdf):
            bitmap = np.frombuffer(sk_pdf["bitmap"].iat[0], dtype=np.uint8).copy()
            n_prev = int(sk_pdf["n_urls"].iat[0])
        else:
            bitmap = np.zeros(bits // 8, dtype=np.uint8)
            n_prev = 0
        if len(url_pdf):
            pos = _hash_positions(url_pdf["url"], bits, k).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [int(key[0])], "bitmap": [bitmap.tobytes()],
             "n_urls": [n_prev + len(url_pdf)]}
        )

    return (
        urls_b.groupBy("bucket")
        .cogroup(sketch.groupBy("bucket"))
        .applyInPandas(build, SKETCH_SCHEMA)
    )


def build_seen_sketch(frontier: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Full build: frontier -> (bucket, bitmap, n_urls), one row per bucket."""
    return update_seen_sketch(None, frontier, cfg)


def probe_seen_flags(candidates: DataFrame, sketch: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """candidates + boolean `maybe_seen`. False = DEFINITELY new (bloom has
    no false negatives); True = needs the exact check. The cogroup ships
    each bucket's bitmap into the kernel once — probe cost per candidate is
    one md5 + k bit tests, independent of bitmap size."""
    bits, k = cfg.seen_bits_per_bucket, cfg.seen_num_hashes
    cand = candidates.withColumn("bucket", _bucket_col(cfg))
    cols = candidates.columns
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def probe(key, cand_pdf: pd.DataFrame, sk_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf):
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        out = cand_pdf[cols].copy()
        if not len(sk_pdf) or sk_pdf["bitmap"].iat[0] is None:
            out["maybe_seen"] = False  # bucket never inserted -> all new
            return out
        arr = np.frombuffer(sk_pdf["bitmap"].iat[0], dtype=np.uint8)
        pos = _hash_positions(cand_pdf["url"].fillna(""), bits, k)  # (k, n)
        hit = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        out["maybe_seen"] = np.all(hit, axis=0)
        return out

    return (
        cand.groupBy("bucket")
        .cogroup(sketch.groupBy("bucket"))
        .applyInPandas(probe, out_schema)
    )


def probe_seen_sketch(candidates: DataFrame, sketch: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Back-compat: return only the definitely-new candidates (bloom
    negatives). False positives are NOT in this set — use probe_seen_flags
    + new_urls for the exact routing."""
    return probe_seen_flags(candidates, sketch, cfg).filter(
        ~F.col("maybe_seen")
    ).drop("maybe_seen")


def new_urls(candidates: DataFrame, frontier: DataFrame, cfg: CrawlConfig,
             sketch: DataFrame | None = None) -> DataFrame:
    """Exact novelty. With a sketch: bloom-negatives short-circuit (definite
    new, no join); bloom-positives — true hits AND false positives — take
    the exact left-anti join, so the result equals the sketchless anti-join
    exactly while the join's left side shrinks by the novelty rate."""
    if sketch is None:
        return candidates.join(frontier.select("url"), "url", "left_anti")
    flagged = probe_seen_flags(candidates, sketch, cfg)
    definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    needs_check = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = needs_check.join(frontier.select("url"), "url", "left_anti")
    return definite_new.unionByName(checked)
