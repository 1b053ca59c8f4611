"""URL-seen set: partitioned bloom sidecar + exact anti-join.

The reference has no explicit seen-set — a URL is "seen" iff it has a
frontier row, enforced implicitly by the updatedb group-by
(crawl/CrawlDbReducer.java:183-198). At 10^10 URLs the implicit version
means every cycle's candidate outlinks join against the full frontier.
The north_rule demands the explicit performance layer:

- a partitioned bloom bitmap (numpy uint8, k hashes via h1 + i*h2
  double-hashing over xxhash64 pairs), one bitmap row per bucket, built
  with applyInPandas — each bucket's URLs stream through one vectorized
  kernel, no driver collect;
- probe: broadcast-join candidates to their bucket's bitmap and test bits
  inside an Arrow UDF — false positives possible, false negatives not;
- survivors of the probe (the "maybe-new") then hit the exact left-anti
  join against the frontier. The bloom prunes the anti-join's big-side
  shuffle by the novelty rate, which at steady state is >90% of candidates.

Determinism: hashes are seed-fixed; bitmaps are pure functions of the URL
set, so N-core and 4N-core runs build identical sketches.
"""

from __future__ import annotations

from typing import Iterator

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
    lanes (vectorized; one pass over the batch)."""
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


def build_seen_sketch(frontier: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """frontier -> (bucket, bitmap, n_urls), one row per bucket."""
    bits, k = cfg.seen_bits_per_bucket, cfg.seen_num_hashes

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(bits // 8, dtype=np.uint8)
        pos = _hash_positions(pdf["url"], bits, k).ravel()
        np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [int(key[0])], "bitmap": [bitmap.tobytes()], "n_urls": [len(pdf)]}
        )

    return (
        frontier.select("url")
        .withColumn("bucket", _bucket_col(cfg))
        .groupBy("bucket")
        .applyInPandas(build, SKETCH_SCHEMA)
    )


def probe_seen_sketch(candidates: DataFrame, sketch: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Return candidates that are POSSIBLY-SEEN-filtered: only maybe-new rows
    survive (bloom negatives are definite negatives)."""
    bits, k = cfg.seen_bits_per_bucket, cfg.seen_num_hashes

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(urls: pd.Series, bitmaps: pd.Series) -> pd.Series:
        out = np.zeros(len(urls), dtype=bool)
        # group rows by identical bitmap object (one per bucket in practice)
        if len(urls) == 0:
            return pd.Series(out)
        pos = _hash_positions(urls.fillna(""), bits, k)  # (k, n)
        for i in range(len(urls)):
            bm = bitmaps.iat[i]
            if bm is None:
                out[i] = False
                continue
            arr = np.frombuffer(bm, dtype=np.uint8)
            p = pos[:, i]
            out[i] = bool(np.all(arr[p >> 3] & (1 << (p & 7))))
        return pd.Series(out)

    cand = candidates.withColumn("bucket", _bucket_col(cfg))
    joined = cand.join(F.broadcast(sketch.select("bucket", "bitmap")), "bucket", "left")
    return (
        joined.withColumn("_maybe_seen", maybe_seen(F.col("url"), F.col("bitmap")))
        .filter(~F.col("_maybe_seen"))
        .drop("bucket", "bitmap", "_maybe_seen")
    )


def new_urls(candidates: DataFrame, frontier: DataFrame, cfg: CrawlConfig,
             sketch: DataFrame | None = None) -> DataFrame:
    """Exact novelty: bloom pre-filter (if provided) then left-anti join.
    The anti-join is the source of truth; the sketch only prunes volume."""
    maybe_new = probe_seen_sketch(candidates, sketch, cfg) if sketch is not None else candidates
    return maybe_new.join(frontier.select("url"), "url", "left_anti")
