"""URL-seen set: partitioned bloom sidecar + exact anti-join.

The reference has no explicit seen-set — a URL is "seen" iff it has a
frontier row, enforced implicitly by the updatedb group-by
(crawl/CrawlDbReducer.java:183-198). At 10^10 URLs the implicit version
means every cycle's candidate outlinks join against the full frontier.
The north_rule demands the explicit performance layer:

- a partitioned bloom bitmap (numpy uint8, k hashes via h1 + i*h2
  double-hashing over two JVM-computed xxhash64 lanes — the lanes are
  whole-stage-codegen columns, so NO per-row Python hashing crosses the
  Arrow boundary; the v1 format hashed md5 per url in a Python loop at
  ~3.4 s/M urls/callsite), one bitmap row per bucket, built and
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

# format 3 = xxhash64-lane double hashing (JVM-side) + self-describing
# parameters: each row carries (buckets, bits, k) so a resumed crawl can
# VERIFY compatibility instead of OR-ing positions computed under different
# parameters into stale bitmaps (bloom false negatives — the one failure
# mode the routing contract forbids). A catalog whose sketch predates the
# fmt column is a v1 (md5-lane) sketch; fmt=2 lacked the parameter columns.
# Readers rebuild from the frontier on ANY mismatch (crawl_cycle does).
SKETCH_FMT = 3

SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
        T.StructField("n_urls", T.LongType(), False),
        T.StructField("fmt", T.IntegerType(), False),
        T.StructField("buckets", T.IntegerType(), False),
        T.StructField("bits", T.LongType(), False),
        T.StructField("k", T.IntegerType(), False),
    ]
)

# lane seeds are distinct from the bucket seed (1): with a shared seed the
# low bits of h1 are constant within a bucket (bucket = h mod buckets) and
# the k probe positions correlate, inflating the false-positive rate
_SEED_H1, _SEED_H2 = 1042, 2043


def _bucket_col(cfg: CrawlConfig):
    return F.pmod(F.xxhash64(F.col("url"), F.lit(1)), F.lit(cfg.seen_buckets)).cast("int")


def _lane_cols():
    """The two 64-bit hash lanes as JVM expressions (codegen, no Python).
    h2 is forced odd so the double-hash stride is coprime with 2^64."""
    u = F.coalesce(F.col("url"), F.lit(""))
    return [
        F.xxhash64(u, F.lit(_SEED_H1)).alias("_h1"),
        F.xxhash64(u, F.lit(_SEED_H2)).bitwiseOR(F.lit(1)).alias("_h2"),
    ]


def _positions_from_lanes(h1: pd.Series, h2: pd.Series, bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions from the JVM lanes — pure vectorized uint64
    wraparound arithmetic, no per-row work."""
    u1 = h1.to_numpy(dtype=np.int64).view(np.uint64)
    u2 = h2.to_numpy(dtype=np.int64).view(np.uint64)
    ks = np.arange(k, dtype=np.uint64)[:, None]
    return ((u1[None, :] + ks * u2[None, :]) % np.uint64(bits)).astype(np.int64)


def update_seen_sketch(sketch: DataFrame | None, new_urls_df: DataFrame,
                       cfg: CrawlConfig) -> DataFrame:
    """OR new URLs' bits into the previous sketch (incremental). With
    sketch=None this is the full build. One cogroup kernel call per bucket;
    buckets without new URLs pass their bitmap through untouched."""
    bits, k = cfg.seen_bits_per_bucket, cfg.seen_num_hashes
    spark = new_urls_df.sparkSession
    if sketch is None:
        sketch = spark.createDataFrame([], SKETCH_SCHEMA)
    urls_b = new_urls_df.select("url", *_lane_cols()).withColumn("bucket", _bucket_col(cfg))

    def build(key, url_pdf: pd.DataFrame, sk_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(sk_pdf):
            bitmap = np.frombuffer(sk_pdf["bitmap"].iat[0], dtype=np.uint8).copy()
            n_prev = int(sk_pdf["n_urls"].iat[0])
        else:
            bitmap = np.zeros(bits // 8, dtype=np.uint8)
            n_prev = 0
        if len(url_pdf):
            pos = _positions_from_lanes(url_pdf["_h1"], url_pdf["_h2"], bits, k).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [int(key[0])], "bitmap": [bitmap.tobytes()],
             "n_urls": [n_prev + len(url_pdf)], "fmt": [SKETCH_FMT],
             "buckets": [cfg.seen_buckets], "bits": [bits], "k": [k]}
        )

    return (
        urls_b.groupBy("bucket")
        .cogroup(sketch.groupBy("bucket"))
        .applyInPandas(build, SKETCH_SCHEMA)
    )


def sketch_if_current(sketch: DataFrame | None,
                      cfg: CrawlConfig | None = None) -> DataFrame | None:
    """None unless `sketch` is in the CURRENT wire format AND (when cfg is
    given) was built with cfg's sketch parameters. A v1 (md5-lane) sketch
    has no `fmt` column; fmt=2 lacked the parameter columns; and a sketch
    built under different (buckets, bits, k) maps URLs to different bit
    positions — OR-ing new positions into it (or probing it) yields bloom
    FALSE NEGATIVES, routing already-seen URLs past the exact anti-join.
    Any mismatch -> None, so callers rebuild from the frontier."""
    if sketch is None or not {"fmt", "buckets", "bits", "k"} <= set(sketch.columns):
        return None
    row = sketch.limit(1).collect()
    if row:  # an empty sketch is compatible with any parameters
        r = row[0]
        # fmt is gated even without cfg: a future format bump keeping the
        # same columns must not be accepted and OR'd into (stale-bitmap
        # false negatives) just because the caller omitted cfg
        if r["fmt"] != SKETCH_FMT:
            return None
        if cfg is not None and (
                r["buckets"] != cfg.seen_buckets
                or r["bits"] != cfg.seen_bits_per_bucket
                or r["k"] != cfg.seen_num_hashes):
            return None
    return sketch


def build_seen_sketch(frontier: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Full build: frontier -> (bucket, bitmap, n_urls), one row per bucket."""
    return update_seen_sketch(None, frontier, cfg)


def probe_seen_flags(candidates: DataFrame, sketch: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """candidates + boolean `maybe_seen`. False = DEFINITELY new (bloom has
    no false negatives); True = needs the exact check. The cogroup ships
    each bucket's bitmap into the kernel once — probe cost per candidate is
    k bit tests on JVM-precomputed hash lanes, independent of bitmap size."""
    bits, k = cfg.seen_bits_per_bucket, cfg.seen_num_hashes
    cand = candidates.select("*", *_lane_cols()).withColumn("bucket", _bucket_col(cfg))
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
        pos = _positions_from_lanes(cand_pdf["_h1"], cand_pdf["_h2"], bits, k)  # (k, n)
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
