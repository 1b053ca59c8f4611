"""Deduplication suite for training-data pipelines over a documents table
(doc_id, text). First-class components per the build brief; the crawl-side
analogue is the signature dedupe (indexer/solr/SolrDeleteDuplicates.java:60+,
crawl/TextProfileSignature.java).

All operators are shuffle-minimal:
- exact: one groupBy on a JVM-side md5 — map-side partial agg applies;
- minhash LSH: shingle->minhash->band buckets->self-join within bucket only
  (never the full cross product); bands/rows tune recall;
- simhash: 64-bit fingerprint, hamming-ball candidate pairs via band join;
- ngram jaccard: verification kernel on LSH candidates, not all pairs.

At 100 TB the only full shuffle is the band-bucket exchange, whose keys are
uniformly distributed by construction (hash buckets), so no skew handling is
needed beyond AQE.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def exact_duplicates(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (digest, n_docs, doc_ids)."""
    return (
        documents.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact_keep_first(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id doc per identical text (window, no collect)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return documents.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(documents: DataFrame, num_perm: int = 64, shingle_k: int = 3,
                       seed: int = 42, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig: array<long>) — Arrow-batched vectorized minhash."""
    import hashlib

    MERSENNE = (1 << 61) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm).astype(np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm).astype(np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = _TOKEN_RE.findall((t or "").lower())
            if len(toks) >= shingle_k:
                shingles = {" ".join(toks[i:i + shingle_k]) for i in range(len(toks) - shingle_k + 1)}
            else:
                shingles = {" ".join(toks)} if toks else set()
            if not shingles:
                out.append([0] * num_perm)
                continue
            hv = np.fromiter(
                (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") for s in shingles),
                dtype=np.uint64, count=len(shingles),
            )
            # (a*h + b) mod p, min over shingles, vectorized over perms
            m = ((np.outer(a, hv) + b[:, None]) % np.uint64(MERSENNE)).min(axis=1)
            out.append([int(x) for x in m.astype(np.int64)])
        return pd.Series(out)

    return documents.select(F.col(id_col).alias("doc_id"), mh(F.col(text_col)).alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16, rows: int = 4) -> DataFrame:
    """Band the signatures; docs sharing any band bucket become candidates.
    Self-join happens per bucket only."""
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(F.slice(F.col("sig"), i * rows + 1, rows).cast("string")),
            )
        ).alias("band", "bucket"),
    )
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.bucket") == F.col("r.bucket"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def minhash_jaccard(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated jaccard per candidate pair from signature agreement."""
    sa = sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "a").join(sb, "b")
        .select(
            "a", "b",
            (
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
                / F.size("sig_a")
            ).alias("est_jaccard"),
        )
    )


def minhash_near_duplicates(documents: DataFrame, threshold: float = 0.7,
                            num_perm: int = 64, bands: int = 16, rows: int = 4,
                            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    sigs = minhash_signatures(documents, num_perm, id_col=id_col, text_col=text_col)
    pairs = lsh_candidate_pairs(sigs, bands, rows)
    return minhash_jaccard(sigs, pairs).filter(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# n-gram jaccard (exact verification; also usable standalone on small sets)
# ---------------------------------------------------------------------------

def ngram_sets(documents: DataFrame, n: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, grams array<string>) via native split/transform — JVM-side."""
    toks = F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^\w\s]+", " ")), r"\s+")
    toks = F.filter(toks, lambda t: t != F.lit(""))
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return documents.select(F.col(id_col).alias("doc_id"), grams.alias("grams"))


def ngram_jaccard_pairs(documents: DataFrame, pairs: DataFrame, n: int = 3,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact jaccard for given candidate pairs."""
    g = ngram_sets(documents, n, id_col, text_col)
    ga = g.select(F.col("doc_id").alias("a"), F.col("grams").alias("ga"))
    gb = g.select(F.col("doc_id").alias("b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return pairs.join(ga, "a").join(gb, "b").select(
        "a", "b", (inter / union).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_signatures(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit simhash per doc (Arrow-batched)."""
    import hashlib

    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _TOKEN_RE.findall((t or "").lower())
            if not toks:
                continue
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for tok in toks:
                h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little"))
                bits = (h >> shifts) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            bits = (acc > 0).astype(np.uint64)
            v = np.uint64(0)
            for bi in range(64):
                v |= np.uint64(bits[bi]) << np.uint64(bi)
            out[i] = np.int64(v)
        return pd.Series(out)

    return documents.select(F.col(id_col).alias("doc_id"), sh(F.col(text_col)).alias("simhash"))


def simhash_near_duplicates(documents: DataFrame, max_hamming: int = 3,
                            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Candidate generation by 16-bit band equality (any of 4 bands equal ->
    hamming <= 3 guaranteed captured), then exact hamming filter."""
    sigs = simhash_signatures(documents, id_col, text_col)
    band_keys = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ]
    )
    banded = sigs.select(
        "doc_id", "simhash", F.posexplode(band_keys).alias("band", "key")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
            F.col("l.simhash").alias("sa"), F.col("r.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.select("a", "b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
