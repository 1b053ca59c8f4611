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
uniformly distributed by construction (hash buckets) — EXCEPT the guaranteed
mega-bucket of boilerplate exact-duplicates, which share every band bucket;
the default-on `bucket_cap` (rank-and-cap, _cap_buckets) bounds that join at
O(bands * cap^2) pairs so near-dup survives it without an exact-dedup-first
precondition.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from nutch_spark.checkpoints import iter_checkpoint
from nutch_spark.functions.similarity import DEFAULT_BUCKET_CAP

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def dedup_paragraphs(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", sep: str = "\n\n") -> DataFrame:
    """Corpus-wide paragraph dedup (the C4/RefinedWeb-style cleaning step):
    a paragraph survives only at its FIRST corpus occurrence — lowest
    (doc_id, position) — and each document is reassembled from its kept
    paragraphs in original order. Docs whose every paragraph is a dup
    elsewhere drop out (standard pipeline behavior).

    Plan shape: narrow posexplode; ONE exchange on the paragraph hash for
    the winner argmin (min of a struct — never null, so no rows are
    skipped; see PLANS §6.24) reused by the winner join; one exchange on
    doc_id for the reassembly. No all-pairs work anywhere — at 100 TB the
    shuffled volume is one pass of the exploded paragraphs."""
    import re as _re

    paras = documents.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("pos", "para"),
    ).withColumn("_h", F.md5(F.col("para")))
    winners = paras.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w"))
    # eqNullSafe, not ==: a NULL id sorts first in the min-struct and can
    # legitimately BE the winner; plain equality evaluates NULL==NULL to
    # NULL and would drop that paragraph from EVERY doc corpus-wide
    kept = paras.join(winners, "_h").filter(
        F.col(id_col).eqNullSafe(F.col(f"_w.{id_col}"))
        & (F.col("pos") == F.col("_w.pos"))
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
    )


def exact_duplicates(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (digest, n_docs, doc_ids)."""
    return (
        documents.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact_keep_first(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id doc per identical text.

    min_by hash-aggregate, not a row_number window (PLANS §6.18 shape): the
    partial aggregate collapses duplicate texts map-side BEFORE the wire —
    at high dup rates most rows never shuffle — and the reduce side is a
    hash agg instead of a whole-partition sort."""
    cols = documents.columns
    # order key wrapped in a struct: min_by SKIPS rows whose ordering expr
    # is NULL, but a struct is never null even when its field is — and
    # struct comparison puts a null field first (asc), matching the old
    # window's asc-nulls-first exactly (null-id docs win their group)
    return (
        documents.groupBy(F.md5(F.col(text_col)).alias("_digest"))
        .agg(F.min_by(F.struct(*cols), F.struct(F.col(id_col))).alias("_keep"))
        .select(*[F.col(f"_keep.{c}").alias(c) for c in cols])
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _md5_u64(strings) -> np.ndarray:
    """Little-endian uint64 of the first 8 md5 bytes per string (the shared
    token-hash primitive; replicated byte-for-byte by the DuckDB oracles)."""
    import hashlib

    md5 = hashlib.md5
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(md5(s.encode()).digest()[:8], "little")
    return out


def _segment_layout(counts: np.ndarray):
    """(starts-of-nonzero-segments, nonzero mask) for reduceat over a flat
    concatenation of variable-length per-doc lists."""
    starts = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts[:-1], out=starts[1:])
    nz = counts > 0
    return starts[nz], nz


def minhash_permutation_coeffs(num_perm: int = 64, seed: int = 42):
    """The (a, b) permutation coefficients — exposed so the DuckDB oracle can
    embed them as literals."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signatures(documents: DataFrame, num_perm: int = 64, shingle_k: int = 3,
                       seed: int = 42, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig: array<long>) — Arrow-batched vectorized minhash.

    Per batch: every UNIQUE shingle is md5-hashed exactly once (factorize +
    gather), all permutations run as one (num_perm x n_shingles) matrix op,
    and per-doc minima come from one minimum.reduceat — no per-doc Python
    loop in the hash/permute/min path. Permutation arithmetic is
    (a*h + b) wrapped mod 2^64 then mod (2^61-1) (uint64 overflow is part of
    the deterministic definition; the oracle replicates it in HUGEINT).
    Duplicate shingles need no dedup: min() is idempotent.
    """
    a, b = minhash_permutation_coeffs(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        docs = []
        for t in texts:
            toks = _TOKEN_RE.findall((t or "").lower())
            if len(toks) >= shingle_k:
                sh = [" ".join(toks[i:i + shingle_k]) for i in range(len(toks) - shingle_k + 1)]
            else:
                sh = [" ".join(toks)] if toks else []
            docs.append(sh)
        counts = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
        sig = np.zeros((len(docs), num_perm), dtype=np.int64)
        if counts.sum() > 0:
            flat = np.asarray([s for d in docs for s in d], dtype=object)
            codes, uniques = pd.factorize(flat)
            hv = _md5_u64(uniques)[codes]  # one md5 per unique shingle
            m = (np.outer(a, hv) + b[:, None]) % np.uint64(_MERSENNE)
            starts, nz = _segment_layout(counts)
            sig[nz] = np.minimum.reduceat(m, starts, axis=1).T.astype(np.int64)
        return pd.Series(sig.tolist())

    return documents.select(F.col(id_col).alias("doc_id"), mh(F.col(text_col)).alias("sig"))


def _cap_buckets(banded: DataFrame, bucket_cap: int | None,
                 key_cols: tuple[str, str], id_col: str = "doc_id") -> DataFrame:
    """Keep at most bucket_cap rows per band bucket, deterministically
    (rank by md5(id), tie id — DuckDB-replicable if an oracle ever needs
    to model the cap). At 100 TB a mega-bucket is GUARANTEED — N exact
    duplicates of one boilerplate page share every band bucket and the
    per-bucket self-join goes quadratic in N; the cap bounds it at
    O(bands * cap^2) pairs. Capture of sub-cap near-dup pairs is
    unaffected; pairs between capped-out members of a mega-cluster are
    the ones an exact-dedup-first pipeline already collapsed."""
    if bucket_cap is None:
        return banded
    w = Window.partitionBy(*key_cols).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col))
    return (
        banded.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= bucket_cap).drop("_r")
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16, rows: int = 4,
                        bucket_cap: int | None = DEFAULT_BUCKET_CAP) -> DataFrame:
    """Band the signatures; docs sharing any band bucket become candidates.
    Self-join happens per bucket only. bands*rows must cover the signature:
    a band slicing past the end yields an identical empty-slice bucket for
    EVERY doc, degenerating the per-bucket join into the full cross
    product — exactly the blowup this operator exists to avoid.
    bucket_cap (ON by default) hard-bounds pathological buckets — see
    _cap_buckets; None disables."""
    if bands <= 0 or rows <= 0:
        raise ValueError("bands and rows must be positive")
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(F.slice(F.col("sig"), i * rows + 1, rows).cast("string")),
            )
        ).alias("band", "bucket"),
    )
    banded = _cap_buckets(banded, bucket_cap, ("band", "bucket"))
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
                            num_perm: int = 64, bands: int = 16,
                            rows: int | None = None,
                            bucket_cap: int | None = DEFAULT_BUCKET_CAP,
                            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    # derive rows from num_perm by default and refuse a banding that
    # slices past the signature: out-of-range slices are identical empty
    # arrays, i.e. ONE shared bucket per band -> the full N^2 cross join
    if rows is None:
        if num_perm % bands:
            raise ValueError(f"bands={bands} does not divide num_perm={num_perm}")
        rows = num_perm // bands
    elif bands * rows > num_perm:
        raise ValueError(
            f"bands*rows={bands * rows} exceeds num_perm={num_perm}: "
            "trailing bands would hash an empty slice and bucket every doc "
            "together")
    sigs = minhash_signatures(documents, num_perm, id_col=id_col, text_col=text_col)
    pairs = lsh_candidate_pairs(sigs, bands, rows, bucket_cap)
    return minhash_jaccard(sigs, pairs).filter(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# n-gram jaccard (exact verification; also usable standalone on small sets)
# ---------------------------------------------------------------------------

def ngram_sets(documents: DataFrame, n: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, grams array<string>) via native split/transform — JVM-side.
    Tokenization IS functions/text.tokens_col, not a re-implementation, so
    the exact-jaccard verifier can never drift from the LSH/contamination
    tokenizer it verifies."""
    from nutch_spark.functions.text import tokens_col

    toks = tokens_col(F.col(text_col))
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
    """64-bit simhash per doc (Arrow-batched, vectorized: one md5 per unique
    token in the batch via factorize, bit votes as one matrix op, per-doc
    accumulation via add.reduceat — no per-token Python hashing)."""

    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        docs = [_TOKEN_RE.findall((t or "").lower()) for t in texts]
        counts = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
        out = np.zeros(len(docs), dtype=np.int64)
        if counts.sum() > 0:
            flat = np.asarray([t for d in docs for t in d], dtype=object)
            codes, uniques = pd.factorize(flat)
            uh = _md5_u64(uniques)
            shifts = np.arange(64, dtype=np.uint64)
            sign = (2 * ((uh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32) - 1)
            starts, nz = _segment_layout(counts)
            acc = np.add.reduceat(sign[codes], starts, axis=0)  # (n_nz, 64)
            bits = (acc > 0).astype(np.uint64)
            v = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
            out[nz] = v.astype(np.int64)
        return pd.Series(out)

    return documents.select(F.col(id_col).alias("doc_id"), sh(F.col(text_col)).alias("simhash"))


def simhash_band_bounds(max_hamming: int, total_bits: int = 64) -> list[tuple[int, int]]:
    """(start_bit, width) per band. Pigeonhole: a pair at hamming <= h has at
    least one of the h+1 bands untouched, so band-equality capture is
    GUARANTEED for hamming <= max_hamming (the round-1 fixed 4x16 banding
    only guaranteed h <= 3 and silently missed pairs beyond)."""
    n_bands = min(max_hamming + 1, total_bits)
    base, rem = divmod(total_bits, n_bands)
    bounds, start = [], 0
    for i in range(n_bands):
        w = base + (1 if i < rem else 0)
        bounds.append((start, w))
        start += w
    return bounds


def simhash_candidate_pairs(sigs: DataFrame, max_hamming: int = 3,
                            bucket_cap: int | None = DEFAULT_BUCKET_CAP) -> DataFrame:
    """Banded candidate generation over (doc_id, simhash) with capture
    guaranteed for pairs at hamming <= max_hamming; exact hamming attached.
    bucket_cap bounds a mega-bucket of co-fingerprinted docs (milder than
    the minhash case — 64-bit keys — but N identical docs still share
    every band); see _cap_buckets."""
    bounds = simhash_band_bounds(max_hamming)

    def band(s: int, w: int):
        shifted = F.shiftrightunsigned(F.col("simhash"), s)
        if w >= 64:
            # max_hamming=0 -> ONE full-width band: 2^64-1 overflows a
            # Spark long literal (the lit() would throw); the full value
            # needs no mask at all
            return shifted
        return shifted.bitwiseAND(F.lit((1 << w) - 1))

    band_keys = F.array(*[band(s, w) for s, w in bounds])
    banded = sigs.select(
        "doc_id", "simhash", F.posexplode(band_keys).alias("band", "key")
    )
    banded = _cap_buckets(banded, bucket_cap, ("band", "key"))
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
    return cand.select("a", "b", hamming.alias("hamming"))


def simhash_near_duplicates(documents: DataFrame, max_hamming: int = 3,
                            bucket_cap: int | None = DEFAULT_BUCKET_CAP,
                            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs at hamming <= max_hamming: banded candidates (capture
    guaranteed by h+1 banding), then exact hamming filter."""
    sigs = simhash_signatures(documents, id_col, text_col)
    return simhash_candidate_pairs(sigs, max_hamming, bucket_cap).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# duplicate clustering (pairs -> connected components)
# ---------------------------------------------------------------------------

def duplicate_clusters(pairs: DataFrame, max_iter: int = 20,
                       a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Near-dup PAIRS -> duplicate GROUPS: (doc_id, component) where
    component = min doc_id reachable through the pair graph. The keep-one-
    per-group policy at 100 TB needs components, not pairs (A~B, B~C must
    collapse to one group even when A~C was never a candidate pair).

    Hash-min label propagation: each round every node adopts the minimum
    label in its closed neighborhood; converges in O(diameter) rounds
    (near-dup clusters are shallow — chains longer than a few hops are
    rare), each round one self-contained shuffle pair (groupBy-min + join).
    Convergence is detected with a changed-labels count riding the loop
    (one action per round). localCheckpoint cuts the growing lineage so
    round N's plan does not replay rounds 0..N-1.

    Columns are doc_id (long) + component (long)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
    )
    # materialize once: every propagation round joins the edge set, and
    # without this the pair-generation subtree re-executes per round
    edges = iter_checkpoint(edges, eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    labels = iter_checkpoint(labels, eager=True)
    for _ in range(max_iter):
        # min label over the closed neighborhood (own + neighbors')
        neigh = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))).alias("component"),
                (F.col("n_comp") < F.col("component")).alias("_chg"),
            )
        )
        new_labels = iter_checkpoint(new_labels, eager=True)
        changed = new_labels.filter(F.coalesce(F.col("_chg"), F.lit(False))).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        # max_iter exhausted while labels were still moving: a duplicate
        # chain longer than max_iter hops would silently split into several
        # components (keep-one-per-group would then retain extra dupes)
        import warnings

        warnings.warn(
            f"duplicate_clusters: not converged after {max_iter} rounds — "
            "components may be split; raise max_iter (rounds needed = graph "
            "diameter)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("id").alias("doc_id"), "component")


# ---------------------------------------------------------------------------
# benchmark contamination (n-gram overlap decontamination check)
# ---------------------------------------------------------------------------

def ngram_contamination(documents: DataFrame, benchmark: DataFrame,
                        n: int = 8, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Benchmark-contamination detection: flag training documents sharing
    any word n-gram with a held-out benchmark/eval set (the standard
    decontamination pass — GPT-3 appendix C / PaLM-style 8-gram overlap —
    run before a crawl corpus becomes training data).

    Plan shape: each side explodes to its DISTINCT word n-grams keyed by
    md5 (fixed-width 32-char join key instead of arbitrarily long gram
    strings); candidates come from ONE equi-join on that hash — never
    all-pairs. The benchmark side (eval suites: thousands of docs vs a
    10^10-doc corpus) is broadcast, so the 100 TB training side joins
    map-side with NO shuffle at all; hash keys are uniform by construction
    so there is no skew to handle. Output: one row per contaminated
    training doc with the distinct-hit count and contaminated fraction.
    """
    from nutch_spark.functions.text import tokens_col

    def gram_hashes(df: DataFrame, with_total: bool) -> DataFrame:
        toks = tokens_col(F.col(text_col))
        n_toks = F.size(toks)
        # array_join(slice(...)) builds each gram in one call — measured 7x
        # faster than n separate element_at lookups per gram (35.5 -> 5.1 s
        # over the sf0.1 corpus' 236k distinct 8-grams)
        grams = F.when(
            n_toks >= n,
            F.transform(
                F.sequence(F.lit(1), n_toks - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        # pin the distinct-gram array behind a Generate barrier BEFORE
        # referencing it twice (size + explode): CollapseProject would
        # otherwise re-inline the whole gram construction into the
        # projection above the explode and re-evaluate it once per output
        # gram — measured 286.5 s vs 6.5 s for the same stage at sf0.1
        # (the §4.10 re-inlining disease; PLANS §6.25)
        from nutch_spark.functions.normalizers import with_column_once

        pinned = with_column_once(
            df.select(F.col(id_col), F.col(text_col)), "_dg",
            F.array_distinct(grams),
        )
        cols = [F.col(id_col)]
        if with_total:
            cols.append(F.size("_dg").alias("n_grams"))
        return pinned.select(*cols, F.explode("_dg").alias("_gram")).select(
            *([id_col, "n_grams"] if with_total else [id_col]),
            F.md5("_gram").alias("_h"),
        )

    train = gram_hashes(documents, with_total=True)
    bench = gram_hashes(benchmark, with_total=False).select("_h").distinct()
    hits = train.join(F.broadcast(bench), "_h")
    return hits.groupBy(id_col).agg(
        F.count("*").alias("n_hits"),
        F.first("n_grams").cast("long").alias("n_grams"),
        F.round(F.count("*") / F.first("n_grams"), 6).alias("contaminated_frac"),
    )
