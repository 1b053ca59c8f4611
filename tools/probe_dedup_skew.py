"""Skew-planted scale evidence for the dedup family (VERDICT r4 item 7).

Synthesizes an sf1-equivalent documents table (150k docs, ~10x the sf0.1
gate fixture) with the WORST-case dup profile for LSH: 10% of the corpus
is one byte-identical boilerplate page (a 15k-doc mega-cluster that shares
EVERY band bucket), plus 10% paragraph-level near-dups. Runs
paragraph_dedup and minhash_neardup, reporting wall seconds, total shuffle
WRITE bytes (Spark status REST — load-independent evidence, same method as
PLANS §5.3), bytes/row, and the candidate-pair count the default
bucket_cap produces vs the ~1.8x10^9 pairs (16 bands x 15k^2/2) the
uncapped join would have attempted.

usage: python tools/probe_dedup_skew.py [n_docs] [dup_frac]
prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
DUP_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10


def shuffle_write_bytes() -> int:
    base = "http://127.0.0.1:4040/api/v1"
    with urllib.request.urlopen(f"{base}/applications") as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages?status=complete") as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    from pyspark.sql import functions as F

    from nutch_spark.operators.dedup import (
        dedup_paragraphs, minhash_near_duplicates)
    from nutch_spark.session import get_spark

    spark = get_spark("probe_dedup_skew", master="local[32]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.enabled": "true"})

    n_mega = int(N_DOCS * DUP_FRAC)
    # deterministic corpus: unique docs get 3 distinct paragraphs keyed by
    # id; every 10th unique doc SHARES its middle paragraph (paragraph-level
    # dup pressure); the first n_mega docs are ONE byte-identical page
    ids = spark.range(N_DOCS).select(F.col("id").cast("long").alias("doc_id"))
    boiler = ("cookie notice terms of service all rights reserved "
              "subscribe to our newsletter " * 6).strip()
    shared_mid = "this exact middle paragraph repeats across the corpus"
    uniq_text = F.concat(
        F.format_string("intro words for document %d unique alpha", F.col("doc_id")),
        F.lit("\n\n"),
        F.when((F.col("doc_id") % 10) == 0, F.lit(shared_mid)).otherwise(
            F.format_string("middle body %d beta gamma delta epsilon", F.col("doc_id"))),
        F.lit("\n\n"),
        F.format_string("closing remarks %d zeta eta theta", F.col("doc_id")),
    )
    docs = ids.select(
        "doc_id",
        F.when(F.col("doc_id") < n_mega, F.lit(boiler)).otherwise(uniq_text)
        .alias("text"),
    ).repartition(64).cache()
    docs.count()

    out: dict = {"n_docs": N_DOCS, "mega_cluster": n_mega, "cores": 32}

    b0, t0 = shuffle_write_bytes(), time.time()
    n_para = dedup_paragraphs(docs).count()
    out["paragraph_dedup"] = {
        "wall_s": round(time.time() - t0, 2),
        "shuffle_write_bytes": shuffle_write_bytes() - b0,
        "rows_out": n_para,
    }
    out["paragraph_dedup"]["shuffle_bytes_per_row"] = round(
        out["paragraph_dedup"]["shuffle_write_bytes"] / N_DOCS, 1)

    b0, t0 = shuffle_write_bytes(), time.time()
    pairs = minhash_near_duplicates(docs, threshold=0.7).count()
    out["minhash_neardup"] = {
        "wall_s": round(time.time() - t0, 2),
        "shuffle_write_bytes": shuffle_write_bytes() - b0,
        "pairs_out": pairs,
        "uncapped_candidate_pairs_would_be": 16 * n_mega * (n_mega - 1) // 2,
    }
    out["minhash_neardup"]["shuffle_bytes_per_row"] = round(
        out["minhash_neardup"]["shuffle_write_bytes"] / N_DOCS, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
