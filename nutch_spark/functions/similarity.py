"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: native F.zip_with/F.aggregate dot products —
  JVM-side, no UDF; exact baseline;
- LSH-bucketed ANN: random-hyperplane signatures (sign of dot with seeded
  gaussian planes) -> candidates share a bucket -> exact cosine within
  bucket only. The scale path: the cross join is confined to buckets, and
  the planes are a broadcast literal.

Embedding-cosine near-dup dedup = ann_cosine_topk with a threshold filter.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k neighbors per query (cross join + window). Baseline —
    quadratic; use ann_cosine_topk at scale."""
    e = embeddings.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("nn_vec"))
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec"))
    scored = q.crossJoin(e).select(
        "q_id", "nn_id", F.round(cosine_col(F.col("q_vec"), F.col("nn_vec")), 6).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id from random hyperplanes (broadcast literal)."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in planes
    ]
    bucket = F.lit(0)
    for b in bits:
        bucket = bucket * 2 + b
    return bucket


def ann_cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, n_planes: int = 8,
    dim: int | None = None, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine only within the query's bucket.
    Recall < 1.0 by design; multiprobe = union over plane subsets if needed."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("nn_vec"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec"),
        lsh_bucket_col(F.col(q_vec_col), planes).alias("bucket"),
    )
    scored = q.join(e, "bucket").select(
        "q_id", "nn_id", F.round(cosine_col(F.col("q_vec"), F.col("nn_vec")), 6).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                              n_planes: int = 8, seed: int = 42,
                              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs via bucketed self-join."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    l, r = e.alias("l"), e.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"), F.col("r.id").alias("b"),
            F.round(cosine_col(F.col("l.vec"), F.col("r.vec")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
