"""Similarity search over embedding columns (`array<float>`).

Two strategies:

- **Brute-force cosine top-k** (exact baseline): broadcast the query set,
  JVM-side dot products via ``zip_with``/``aggregate``, per-query top-k via a
  window.  Cost O(|Q|·N) — the right plan when the query set is small enough
  to broadcast, which is the common "find neighbours for this batch" shape.
- **Random-hyperplane LSH buckets** (scale path): h sign-bits from fixed
  seeded hyperplanes (embedded as literal arrays so the DuckDB oracle can
  replay them), equi-join on bucket, rank within bucket.  Trades recall for
  turning the O(|Q|·N) scan into a shuffle-on-bucket join; recall rises with
  fewer bits / more tables.

The RBF ``cross_kernel`` of the GP library is the same primitive
mathematically (a dense similarity between a query batch and a reference set);
these operators are its SQL-native counterpart (SURVEY §2.8).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbours for every query row.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken by
    neighbor_id so results are deterministic.  The query side is broadcast —
    no shuffle of the corpus.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def random_hyperplanes(dim: int, bits: int, seed: int = 11) -> np.ndarray:
    """Fixed hyperplanes for sign-LSH, deterministic in (dim, bits, seed).
    Rounded to 6 decimals so they can be embedded verbatim in oracle SQL."""
    rng = np.random.default_rng(seed)
    return np.round(rng.normal(size=(bits, dim)), 6)


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Bucket id = integer of sign bits of ⟨vec, plane_i⟩."""
    out = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        out = out + F.when(dot(vec, lit_plane) > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0)
        )
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.

    One shuffle on the bucket id; corpus is scanned once.  Recall depends on
    bits (2^bits buckets); callers needing recall guarantees should union
    several tables with different seeds.
    """
    dim = len(corpus.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", lsh_bucket(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
