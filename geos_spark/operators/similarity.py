"""Similarity search over embedding columns.

- brute-force cosine top-k (the exactness baseline): broadcast the
  query side, compute dot products with native ``F.aggregate`` /
  ``F.zip_with`` (sequential left-fold, deterministic), window top-k.
- LSH-bucketed variant (the scale path): random-hyperplane signatures
  bucket vectors; candidates searched per-bucket only.

All arithmetic in float64 with a deterministic fold order so an
external SQL oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic sequential-fold dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (q_id, rank, vec_id, cosine). Self-matches excluded.
    Ties break by vec_id ascending (deterministic).
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("v_norm"),
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("q"),
        norm(F.col(q_vec_col)).alias("q_norm"),
    )
    scored = (
        q.join(F.broadcast(v) if _small(vectors) else v, F.col("q_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            dot(F.col("q"), F.col("v"))
            / (F.col("q_norm") * F.col("v_norm")),
        )
        .select("q_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def _small(df: DataFrame) -> bool:
    # cheap structural heuristic: let Catalyst/AQE decide otherwise
    return False


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Add an LSH ``bucket`` column: sign pattern of n random
    hyperplanes (deterministic pseudo-random planes from the seed)."""
    import numpy as np

    rs = np.random.RandomState(seed)
    planes = rs.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        d = dot(F.col(vec_col), plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 16,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates share an LSH bucket.

    The scale path: each bucket is a tiny local join instead of a full
    cross product. Recall depends on n_planes; exactness is *not*
    guaranteed (approximate by design).
    """
    b = hyperplane_buckets(vectors, vec_col, n_planes, dim)
    left = b.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q"),
        norm(F.col(vec_col)).alias("q_norm"),
        "bucket",
    )
    right = b.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("v_norm"),
        "bucket",
    )
    scored = (
        left.join(right, "bucket")
        .where(F.col("q_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            dot(F.col("q"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")),
        )
        .select("q_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )
