"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, dot products computed JVM-side with
``F.zip_with`` + ``F.aggregate`` (codegen, no Python).  Scale path:
random-hyperplane LSH bucketing -- each vector hashes to a small bucket
key; candidate search is an equi-join on the bucket, turning O(n*q) into
O(candidate mass).  An IVF variant would swap the hash for a learned
centroid assignment; the plumbing (bucket column + equi-join) is identical.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k by cosine to a constant query vector.

    One narrow map + one global top-k (TakeOrderedAndProject -- no full
    sort, no shuffle of the table)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def _random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no numpy on executors)."""
    import random

    rnd = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rnd.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane LSH: sign bits of <v, plane_i> packed into an int."""
    planes = _random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        # disjoint powers of two, so + composes the bitmask (Column.__or__
        # is logical OR in PySpark, not bitwise)
        bit = F.when(dot(vec_col, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: only score vectors in the query's LSH bucket.

    At cluster scale the bucket column is precomputed/partitioned-on, so
    the probe is a partition-pruned scan instead of a full pass."""
    dim = dim or len(query_vec)
    planes = _random_hyperplanes(dim, n_planes)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qbits |= 1 << i
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    candidates = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes)).filter(
        F.col("_bucket") == F.lit(qbits)
    )
    scored = candidates.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 12,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket equi-join then
    exact cosine verification (id_a < id_b, cos >= threshold)."""
    with_bucket = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_bucket", lsh_bucket(F.col("_v"), dim, n_planes))
    a = with_bucket.alias("a")
    b = with_bucket.alias("b")
    return (
        a.join(b, on="_bucket")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(cosine(F.col("a._v"), F.col("b._v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
