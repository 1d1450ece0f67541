"""Similarity search over embedding columns.

* ``cosine_topk`` — brute-force cosine top-k: the correctness baseline.
  One scan, one narrow sort on the (rounded) similarity — Catalyst plans a
  TakeOrderedAndProject, so no full global sort materializes.
* ``lsh_buckets`` / ``lsh_topk`` — random-hyperplane LSH: each vector maps
  to a sign-bit bucket; queries probe only their own bucket (plus
  multi-probe neighbors at Hamming distance 1). This is the 100 TB path:
  the candidate set per query is |bucket| ≈ n / 2^planes instead of n.

Hyperplanes are generated from a seeded ``numpy`` RNG on the driver and
shipped as literal arrays — deterministic across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(vec: Column, query: list[float]) -> Column:
    """Cosine similarity against a literal query vector (JVM-side)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = _as_double(vec)
    qnorm = sum(x * x for x in query) ** 0.5
    return _dot(v, q) / (_norm(v) * F.lit(qnorm))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine similarity (rounded before ordering so
    ranking is deterministic across engines; ties break on id)."""
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), query), 7).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int = 6, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for a vector column given literal hyperplanes."""
    v = _as_double(vec)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(v, plane) >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return bucket


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Attach the LSH bucket id; downstream joins group by it."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    return df.withColumn("lsh_bucket", bucket_expr(F.col(vec_col), planes))


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's bucket (plus
    Hamming-1 neighbor buckets when ``multiprobe``)."""
    planes = hyperplanes(len(query), n_planes, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) >= 0:
            qbucket |= 1 << i
    candidates = [qbucket]
    if multiprobe:
        candidates += [qbucket ^ (1 << i) for i in range(n_planes)]

    bucketed = df.withColumn("lsh_bucket", bucket_expr(F.col(vec_col), planes))
    scored = bucketed.where(F.col("lsh_bucket").isin(candidates)).select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), query), 7).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)
