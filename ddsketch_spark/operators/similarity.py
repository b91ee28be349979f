"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; hyperplane-LSH
bucketing is the scale path (candidates only within matching sign-pattern
buckets). Dot products and norms are computed with Catalyst higher-order
functions (zip_with + aggregate) -- sequential left-to-right float64
folds, which DuckDB's list_reduce reproduces bit-for-bit, giving these
queries value-level oracles despite being float math.

Scale notes (100 TB):
- probes are broadcast (tiny); the corpus is never self-joined;
- top-k uses a per-probe window over the (probe x corpus) product -- at
  scale swap in per-partition heaps (mapInPandas) + final merge, same
  semantics;
- LSH buckets bound candidate counts; plane count trades recall for cost.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ddsketch_spark.functions.hashing import MERSENNE61, hash_np, hash_params

EMB_DIM = 64
DEFAULT_PLANES = 8


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential float64 dot product: sum order = array order."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """(probe_id, rank, neighbor, cosine) exact top-k by cosine, ties broken
    by neighbor id (deterministic)."""
    # norms precomputed once per probe / per corpus row -- the higher-order
    # fold expressions are interpreted (not codegen'd), so evaluating the
    # probe norm per (probe x corpus) pair would dominate the plan
    p = probes.select(
        F.col(probe_id_col),
        F.col(vec_col).alias("__pvec"),
        norm_expr(F.col(vec_col)).alias("__pnorm"),
    )
    c = corpus.withColumn("__cnorm", norm_expr(F.col(vec_col)))
    joined = c.crossJoin(F.broadcast(p)).where(
        F.col(id_col) != F.col(probe_id_col)
    )
    scored = joined.select(
        F.col(probe_id_col),
        F.col(id_col).alias("neighbor"),
        (dot_expr(F.col("__pvec"), F.col(vec_col)) / (F.col("__pnorm") * F.col("__cnorm"))).alias("cosine"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(probe_id_col, "rank", "neighbor", "cosine")
    )


def hyperplanes(n_planes: int = DEFAULT_PLANES, dim: int = EMB_DIM, seed: int = 7):
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5)^dim derived
    from the shared integer hash family -- reproducible in SQL."""
    import numpy as np

    a, b = hash_params(1, seed)[0]
    idx = np.arange(n_planes * dim, dtype=np.int64)
    vals = hash_np(idx, a, b).astype(np.float64) / float(MERSENNE61) - 0.5
    return vals.reshape(n_planes, dim)


def lsh_bucket_expr(vec: Column, planes) -> Column:
    """Sign-pattern bucket id: bit j set iff dot(vec, plane_j) > 0."""
    acc = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(c)) for c in plane])
        acc = acc + F.when(dot_expr(vec, lit) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def lsh_ann(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    n_planes: int = DEFAULT_PLANES,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates share the probe's LSH bucket, reranked
    by exact cosine. Misses neighbors in other buckets -- that is the
    recall/cost tradeoff; plumbing (bucket join instead of cross join) is
    the 100 TB path."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, dim, seed)
    c = corpus.withColumn(
        "__bucket", lsh_bucket_expr(F.col(vec_col), planes)
    ).withColumn("__cnorm", norm_expr(F.col(vec_col)))
    p = probes.select(
        F.col(probe_id_col),
        F.col(vec_col).alias("__pvec"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("__bucket"),
        norm_expr(F.col(vec_col)).alias("__pnorm"),
    )
    joined = c.join(F.broadcast(p), "__bucket").where(
        F.col(id_col) != F.col(probe_id_col)
    )
    scored = joined.select(
        F.col(probe_id_col),
        F.col(id_col).alias("neighbor"),
        (dot_expr(F.col("__pvec"), F.col(vec_col)) / (F.col("__pnorm") * F.col("__cnorm"))).alias("cosine"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(probe_id_col, "rank", "neighbor", "cosine")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold -- the
    embedding near-dup operator. All-pairs within ``block_col`` blocks (or
    globally when None: test-scale / post-LSH candidates only)."""
    a = df.select(
        *( [block_col] if block_col else [] ),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("__va"),
        norm_expr(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        *( [block_col] if block_col else [] ),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("__vb"),
        norm_expr(F.col(vec_col)).alias("__nb"),
    )
    joined = a.join(b, [block_col] if block_col else []) if block_col else a.crossJoin(b)
    return (
        joined.where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (dot_expr(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(threshold))
    )
