"""Approximate nearest neighbor over embedding columns.

Two tiers (the prompt's similarity-search requirement):
- brute-force cosine top-k (plans/vector_queries.py) — correctness baseline,
  broadcast-query cross join; fine when |queries| is small;
- random-hyperplane LSH here — the 100 TB path: each vector maps to a
  small bucket key (sign bits against H fixed hyperplanes), candidates
  only meet inside buckets (+ optional multi-probe neighboring buckets),
  then exact cosine reranks. One shuffle on bucket key instead of a
  quadratic cross join.

Hyperplanes are seeded-deterministic (numpy PRNG, fixed seed) and shipped
as literal arrays, so results are reproducible across runs and engines.
No Python UDFs: dot products are zip_with/aggregate expressions.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _dot_literal(vec: Column, plane: list[float]) -> Column:
    """<vec, plane> with the plane as a literal array (JVM fold)."""
    lit_plane = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec, lit_plane, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 6, seed: int = 42) -> Column:
    """Pack sign bits of <vec, plane_i> into an int bucket key."""
    planes = _hyperplanes(dim, n_planes, seed)
    out = F.lit(0)
    for i, plane in enumerate(planes):
        out = out + F.when(_dot_literal(vec, plane) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return out


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    n_a = F.sqrt(dot(a, a))
    n_b = F.sqrt(dot(b, b))
    return dot(a, b) / (n_a * n_b)


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Bucketed top-k: candidates share the query's LSH bucket (or, with
    multi-probe, a bucket within Hamming distance 1 — the standard recall
    boost: each query also probes the n_planes buckets reachable by
    flipping one sign bit). Exact cosine reranks inside the probed set.
    Returns (q_id, c_id, cos_sim, rank).

    Recall < 1.0 by construction; pytest checks recall against the
    brute-force baseline. Tuning: more planes = smaller buckets = cheaper
    + lower recall; multiprobe multiplies query-side keys (cheap: queries
    are the small broadcast side), not candidate storage.
    """
    from pyspark.sql import Window as W

    cand = vectors.repartition(
        vectors.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("c_norm"),
        lsh_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("q_norm"),
        lsh_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket0"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket0"),
            *[F.col("bucket0").bitwiseXOR(F.lit(2**i)) for i in range(n_planes)],
        )
    else:
        probes = F.array(F.col("bucket0"))
    q = q.select("q_id", "qv", "q_norm", F.explode(probes).alias("bucket"))
    scored = (
        cand.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("cos_raw", dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )
