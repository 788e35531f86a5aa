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
    """<vec, plane> with the plane as ONE array literal (JVM fold).

    A single Literal(ArrayType) node instead of a 64-node F.array(F.lit..)
    tree: with 16 plane dots per row the expression tree shrank ~64x and
    fresh-plan analysis time (what bench measures) dropped ~2x."""
    lit_plane = F.lit([float(x) for x in plane])
    return F.aggregate(
        F.zip_with(vec, lit_plane, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
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
    n_planes: int = 8,
    n_bands: int = 2,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Banded bucketed top-k: n_bands independent hyperplane tables
    (band-AND within a band, OR across bands — the MinHash-banding shape
    in Hamming space). Candidates land in one bucket PER BAND (storage
    x n_bands); a query probes its bucket in every band, plus, with
    multi-probe, the n_planes 1-bit-flip neighbors within each band.
    Exact cosine reranks inside the probed set, and a band-level distinct
    dedupes candidates that collide in several bands before the rerank.
    Returns (q_id, c_id, cos_sim, rank).

    Recall < 1.0 by construction; pytest checks recall against the
    brute-force baseline. 100 TB tuning: probe fraction per band is
    (1 + n_planes)/2^n_planes — the r2 default (6 planes, 1 band)
    probed ~11% of the corpus per query; 8 planes x 2 bands probes
    ~7% with HIGHER recall (two independent chances to collide), and
    16 planes x 4 bands takes it to ~0.1% for billion-vector corpora.
    Bands multiply candidate storage, never query fan-out cost (queries
    are the small broadcast side).
    """
    from pyspark.sql import Window as W

    def band_key(vec: Column, band: int) -> Column:
        # distinct plane family per band via the seed; key prefixed with
        # the band id so buckets never collide across bands
        return F.concat(
            F.lit(f"{band}:"),
            lsh_bucket(vec, dim, n_planes, seed + 1000 * band).cast("string"),
        )

    # skew gate (multimodal rule): spread a single-file input before the
    # per-row bucket computation, but never full-shuffle a well-split scan
    parallelism = vectors.sparkSession.sparkContext.defaultParallelism
    if vectors.rdd.getNumPartitions() < parallelism:
        vectors = vectors.repartition(parallelism)
    # NARROW candidate stream: (bucket, c_id) only. Carrying the vectors
    # through the bucket explode + pair dedupe shuffles dim-sized arrays
    # per (candidate x band) and makes distinct() hash wide rows — measured
    # 3-4x slower at sf0.1 (r3 bench regression); vectors re-attach by id
    # AFTER the dedupe, when only true candidates remain.
    cand = vectors.select(
        F.col(id_col).alias("c_id"),
        F.explode(
            F.array(*[band_key(F.col(vec_col), b) for b in range(n_bands)])
        ).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        *[
            lsh_bucket(F.col(vec_col), dim, n_planes, seed + 1000 * b).alias(f"b{b}")
            for b in range(n_bands)
        ],
    )
    probe_keys = []
    for b in range(n_bands):
        base = F.col(f"b{b}")
        probe_keys.append(F.concat(F.lit(f"{b}:"), base.cast("string")))
        if multiprobe:
            probe_keys.extend(
                F.concat(F.lit(f"{b}:"), base.bitwiseXOR(F.lit(2**i)).cast("string"))
                for i in range(n_planes)
            )
    qp = q.select("q_id", F.explode(F.array(*probe_keys)).alias("bucket"))
    # a close pair collides in several bands — dedupe (narrow rows) first
    pairs = (
        cand.join(F.broadcast(qp), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    cv = vectors.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("c_norm"),
    )
    qv = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("q_norm"),
    )
    scored = (
        pairs.join(cv, "c_id")
        .join(F.broadcast(qv), "q_id")
        .withColumn(
            "cos_raw", dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm"))
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )
