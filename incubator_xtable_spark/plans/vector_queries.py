"""Similarity-search / embedding operators over `embeddings`
(vec_id BIGINT, embedding ARRAY<FLOAT> len 64, label INT).

Brute-force cosine top-k is the correctness baseline (oracle-checked);
the LSH-bucketed variant (operators/ann.py) is the scale path and is
pytest-verified for recall against brute force.

Determinism across engines: embeddings are float32; both sides cast
element-wise to double (exact) and fold sequentially in list order, so
dot products agree bit-for-bit; similarity values are additionally
rounded to 6 dp, and all orderings are fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.plans.common import t
from incubator_xtable_spark.plans.registry import register


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two float arrays (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(l2sq(a) * l2sq(b))


# ---------------------------------------------------------------------------
# brute-force cosine top-k (broadcast query set x all candidates)
# ---------------------------------------------------------------------------

KNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS q_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id AS c_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), scored AS (
  SELECT q_id, c_id,
         round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cos_sim,
         list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos_raw
  FROM q JOIN c ON q_id <> c_id
)
SELECT q_id, c_id, cos_sim, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT q_id, c_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, c_id) AS rn
  FROM scored
)
WHERE rn <= 5
"""


@register(
    "ann_bruteforce_topk",
    oracle=KNN_ORACLE,
    category="vector",
    description="brute-force cosine top-5 for 8 query vectors",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = t(spark, sf_dir, "embeddings")
    # precompute norms once per side: the join then evaluates only the dot
    # product per pair (3x less arithmetic than a naive cosine per pair)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.sqrt(l2sq(F.col("embedding"))).alias("q_norm"),
    )
    c = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("cv"),
        F.sqrt(l2sq(F.col("embedding"))).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn("cos_raw", dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm")))
        .withColumn("cos_sim", F.round(F.col("cos_raw"), 6))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# vector norms: top-20 largest
# ---------------------------------------------------------------------------

NORM_ORACLE = """
SELECT vec_id, label,
       round(sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                   list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
ORDER BY sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE)))) DESC, vec_id
LIMIT 20
"""


@register(
    "vector_norm_topk",
    oracle=NORM_ORACLE,
    category="vector",
    description="L2 norm computation + top-k ordering",
    graded=False,
)
def vector_norm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    norm = F.sqrt(l2sq(F.col("embedding")))
    return (
        emb.select("vec_id", "label", norm.alias("norm_raw"))
        .orderBy(F.desc("norm_raw"), "vec_id")
        .limit(20)
        .select("vec_id", "label", F.round("norm_raw", 6).alias("l2_norm"))
    )


# ---------------------------------------------------------------------------
# label centroids in long format (elementwise mean via exact decimal sums)
# ---------------------------------------------------------------------------

CENTROID_ORACLE = """
SELECT label,
       CAST(pos AS INTEGER) AS pos,
       CAST(sum(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 1e9 AS mean_val,
       count(*) AS n_vectors
FROM embeddings, range(1, 65) r(pos)
GROUP BY label, pos
"""


@register(
    "vector_label_centroids",
    oracle=CENTROID_ORACLE,
    category="vector",
    description="per-label centroid (exact decimal elementwise mean)",
)
def vector_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("pos0", "val"))
    # fixed-point mean: floor(x*1e9 + 0.5) -> exact int64 sum -> IEEE
    # double division. Pure IEEE ops on BOTH engines — a decimal(18,9)
    # cast is NOT cross-engine deterministic (Spark quantizes the double's
    # SHORTEST string repr, DuckDB the exact binary value; they disagree
    # by 1 ulp at digit 9 on ~1-in-1e4 float32 inputs — bit at sf0.1)
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(
            (
                F.sum(F.floor(F.col("val").cast("double") * F.lit(1e9) + F.lit(0.5))).cast("double")
                / F.count(F.lit(1))
                / F.lit(1e9)
            ).alias("mean_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (threshold-based, blocked by label)
# ---------------------------------------------------------------------------

COSDUP_ORACLE = """
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings WHERE vec_id < 300
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.dv, b.dv)
             / (sqrt(list_dot_product(a.dv, a.dv)) * sqrt(list_dot_product(b.dv, b.dv))), 6) AS cos_sim
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.dv, b.dv)
      / (sqrt(list_dot_product(a.dv, a.dv)) * sqrt(list_dot_product(b.dv, b.dv))) >= 0.2
"""


@register(
    "dedup_embedding_cosine",
    oracle=COSDUP_ORACLE,
    category="dedup",
    description="embedding-cosine near-dup pairs with label blocking "
    "(ORACLE BASELINE — not the scale recipe)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE BASELINE ONLY — label-blocked all-pairs cosine, kept
    because it is exactly SQL-expressible (the DuckDB hash-match pins
    the engine's cosine math bit-for-bit). It is NOT the scale recipe:
    with bounded label cardinality L the pair count is O(N^2/L) — at
    100x the data this entry is quadratic. The production path is
    operators/dedup.embedding_near_duplicates (registry entry
    dedup_embedding_lsh): LSH-bucket blocking with the SAME exact-cosine
    verification, bounded buckets, recall-gated in pytest."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    v = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id",
        "label",
        F.col("embedding").alias("dv"),
        F.sqrt(l2sq(F.col("embedding"))).alias("norm"),
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("dv").alias("dv_a"),
        F.col("norm").alias("norm_a"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("dv").alias("dv_b"),
        F.col("norm").alias("norm_b"),
    )
    joined = a.join(
        b, (F.col("label_a") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b"))
    )
    cos = dot(F.col("dv_a"), F.col("dv_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        joined.withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.2)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization + quantized top-k (exact-integer scores)
# ---------------------------------------------------------------------------

EMB_DIM = 64  # testdata embeddings are fixed 64-dim (TESTDATA.md)

SQ_ORACLE = f"""
WITH dims AS (
  SELECT i, MIN(embedding[i]) AS mn, MAX(embedding[i]) AS mx
  FROM embeddings, generate_series(1, {EMB_DIM}) AS t(i)
  GROUP BY i
), b AS (
  SELECT list(CAST(mn AS DOUBLE) ORDER BY i) AS mins,
         list(CASE WHEN mx > mn THEN 255.0 / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) ELSE 0.0 END ORDER BY i) AS scales
  FROM dims
), qz AS (
  SELECT vec_id,
         list_transform(range(1, {EMB_DIM + 1}),
           i -> floor((CAST(embedding[i] AS DOUBLE) - mins[i]) * scales[i] + 0.5) - 128) AS qv
  FROM embeddings, b
), scored AS (
  SELECT a.vec_id AS q_id, c.vec_id AS c_id,
         CAST(list_dot_product(a.qv, c.qv) AS BIGINT) AS qscore
  FROM qz a JOIN qz c ON a.vec_id < 8 AND a.vec_id <> c.vec_id
)
SELECT q_id, c_id, qscore, CAST(rn AS INTEGER) AS rank
FROM (SELECT q_id, c_id, qscore,
             row_number() OVER (PARTITION BY q_id ORDER BY qscore DESC, c_id) AS rn
      FROM scored)
WHERE rn <= 5
ORDER BY q_id, rank
"""


def quantize_embeddings(emb: DataFrame, dim: int, vec_col: str = "embedding") -> DataFrame:
    """Int8 scalar quantization (per-dimension min/max over the corpus):
    appends ``qv`` — array<bigint> of floor((x - mn_i) * 255/(mx_i -
    mn_i) + 0.5) - 128 — the memory-footprint play a 100 TB embedding
    store needs (4 bytes -> 1 byte per dim at retrieval quality loss
    bounded by the quantization step).

    Cross-engine determinism: double math in EXACTLY the oracle's
    operation order (subtract, multiply by the precomputed per-dim
    scale, +0.5, floor — never round()), so quantized codes and the
    resulting INTEGER dot-product scores hash-match DuckDB bit-for-bit
    (the vector_label_centroids fixed-point lesson).

    Scale: ONE aggregate over the corpus computes all 2*dim bounds
    (map-side partial agg, no shuffle of rows); bounds ride a broadcast
    1-row cross join — the corpus itself never reshuffles. Quantization
    is a narrow JVM projection."""
    bounds = emb.agg(
        F.array(
            *[F.min(F.element_at(vec_col, i + 1)).cast("double") for i in range(dim)]
        ).alias("mins"),
        F.array(
            *[F.max(F.element_at(vec_col, i + 1)).cast("double") for i in range(dim)]
        ).alias("maxs"),
    ).select(
        "mins",
        F.zip_with(
            "maxs",
            "mins",
            lambda mx, mn: F.when(mx > mn, F.lit(255.0) / (mx - mn)).otherwise(F.lit(0.0)),
        ).alias("scales"),
    )
    shifted = F.zip_with(F.col(vec_col), F.col("mins"), lambda x, mn: x.cast("double") - mn)
    qv = F.zip_with(
        shifted,
        F.col("scales"),
        lambda d, s: (F.floor(d * s + F.lit(0.5)) - F.lit(128)).cast("long"),
    )
    return emb.crossJoin(F.broadcast(bounds)).withColumn("qv", qv).drop("mins", "scales")


@register(
    "vector_quantized_topk",
    oracle=SQ_ORACLE,
    category="vector",
    description="int8 scalar-quantized top-5 by integer dot product",
    graded=False,  # driver window pinned at 50; oracle-gated via pytest parity
)
def vector_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # lazy localCheckpoint: both scoring inputs derive from the quantized
    # frame — without it each side re-runs the 2*dim bounds aggregate and
    # the quantization projection (no ReuseExchange across the broadcast
    # build; r14 measured the duplicated subtree). Values unchanged.
    emb = quantize_embeddings(
        t(spark, sf_dir, "embeddings"), EMB_DIM
    ).localCheckpoint(eager=False)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("qa")
    )
    scored = _int_dot_pairs(q, emb)
    w = Window.partitionBy("q_id").orderBy(F.desc("qscore"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id", "qscore", "rank")
        .orderBy("q_id", "rank")
    )


def _int_dot_pairs(q: DataFrame, emb: DataFrame) -> DataFrame:
    """(q_id, c_id, qscore) for every query x candidate (q_id != c_id)
    where qscore = exact int64 dot of the two quantized vectors.

    Two tiers, value-identical (int64 addition is associative and
    overflow-free here — |element| <= 255, dim 64 => |dot| < 2^23, so
    any summation order yields the same integer, unlike float paths):

    - BOUNDED query frames (raw matrix <= XT_BROADCAST_VECS_MAX_BYTES,
      probed with a short-circuiting limit) broadcast the query matrix
      once and ONE Arrow pass computes the (n, |Q|) integer matmul per
      corpus batch — replacing a broadcast join that expanded every
      corpus row |Q|-fold through the JVM and an interpreted
      per-element HOF fold per pair (~dim lambda evals each, the r12
      encode lesson; guide §4.2).
    - Unbounded query frames keep the join + HOF fold tier.
    """
    from incubator_xtable_spark.operators.ann import (
        _broadcast_vecs_max_bytes,
        _flat2d,
    )

    dim = EMB_DIM
    limit_bytes = _broadcast_vecs_max_bytes()
    max_rows = limit_bytes // (dim * 8) if limit_bytes > 0 else 0
    q_tbl = None
    if max_rows > 0:
        q_tbl = (
            q.select(
                F.col("q_id").cast("long").alias("kid"),
                F.col("qa").cast("array<bigint>").alias("v"),
            )
            .limit(max_rows + 1)
            .toArrow()
        )
        if q_tbl.num_rows > max_rows:
            q_tbl = None
    if q_tbl is None:
        c = emb.select(F.col("vec_id").alias("c_id"), F.col("qv").alias("qb"))
        qscore = F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )
        return (
            c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
            .withColumn("qscore", qscore)
            .select("q_id", "c_id", "qscore")
        )

    import numpy as np
    import pyarrow as pa

    q_ids = q_tbl.column("kid").to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _flat2d(q_tbl.column("v").combine_chunks(), len(q_ids), dim, "_int_dot_pairs(q)")
    q_int = np.ascontiguousarray(q_mat.astype(np.int64))
    bc = emb.sparkSession.sparkContext.broadcast((q_ids, q_int))

    def _dots(batches):
        import numpy as _np
        import pyarrow as _pa

        kq_ids, kq = bc.value
        nq = len(kq_ids)
        for rb in batches:
            n = rb.num_rows
            if n == 0 or nq == 0:
                continue
            c_ids = rb.column(0).cast("int64").to_numpy(zero_copy_only=False)
            flat = rb.column(1).flatten().to_numpy(zero_copy_only=False)
            qb = _np.asarray(flat, dtype=_np.int64).reshape(n, dim)
            scores = qb @ kq.T  # (n, nq) exact int64
            out_q = _np.repeat(kq_ids[None, :], n, axis=0).ravel()
            out_c = _np.repeat(c_ids, nq)
            out_s = scores.ravel()
            keep = out_q != out_c
            yield _pa.record_batch(
                [
                    _pa.array(out_q[keep]),
                    _pa.array(out_c[keep]),
                    _pa.array(out_s[keep]),
                ],
                names=["q_id", "c_id", "qscore"],
            )

    src = emb.select(
        F.col("vec_id").cast("long").alias("c_id"),
        F.col("qv").cast("array<bigint>").alias("qb"),
    )
    return src.mapInArrow(_dots, "q_id long, c_id long, qscore long")


@register(
    "text_hash_embeddings",
    oracle=None,  # xxhash64 has no DuckDB twin; property-gated in pytest
    category="vector",
    description="feature-hashing doc embeddings (hashing trick, model-free)",
    graded=False,
)
def text_hash_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free document embeddings via the hashing trick
    (operators/hash_embed.py): token sign-hash contributions into a
    64-dim L2-normalized vector, entirely JVM-side (two uniform-key
    shuffles, zero UDFs). Feeds the same embedding consumers as the
    embeddings table (ANN, near-dup keep/drop). Gates: partition-layout
    invariance, unit norms, edited-doc cosine similarity, and
    composition with embedding_near_duplicates — see
    tests/test_pipeline_operators.py."""
    from incubator_xtable_spark.operators.hash_embed import hash_embed

    docs = t(spark, sf_dir, "documents")
    return hash_embed(docs, dim=64)  # rows-only gate: no ordering sort needed
