"""Feature-hashing text embeddings (the "hashing trick", Weinberger et
al. 2009 "Feature Hashing for Large Scale Multitask Learning"): embed
documents into a fixed-dimension vector WITHOUT any model or vocabulary
— token t contributes sign(t) at index h(t) mod dim — then L2-normalize
so cosine similarity works.

Why it's here: the embedding-based operators (ann_*, embedding near-dup
and its keep/drop pipeline) consume an `array<double>` column; real
deployments compute it with a neural encoder at this exact seam, but a
100 TB curation pipeline also wants a CHEAP deterministic fallback for
near-dup blocking and clustering when no model is available (hashed
bag-of-words cosine is the classic one). This gives that fallback with
zero Python in the plan.

Spark-first plan (no UDFs, no Arrow pass):
  explode(tokens) -> (doc_id, idx = pmod(xxhash64(token), dim),
                      sign = 1 - 2*(xxhash64(token, salt) & 1))
  -> groupBy(doc_id, idx).sum(sign)            [uniform-key shuffle 1]
  -> groupBy(doc_id).map_from_entries          [uniform-key shuffle 2]
  -> transform(sequence(0, dim-1), i -> coalesce(map[i], 0.0))
  -> L2 normalize via aggregate()
Both shuffles key on (doc_id[, idx]) — uniform however skewed the text
lengths are; per-doc state is one dim-length array. Determinism is
content-defined (xxhash64 of the token bytes), so embeddings are
identical on any partition layout — pinned by tests.

Scale note: dim is a literal; the per-row transform/aggregate lambdas
are Catalyst-interpreted (~1 us/element — fine at dim <= 256 against
shuffle costs; for dense high-dim variants use the Arrow matmul path in
operators/ann.lsh_band_keys_arrow's style instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_embed(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id_col, embedding array<double> of ``dim``, L2-normalized;
    all-empty documents embed as the zero vector — filter those out
    before cosine consumers like embedding_near_duplicates, whose
    normalization divides by the vector norm)."""
    if dim < 2:
        raise ValueError(f"hash_embed: dim must be >= 2, got {dim}")
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    contrib = tok.select(
        id_col,
        F.pmod(F.xxhash64("tok", F.lit(seed)), F.lit(dim)).cast("int").alias("idx"),
        (F.lit(1) - 2 * (F.xxhash64("tok", F.lit(seed + 1)) % 2 != 0).cast("int")).alias(
            "sign"
        ),
    )
    sums = contrib.groupBy(id_col, "idx").agg(F.sum("sign").alias("w"))
    as_map = sums.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "w"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")), F.lit(0)).cast(
            "double"
        ),
    )
    with_vec = as_map.select(id_col, dense.alias("raw"))
    norm = F.sqrt(
        F.aggregate(F.col("raw"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = F.when(
        norm > 0,
        F.transform(F.col("raw"), lambda x: x / norm),
    ).otherwise(F.col("raw"))
    out = with_vec.select(id_col, unit.alias("embedding"))
    # documents whose every token hashed away (empty text): zero vector
    empties = docs.join(out, id_col, "left_anti").select(
        F.col(id_col),
        F.array_repeat(F.lit(0.0), dim).alias("embedding"),
    )
    return out.unionByName(empties)
