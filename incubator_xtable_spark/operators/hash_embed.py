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

Plan (sparse JVM aggregation, dense Arrow finish):
  explode(tokens) -> (doc_id, idx = pmod(xxhash64(token), dim),
                      sign = 1 - 2*(xxhash64(token, salt) & 1))
  -> groupBy(doc_id, idx).sum(sign)            [uniform-key shuffle 1]
  -> groupBy(doc_id).collect_list(idx), collect_list(w)   [shuffle 2]
  -> ONE mapInArrow pass: numpy scatter into a dim-wide row + L2
     normalize (the dense per-row step — Catalyst HOF lambdas are
     interpreted at ~1 us/element, measured 3.9 s for 50k docs x 64
     dims at sf0.1; the Arrow scatter is the lsh_band_keys_arrow
     lesson applied here).
Both shuffles key on (doc_id[, idx]) — uniform however skewed the text
lengths are; per-doc state is one dim-length array. Determinism is
content-defined (xxhash64 of the token bytes), so embeddings are
identical on any partition layout — pinned by tests.
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
    sparse = sums.groupBy(id_col).agg(
        F.collect_list("idx").alias("idxs"), F.collect_list("w").alias("ws")
    )

    def _densify(batches, _dim=dim):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            ids = rb.column(0)
            idxs = rb.column(1).to_pylist()
            ws = rb.column(2).to_pylist()
            out_rows = []
            for i_list, w_list in zip(idxs, ws):
                v = np.zeros(_dim, dtype=np.float64)
                v[np.asarray(i_list, dtype=np.int64)] = np.asarray(
                    w_list, dtype=np.float64
                )
                n = float(np.sqrt((v * v).sum()))
                if n > 0:
                    v /= n
                out_rows.append(v.tolist())
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out_rows, pa.list_(pa.float64()))],
                [rb.schema.field(0).name, "embedding"],
            )

    from pyspark.sql import types as T

    id_field = next(f for f in docs.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [id_field, T.StructField("embedding", T.ArrayType(T.DoubleType()), False)]
    )
    out = sparse.mapInArrow(_densify, out_schema)
    # documents whose every token hashed away (all-space/empty/null text):
    # zero vector. Classified by a FILTER on the base scan — a row embeds
    # empty iff split-by-space yields no non-empty token, i.e. the text
    # trims (space-only trim, matching the single-space split pattern) to
    # "" or is null. The previous left_anti join against `out` duplicated
    # the whole explode+2-shuffle+kernel subtree into the plan (r15,
    # guide §7.2 "duplicated subtrees"); the filter reads the base scan
    # once. Identical rows for unique ``id_col`` (the operator's keying
    # contract — duplicate ids would already collapse in the groupBy).
    empties = docs.filter(
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    ).select(
        F.col(id_col),
        F.array_repeat(F.lit(0.0), dim).alias("embedding"),
    )
    return out.unionByName(empties)
