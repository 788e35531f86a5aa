"""Distributed BPE merge learning (Sennrich et al. 2016, the tokenizer-
training pass of an LLM data pipeline): learn the top-N byte-pair-
encoding merges over a corpus, Spark-first.

The scale insight real BPE trainers use: pair statistics depend only on
the WORD FREQUENCY TABLE, not the raw corpus — so one corpus-sized
groupBy(word) up front bounds every later iteration by the vocabulary
size (millions of rows at 100 TB, not billions). Each merge round is
then one narrow aggregation over the vocab table:

  1. explode each distinct word's adjacent symbol pairs, weighted by
     the word's corpus frequency (map-side; JVM transform-with-index);
  2. groupBy(pair) -> weighted count -> argmax with a full tie-break
     (count desc, pair asc) — ONE shuffle + a one-row collect;
  3. rewrite the symbol arrays merging that pair left-to-right (the
     standard non-overlapping BPE application) via a JVM aggregate
     fold — no shuffle;
  4. localCheckpoint every few rounds so the iterative lineage never
     compounds (same pattern as operators/dedup connected components).

No Python UDFs; symbols stay JVM arrays throughout. The registry entry
is rows-only (iterative — not SQL-expressible); its gate is a pytest
differential against an independent pure-Python reference BPE on the
same corpus (exact merge list AND counts), plus determinism across
partition layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 4


def _merge_pair_expr(syms_col: str, left: str, right: str):
    """Fold that applies ONE merge (left,right) -> left||right to a
    symbol array, left-to-right non-overlapping (standard BPE apply)."""
    a = left.replace("\\", "\\\\").replace("'", "\\'")
    b = right.replace("\\", "\\\\").replace("'", "\\'")
    return F.expr(
        f"aggregate({syms_col}, cast(array() as array<string>), "
        f"(acc, s) -> IF(size(acc) > 0 AND element_at(acc, -1) = '{a}' "
        f"AND s = '{b}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{a}{b}')), "
        f"concat(acc, array(s))))"
    )


def learn_bpe_merges(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 2,
) -> list[tuple[int, str, str, int]]:
    """-> [(rank, left, right, weighted pair count)], the learned merge
    table in order. Driver work per round is ONE collected row."""
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split(F.col("w"), "").alias("syms"), "freq")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = vocab.select(
            F.explode(
                F.expr(
                    # transform's i is 0-based over the slice, so the pair
                    # partner in the full array is the 0-based syms[i + 1]
                    "transform(slice(syms, 1, size(syms) - 1), "
                    "(s, i) -> struct(s AS a, syms[i + 1] AS b))"
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_freq:
            break
        a, b, n = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["n"])
        merges.append((rank, a, b, n))
        vocab = vocab.select(_merge_pair_expr("syms", a, b).alias("syms"), "freq")
        if (rank + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def bpe_merges_df(
    spark: SparkSession,
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 2,
) -> DataFrame:
    merges = learn_bpe_merges(
        docs, text_col=text_col, n_merges=n_merges, min_freq=min_freq
    )
    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, pair_count BIGINT"
    )
