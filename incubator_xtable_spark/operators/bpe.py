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

# Below this many distinct words the merge loop runs on the DRIVER over
# the collected (symbols, freq) table (r14): BPE statistics are
# vocabulary-bounded by construction, and paying 2 Spark jobs per merge
# round for a vocab that fits in a few MB is pure scheduler latency —
# the same auto-gating as connected_components' union-find fast path.
# The driver loop replays the distributed algorithm exactly (overlapping
# adjacent-pair counts, count-desc/pair-asc argmax, left-to-right
# non-overlapping merge), pinned by the pytest differential against the
# independent reference implementation. Env XT_DRIVER_VOCAB_MAX
# overrides (0 disables).
_DRIVER_VOCAB_MAX = int(__import__("os").environ.get("XT_DRIVER_VOCAB_MAX", "200000"))


def _learn_merges_driver(
    words: list[tuple[list[str], int]], n_merges: int, min_freq: int
) -> list[tuple[int, str, str, int]]:
    """The merge loop over a BOUNDED, already-collected vocabulary —
    value-identical to the distributed rounds (ASCII and non-ASCII alike:
    UTF-8 byte order is code-point order, so Python's str compare matches
    Spark's binary string ordering in the tie-break)."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict = {}
        for syms, freq in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_freq:
            break
        merges.append((rank, a, b, int(n)))
        nxt = []
        for syms, freq in words:
            acc: list[str] = []
            for s in syms:
                if acc and acc[-1] == a and s == b:
                    acc[-1] = a + b
                else:
                    acc.append(s)
            nxt.append((acc, freq))
        words = nxt
    return merges


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
    if _DRIVER_VOCAB_MAX > 0 and vocab.count() <= _DRIVER_VOCAB_MAX:
        rows = vocab.collect()
        return _learn_merges_driver(
            [(list(r["syms"]), int(r["freq"])) for r in rows], n_merges, min_freq
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


# ---------------------------------------------------------------------------
# BPE APPLY / ENCODE (r13) — tokenize a corpus with a FIXED merge table
# ---------------------------------------------------------------------------

# Each symbol is wrapped \x01sym\x02 so a merge (a, b) is ONE string
# replace of "\x01a\x02\x01b\x02" -> "\x01ab\x02": scanning replace is
# left-to-right non-overlapping over DISJOINT matches, which is exactly
# the standard BPE application order — proven equivalent to the
# aggregate() fold (_merge_pair_expr) by pytest across overlap chains.
# String replaces stay inside whole-stage codegen (the fold is an
# interpreted HOF tree — the "Catalyst HOF vs Arrow matmul" lesson),
# and the markers make mid-symbol false matches impossible (symbols
# never contain \x01/\x02).
_SYM_OPEN = "\x01"
_SYM_CLOSE = "\x02"


def bpe_apply_expr(col, merges: list[tuple[str, str]]):
    """Column expr: word string -> wrapped-token string after applying
    ``merges`` in rank order. Token count = number of \\x01 markers."""
    wrapped = F.regexp_replace(col, "(.)", f"{_SYM_OPEN}$1{_SYM_CLOSE}")
    out = wrapped
    for a, b in merges:
        out = F.replace(
            out,
            F.lit(f"{_SYM_OPEN}{a}{_SYM_CLOSE}{_SYM_OPEN}{b}{_SYM_CLOSE}"),
            F.lit(f"{_SYM_OPEN}{a}{b}{_SYM_CLOSE}"),
        )
    return out


def bpe_encode_doc_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus under a FIXED merge table and emit per-doc
    token statistics: (id, n_words, n_tokens, n_chars_tokenized,
    chars_per_token_e6). The merge application runs once per DISTINCT
    word (the learner's scale insight: vocabulary-bounded, not
    corpus-bounded), then joins counts back — at 100 TB the expensive
    pass touches millions of vocab rows while the corpus only pays a
    word-count groupBy and one join on the word key. chars_per_token_e6
    is an exact integer ratio (cross-engine bit-deterministic)."""
    words = (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # lazily localCheckpointed (r15, guide §2.2): both the vocab
        # distinct and the count join-back consume this |doc-term| frame —
        # unmaterialized, Catalyst evaluates the corpus scan + tokenize +
        # word-count groupBy twice (see plans/r15/text_bpe_encode_*.txt)
        .localCheckpoint(eager=False)
    )
    # token count = number of open markers; counted via ONE split so the
    # replace chain has a single consumer (Catalyst projection collapse
    # would inline it into every consumer — memory rule)
    vocab = (
        words.select("w")
        .distinct()
        .select(
            "w",
            (F.size(F.split(bpe_apply_expr(F.col("w"), merges), _SYM_OPEN)) - 1)
            .cast("long")
            .alias("toks"),
        )
    )
    joined = words.join(vocab, "w")
    return joined.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.col("toks")).cast("long").alias("n_tokens"),
        F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars_tokenized"),
    ).withColumn(
        # exact integer ratio (DIV), bit-identical across engines —
        # never a double division (CLAUDE.md oracle rule)
        "chars_per_token_e6",
        F.expr("CAST((n_chars_tokenized * 1000000) DIV n_tokens AS BIGINT)"),
    )
