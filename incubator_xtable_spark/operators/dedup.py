"""Near-duplicate detection operators for large-scale training-data
pipelines: MinHash + LSH banding and SimHash fingerprints.

All computation is built-in JVM expressions (F.hash = Murmur3, array
lambdas) — no Python UDFs anywhere, so the whole pipeline stays in
whole-stage codegen and scales with the cluster.

Scale design (100 TB corpus):
- shingling + minhash signatures: narrow per-row projection, no shuffle;
- LSH banding: explode to (band, signature) keys -> ONE shuffle to group
  candidates; bucket sizes are bounded by banding parameters, so the
  pair-join explosion is controlled (vs the quadratic all-pairs join);
- exact-Jaccard verification only on candidate pairs (a tiny fraction);
- the whole flow is 2 shuffles: bucket grouping + candidate self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's parallelism before heavy per-row
    compute (single-file tables arrive as a single partition)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)


def _list_col_numpy(col):
    """(flat_values int64 ndarray, absolute offsets int64 ndarray) of an
    Arrow list<int64> column, trimmed so reduceat's implicit last segment
    ends at the final offset even on sliced buffers."""
    import numpy as np

    lo = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)[: lo[-1]]
    return np.asarray(flat, dtype=np.int64), lo


def simhash_sigs_arrow(
    df: DataFrame, *, hashes_col: str = "th", out_col: str = "sh", bits: int = 64
) -> DataFrame:
    """SimHash signatures from precomputed token hashes via ONE vectorized
    Arrow pass: bit b of sig = 1 iff 2 * sum((h >> b) & 1 over tokens) >
    n_tokens — bit-identical to the JVM ``simhash_from_hashes`` fold it
    replaces (pure int64 two's-complement ops on both paths), so oracle
    values and pair sets are unchanged.

    Why: the expression-tree fold evaluates ``bits`` separate aggregate
    lambdas per row (interpreted per token — measured as the dominant
    cost of the simhash entries at sf0.1); here each batch is bits
    vectorized numpy passes over the flattened token-hash buffer.
    Map-only, zero shuffles — the same scale posture, cheaper per task
    (guide §4.2). Output schema: every input column except
    ``hashes_col``, plus ``out_col`` long."""
    from pyspark.sql import types as T

    keep = [f for f in df.schema.fields if f.name != hashes_col]
    names = [f.name for f in keep] + [out_col]
    out_schema = T.StructType(list(keep) + [T.StructField(out_col, T.LongType())])
    h_idx = [f.name for f in df.schema.fields].index(hashes_col)
    keep_idx = [i for i, f in enumerate(df.schema.fields) if f.name != hashes_col]
    bits_ = bits

    def _sig(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            flat, lo = _list_col_numpy(rb.column(h_idx))
            lens = np.diff(lo)
            # dummy 0 pad: keeps every reduceat index in-bounds when rows
            # are empty (lo[i] == len(flat)); a 0 contributes nothing to a
            # bit-count sum, and empty rows are masked below anyway
            flat = np.append(flat, np.int64(0))
            sig = np.zeros(n, dtype=np.uint64)
            empty = lens == 0
            for b in range(bits_):
                ones = np.add.reduceat((flat >> b) & 1, lo[:-1])
                ones[empty] = 0
                sig |= ((2 * ones > lens).astype(np.uint64)) << np.uint64(b)
            yield pa.record_batch(
                [rb.column(i) for i in keep_idx] + [pa.array(sig.view(np.int64))],
                names=names,
            )

    return df.mapInArrow(_sig, out_schema)


def minhash_sigs_arrow(
    df: DataFrame,
    *,
    base_col: str = "bh",
    out_col: str = "sig",
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signatures from precomputed base hashes via ONE vectorized
    Arrow pass: sig_i = min over shingles of (h * a_i + b_i) mod p —
    value-identical to the JVM ``signature_from_base`` tree (h < 2^32 and
    a < 2^31 keep every product inside positive int64 on both paths, and
    the modulus is positive, so Java % == numpy %).

    Why: the expression tree evaluates num_hashes transform+array_min
    lambdas per row (interpreted per shingle); here each batch is
    num_hashes vectorized passes over the flattened base-hash buffer with
    a per-row minimum.reduceat. Map-only, zero shuffles (guide §4.2).
    Output schema: every input column except ``base_col``, plus
    ``out_col`` array<long>. Raises on an empty shingle array (the JVM
    path would emit null signature slots; shingles_col always emits >= 1
    shingle, so this is a loud guard, not a behavior change)."""
    from pyspark.sql import types as T

    params = _permutation_params(num_hashes)
    keep = [f for f in df.schema.fields if f.name != base_col]
    names = [f.name for f in keep] + [out_col]
    out_schema = T.StructType(
        list(keep) + [T.StructField(out_col, T.ArrayType(T.LongType()))]
    )
    b_idx = [f.name for f in df.schema.fields].index(base_col)
    keep_idx = [i for i, f in enumerate(df.schema.fields) if f.name != base_col]
    nh = num_hashes

    def _sig(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            flat, lo = _list_col_numpy(rb.column(b_idx))
            if (np.diff(lo) == 0).any():
                raise ValueError("minhash_sigs_arrow: empty shingle array")
            sig = np.empty((n, nh), dtype=np.int64)
            for i, (a, b) in enumerate(params):
                sig[:, i] = np.minimum.reduceat((flat * a + b) % _MERSENNE_PRIME, lo[:-1])
            yield pa.record_batch(
                [rb.column(i) for i in keep_idx]
                + [
                    pa.ListArray.from_arrays(
                        pa.array(np.arange(0, (n + 1) * nh, nh, dtype=np.int64), type=pa.int32()),
                        pa.array(sig.ravel()),
                    )
                ],
                names=names,
            )

    return df.mapInArrow(_sig, out_schema)


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (JVM-side)."""
    toks = tokens_col(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


_MERSENNE_PRIME = 2147483647  # 2^31 - 1


def _permutation_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic affine-permutation constants (a, b), a odd > 0."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 1103515245 + 12345) % (2**31)
        a = (state | 1) or 1
        state = (state * 1103515245 + 12345) % (2**31)
        b = state
        params.append((a, b))
    return params


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature via ONE murmur3 pass + affine permutations:
    sig_i = min over shingles of (a_i * h(s) + b_i) mod p.

    The classic universal-hash trick: hashing each shingle once and
    deriving the family arithmetically is ~num_hashes x cheaper than
    re-hashing per seed, with equivalent collision behavior.
    Deterministic (Spark hash() is stable Murmur3; constants are seeded).
    All arithmetic stays within int64 (h < 2^32, a < 2^31 -> product <
    2^63), so ANSI overflow checking never trips.
    """
    base = base_hashes(shingles)
    return signature_from_base(base, num_hashes)


def base_hashes(shingles: Column) -> Column:
    """One murmur3 per shingle, shifted non-negative (int64-safe)."""
    return F.transform(shingles, lambda s: F.hash(s).cast("long") + F.lit(2**31))


def base_hashes_md5(shingles: Column) -> Column:
    """One md5-derived 32-bit hash per shingle — the ORACLE-EXPRESSIBLE
    hash family (r14): DuckDB's md5() produces the identical digest, so
    ``('0x' || substr(md5(s), 1, 8))::BIGINT`` recomputes this value
    exactly and the whole MinHash+LSH pipeline becomes differential-
    checkable. Value range [0, 2^32) — the same int64-safe envelope as
    the murmur3 family, so the affine-permutation arithmetic is
    unchanged. Cost: md5 is a JVM intrinsic (~2-3x murmur3 per call),
    paid once per DISTINCT shingle per row — still codegen'd, still
    zero Python."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )


def signature_from_base(base: Column, num_hashes: int) -> Column:
    """Affine permutations over precomputed base hashes.

    PERFORMANCE: pass ``base`` as a materialized *column reference*, not an
    expression — as an expression it gets inlined into all num_hashes
    permutations and recomputed each time (measured 30-60x slower at
    sf0.1). minhash_lsh_candidates does the two-step select.
    """

    def perm(a: int, b: int) -> Column:
        def lam(h: Column) -> Column:
            return (h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_PRIME)

        return F.array_min(F.transform(base, lam))

    return F.array(*[perm(a, b) for a, b in _permutation_params(num_hashes)])


def minhash_lsh_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash_family: str = "murmur3",
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Two docs land in the same bucket iff one band (num_hashes/bands
    consecutive signature slots) matches exactly. Returns
    (doc_a, doc_b, n_shared_bands) with doc_a < doc_b.

    ``hash_family``: "murmur3" (default — Spark hash(), band keys
    re-hashed to int) or "md5" (r14 — base hashes from md5 hex prefixes
    and band keys as the RAW comma-joined signature slice, both exactly
    recomputable by a DuckDB oracle; identical plan shape and shuffle
    count, only the hash primitives differ).
    """
    sh = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        shingles_col(F.col(text_col), shingle_n).alias("sh"),
    )
    return _lsh_candidates_from_shingles(
        sh, num_hashes=num_hashes, bands=bands, hash_family=hash_family
    )


def _lsh_candidates_from_shingles(
    sh: DataFrame,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    hash_family: str = "murmur3",
) -> DataFrame:
    """Banding candidates from a prepared (doc_id, sh) shingle frame.

    The signature frame is lazily localCheckpointed before the band
    self-join: both join sides (and the broadcast build) would otherwise
    re-evaluate the whole shingling -> hash -> 64-permutation pipeline —
    the r14 plan audit showed the documents scan + signature subtree
    duplicated per side (no ReuseExchange across a BroadcastExchange).
    The checkpointed frame is narrow (doc_id + 64 longs, ~0.5 KB/row),
    far cheaper to materialize than to recompute at any scale."""
    rows_per_band = num_hashes // bands
    base_fn = base_hashes_md5 if hash_family == "md5" else base_hashes
    # base hashes stay JVM-side (cross-engine hash primitives); the 64
    # affine permutations + per-row minima run in the vectorized Arrow
    # kernel instead of num_hashes interpreted transform+array_min lambdas
    # per row (value-identical int64 math)
    sig = minhash_sigs_arrow(
        sh.select("doc_id", base_fn(F.col("sh")).alias("bh")),
        num_hashes=num_hashes,
    ).localCheckpoint(eager=False)

    def band_key(b: int) -> Column:
        raw = F.concat_ws(
            ",",
            *[
                F.element_at(F.col("sig"), b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)
            ],
        )
        # md5 family: keep the raw slice string (oracle-recomputable);
        # murmur3 family: re-hash to a narrow int key as before
        return raw if hash_family == "md5" else F.hash(raw)

    banded = sig.select(
        "doc_id",
        F.posexplode(F.array(*[band_key(b) for b in range(bands)])).alias(
            "band", "band_sig"
        ),
    )
    left = banded.select(
        F.col("band"), F.col("band_sig"), F.col("doc_id").alias("doc_a")
    )
    right = banded.select(
        F.col("band"), F.col("band_sig"), F.col("doc_id").alias("doc_b")
    )
    pairs = left.join(right, ["band", "band_sig"]).filter(F.col("doc_a") < F.col("doc_b"))
    return pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_shared_bands"))


def minhash_near_duplicates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash_family: str = "murmur3",
) -> DataFrame:
    """LSH candidates verified with exact shingle Jaccard >= threshold.
    Returns (doc_a, doc_b, jaccard)."""
    # ONE shingling pass feeds both the signatures and the Jaccard verify:
    # the shingle frame is lazily localCheckpointed so the candidate
    # subtree and the two verify sides read the same materialized arrays
    # instead of re-scanning + re-shingling the corpus (the r14 plan audit
    # counted 4 independent documents scans in this operator's plan).
    sh = (
        _spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            shingles_col(F.col(text_col), shingle_n).alias("sh"),
        )
        .localCheckpoint(eager=False)
    )
    cands = _lsh_candidates_from_shingles(
        sh, num_hashes=num_hashes, bands=bands, hash_family=hash_family
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_col(text: Column, bits: int = 32) -> Column:
    """SimHash fingerprint: sign of the per-bit sum of token-hash bits.

    bit b of simhash = 1 iff sum over tokens of (+1 if bit b of
    murmur3(token) else -1) > 0. Pure expression tree (bits x shiftright),
    still codegen'd; 32 bits keeps the tree manageable.
    """
    toks = F.array_distinct(tokens_col(text))
    th = F.transform(toks, lambda t: F.hash(t))
    return simhash_from_hashes(th, bits)


def token_hashes(text: Column) -> Column:
    """One murmur3 per distinct token (materialize this before
    simhash_from_hashes — see signature_from_base note)."""
    return F.transform(F.array_distinct(tokens_col(text)), lambda t: F.hash(t))


def simhash_from_hashes(th: Column, bits: int = 32) -> Column:
    # per-bit scalar aggregates; measured faster than a single-pass
    # array-accumulator (zip_with allocates a fresh array per element)
    def bit_ones(b: int) -> Column:
        def step(acc: Column, h: Column) -> Column:
            return acc + F.shiftright(h, b).bitwiseAND(F.lit(1))

        # long accumulator: 64-bit (xxhash64) token hashes make the step
        # expression BIGINT, and aggregate requires init/step types to match
        return F.aggregate(th, F.lit(0).cast("long"), step)

    out = F.lit(0).cast("long")
    for b in range(bits):
        bit = (
            F.when(bit_ones(b) * 2 > F.size(th), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        # shiftleft, not bit * 2**b: at bits=64 the literal 2**63 overflows long
        out = out.bitwiseOR(F.shiftleft(bit, b))
    return out


def hamming_distance(a: Column, b: Column) -> Column:
    # native popcount (single codegen'd expression) instead of a bits-term
    # shift/mask/sum chain; covers the full 64-bit width
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    n_bands: int = 4,
    block_cols: tuple[str, ...] = (),
    hash_family: str = "murmur3",
) -> DataFrame:
    """SimHash near-dup pairs via multi-band blocking (the MinHash-banding
    shape applied to Hamming space).

    ``hash_family``: "murmur3" (default — hash()/xxhash64 token hashes)
    or "md5" (r14, bits must be <= 32): token hashes from md5 hex
    prefixes, exactly recomputable by a DuckDB oracle. Because banding
    recall is EXACT for max_hamming <= n_bands - 1 (pigeonhole, no
    max_bucket drop here), the banded result set equals the brute-force
    within-block result — so the oracle can verify with a simple blocked
    self-join while this plan keeps the bounded-bucket banding shape.

    The signature is split into n_bands contiguous slices; by pigeonhole,
    any pair within Hamming <= n_bands-1 agrees EXACTLY on at least one
    band, so self-joining on (band_index, band_value) finds every such
    pair — recall is guaranteed for max_hamming <= n_bands-1 and degrades
    gracefully above. Candidates are then verified with the exact Hamming
    distance.

    Scale: buckets per band = 2^(bits/n_bands) (65,536 at 64/4) multiplied
    by the optional attribute blocks — unlike a global prefix block (256
    buckets at 8 bits, quadratic within bucket on a skewed one-language
    corpus), bucket population stays bounded as the corpus grows. Shuffles:
    one for the band self-join, one for the pair distinct.
    """
    if hash_family == "md5":
        if bits > 32:
            raise ValueError("md5 hash family derives 32 hash bits; bits must be <= 32")

        def tok_hash(tok: Column) -> Column:
            return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")

    else:
        # 64-bit token hashes (xxhash64) feed a 64-bit signature
        def tok_hash(tok: Column) -> Column:
            return F.xxhash64(tok) if bits > 32 else F.hash(tok)

    # lazy localCheckpoint: the banding kernel fans this frame into the
    # bucket census and both self-join sides — each would re-evaluate the
    # signature pipeline (the media_near_duplicates lesson applied to text
    # SimHash; the checkpointed frame is one int64 + blocks per doc).
    # Token hashes stay JVM-side (cross-engine hash primitives); the
    # per-bit majority vote runs in the vectorized Arrow kernel instead of
    # bits interpreted aggregate folds per row (bit-identical ints).
    sigs = simhash_sigs_arrow(
        _spread(docs).select(
            F.col(id_col).alias("doc_id"),
            *[F.col(c) for c in block_cols],
            F.transform(
                F.array_distinct(tokens_col(F.col(text_col))), tok_hash
            ).alias("th"),
        ),
        bits=bits,
    ).localCheckpoint(eager=False)
    return hamming_banded_pairs(
        sigs,
        max_hamming=max_hamming,
        bits=bits,
        n_bands=n_bands,
        block_cols=block_cols,
    )


def hamming_banded_pairs(
    sigs: DataFrame,
    *,
    id_col: str = "doc_id",
    sig_col: str = "sh",
    max_hamming: int = 3,
    bits: int = 64,
    n_bands: int = 4,
    block_cols: tuple[str, ...] = (),
    max_bucket: int | None = None,
) -> DataFrame:
    """The Hamming-space banding kernel behind simhash_near_duplicates
    AND the multimodal dHash pairing: split each ``bits``-wide signature
    into n_bands contiguous slices, self-join on (band, value
    [, block_cols]), verify candidates with the exact popcount distance.
    Pigeonhole guarantees recall for max_hamming <= n_bands - 1.

    ``max_bucket`` (optional) drops band-value buckets holding more
    members — the stop-fingerprint bound from winnow_near_duplicates:
    a corpus of near-uniform signatures (e.g. synthetic gradients that
    all hash alike) would otherwise make one bucket quadratic; with the
    bound, sum over buckets of |bucket|^2 <= N * max_bucket."""
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    sigs = sigs.select(
        F.col(id_col).alias("doc_id"),
        F.col(sig_col).alias("sh"),
        *[F.col(c) for c in block_cols],
    )
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("sh"), i * band_bits)
            .bitwiseAND(F.lit(mask))
            .cast("int")
            for i in range(n_bands)
        ]
    )
    bands = sigs.select(
        "doc_id", "sh", *block_cols, F.posexplode(band_vals).alias("band", "bval")
    )
    keys = ["band", "bval", *block_cols]
    if max_bucket is not None:
        hot = (
            bands.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket)
            .select(*keys)
        )
        bands = bands.join(F.broadcast(hot), keys, "left_anti")
    a = bands.select(*keys, F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = bands.select(*keys, F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.join(b, keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        # a close pair can agree on several bands — dedupe before verify
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    return (
        pairs.withColumn("hamming", hamming_distance(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# connected components: near-dup PAIRS -> canonical cluster assignment
# ---------------------------------------------------------------------------


def _two_phase_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 40,
) -> DataFrame:
    """Two-Phase connected components (Kiveris et al., "Connected
    Components in MapReduce and Beyond", Algorithm 3): alternate

    - LARGE-STAR: per node u with m = min(neighbors(u) + {u}), re-point
      every strictly LARGER neighbor v > u at m;
    - SMALL-STAR: direct every edge large->small, then per node u with
      m = min(smaller-neighbors + {u}), point every smaller neighbor AND
      u itself at m;

    until the edge set is stable — provably a star forest whose centers
    are the component MINIMA, reached in O(log n) rounds on ANY graph
    (hash-min label propagation needs diameter rounds — a 10k-node path
    converges here in ~14 alternations vs 10k). Both operations preserve
    connectivity, so correctness never depends on the round count.

    Scale: each phase is one groupBy-min + one join over the CURRENT
    edge set (which only shrinks toward n-1 star edges); convergence is
    a (count, xxhash64-sum) checksum — one scalar row per round, no
    edge-set comparison join. Lineage is cut per round with
    localCheckpoint, same as the hash-min path."""
    # raw edges materialize ONCE (the upstream pair-generation plan would
    # otherwise recompute for the node inventory and both union branches)
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .repartition("u")
        .localCheckpoint(eager=True)
    )
    # nodes from the RAW edge set: a self-loop-only node still labels
    # itself (hash-min parity)
    nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _checksum(df: DataFrame) -> tuple:
        # decimal(38,0) sum: int64 hash sums overflow under ANSI mode
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _checksum(e)
    for _ in range(max_rounds):
        # LARGE-STAR over the bidirected view
        bi = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = bi.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        e = (
            bi.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # SMALL-STAR over the large->small directed view
        d = e.select(
            F.greatest(F.col("u"), F.col("v")).alias("du"),
            F.least(F.col("u"), F.col("v")).alias("dv"),
        )
        mins2 = d.groupBy("du").agg(F.min("dv").alias("m"))
        to_m = d.join(mins2, "du").select(F.col("dv").alias("u"), F.col("m").alias("v"))
        self_m = mins2.select(F.col("du").alias("u"), F.col("m").alias("v"))
        e = (
            to_m.unionByName(self_m)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(e)
        if cur == prev:  # fixed point: star forest centered at minima
            labels = nodes.join(e, nodes["node"] == e["u"], "left").select(
                "node", F.coalesce(F.col("v"), F.col("node")).alias("cluster_id")
            )
            return labels
        prev = cur
    raise RuntimeError(
        f"two-phase connected components did not converge in {max_rounds} "
        "rounds — at O(log n) convergence this indicates a bug or a graph "
        f"of > 2^{max_rounds} nodes"
    )


def _driver_union_find(e0: DataFrame) -> DataFrame:
    """Union-find over a BOUNDED, already-materialized edge list (the
    small-graph fast path of connected_components — see its docstring
    for the gating). Representative = component minimum, matching the
    distributed paths exactly. Path-halving keeps it near-linear."""
    rows = e0.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo  # min id stays the representative
    out = [(n, find(n)) for n in parent]
    spark = e0.sparkSession
    node_type = e0.schema.fields[0].dataType
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("cluster_id", node_type)]
    )
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    algorithm: str = "auto",
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Cluster assignment over an undirected edge set: -> one row per
    node appearing in ``edges`` with ``(node, cluster_id)`` where
    cluster_id is the MINIMUM node id reachable from it — the canonical
    "keeper" semantics a dedup pipeline needs to go from near-dup PAIRS
    (MinHash/SimHash/Jaccard output) to per-document keep/drop
    decisions with transitivity (a~b, b~c => one cluster even when a~c
    was never scored).

    Algorithm: hash-min label propagation — every node starts as its
    own label; each round every node takes the min of its own and its
    neighbors' labels; fixpoint = components. Fully DataFrame-native
    (join + groupBy.min per round, no Python in the loop).

    Scale (100 TB posture): per round ONE shuffle join (edges x labels
    on node id) + one min-agg; labels monotonically decrease, so
    convergence is checked with a cheap sum() probe (strictly smaller
    iff anything changed — no second join). The probe's collect() is a
    ONE-ROW aggregate scalar per round (the loop-control value a driver
    must see), never row data. Rounds needed = graph
    DIAMETER: near-dup graphs are stars and short chains, so a handful
    in practice; ``max_iterations`` bounds adversarial chains. Lineage is
    cut every round with localCheckpoint — iterative joins otherwise
    stack plans until the optimizer chokes; on a real cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()``.

    ``algorithm`` selects the strategy:
    - "auto" (default): if the materialized edge set is at most
      ``small_graph_threshold`` rows, a driver-side union-find finishes
      in milliseconds — banded dedup blocking emits a pair set orders of
      magnitude smaller than the corpus, and paying one Spark job per
      graph-diameter round for a few hundred edges is pure overhead
      (measured: 562 edges x ~0.5 s/round dominated the bench entry).
      The collect is BOUNDED by the threshold (~100k edges = a few MB)
      and gated by an exact count of the already-checkpointed edges.
      Larger edge sets run distributed hash-min (cheapest per round);
      if the diameter then exceeds ``max_iterations``, AUTO-SWITCHES to
      the O(log n) two-phase large-star/small-star algorithm
      (_two_phase_components, Kiveris et al.) instead of raising — a
      10k-node path graph converges in ~14 alternations;
    - "hashmin": distributed loop only; the bound raises (callers that
      want the refusal);
    - "twophase": straight to large-star/small-star.
    """
    if algorithm not in ("auto", "hashmin", "twophase"):
        raise ValueError(f"unknown connected-components algorithm {algorithm!r}")
    if algorithm == "twophase":
        return _two_phase_components(edges, src=src, dst=dst)
    # materialize the RAW edge list first: the bidirectional union embeds
    # the (often expensive) upstream pair-generation plan twice, so
    # checkpointing only `und` computed that upstream twice in one job
    # (measured: the banded-Jaccard upstream dominated the whole entry)
    e0 = edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev")).localCheckpoint(
        eager=True
    )
    if algorithm == "auto" and small_graph_threshold and e0.count() <= small_graph_threshold:
        return _driver_union_find(e0)
    und = e0.unionByName(e0.select(F.col("ev").alias("eu"), F.col("eu").alias("ev")))
    und = und.repartition("eu").localCheckpoint(eager=True)

    def _probe_and_checkpoint(df: DataFrame) -> tuple[DataFrame, int]:
        """Materialize the round's labels AND read the convergence scalar
        in ONE job: a LAZY localCheckpoint materializes on the first
        action, and the one-row sum agg is that action — vs the r10
        shape (eager checkpoint job + separate agg job) this halves the
        per-round job count (bench: the loop cost is fixed overhead, not
        data)."""
        df = df.localCheckpoint(eager=False)
        s = df.agg(F.sum("comp").alias("s")).collect()[0]["s"]
        return df, s

    # seed labels at min(self, direct neighbors) — exactly the result of
    # what used to be round 1, computed in the same single shuffle the
    # old node-distinct init cost; saves one full loop round
    labels, probe = _probe_and_checkpoint(
        und.groupBy(F.col("eu").alias("node"))
        .agg(F.min("ev").alias("nbr_min"))
        .select("node", F.least(F.col("node"), F.col("nbr_min")).alias("comp"))
    )
    for _ in range(max_iterations):
        nbr = (
            und.join(labels, und["ev"] == labels["node"], "inner")
            .select(F.col("eu").alias("nd"), F.col("comp"))
            .groupBy("nd")
            .agg(F.min("comp").alias("nbr_min"))
        )
        new_labels, new_probe = _probe_and_checkpoint(
            labels.join(nbr, labels["node"] == nbr["nd"], "left").select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        labels.unpersist()
        labels = new_labels
        if new_probe == probe:  # labels only decrease: equal sum = fixpoint
            return labels.select("node", F.col("comp").alias("cluster_id"))
        probe = new_probe
    if algorithm == "auto":
        import logging

        logging.getLogger(__name__).warning(
            "connected_components: hash-min did not converge in %d rounds "
            "(graph diameter exceeds the bound); switching to the O(log n) "
            "two-phase large-star/small-star algorithm",
            max_iterations,
        )
        return _two_phase_components(edges, src=src, dst=dst)
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(graph diameter exceeds the bound; raise max_iterations or use "
        'algorithm="twophase"/"auto" for the O(log n) star-contraction path)'
    )


def fuzzy_dedup_keep_decisions(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_iterations: int = 25,
    hash_family: str = "murmur3",
) -> DataFrame:
    """The END-TO-END fuzzy-dedup pipeline a training corpus needs, as
    one composition: MinHash signatures -> LSH banding -> exact-Jaccard
    verification (minhash_near_duplicates) -> transitive clusters
    (connected_components) -> per-document KEEP decision. Returns one
    row per document that belongs to any near-dup cluster:
    (doc_id, cluster_id, keep) where keep is true only for the cluster's
    minimum doc id (the canonical keeper). Documents with no near-dup
    never appear — a corpus filter is
    ``docs.join(out.filter(~out.keep), id_col, "left_anti")``.

    Scale: inherits the LSH path's bounded buckets (no all-pairs), plus
    the component loop's one-shuffle-per-round over EDGES only (the
    pair set, a tiny fraction of the corpus — never the corpus itself).
    """
    pairs = minhash_near_duplicates(
        docs,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        hash_family=hash_family,
    ).select("doc_a", "doc_b")
    comp = connected_components(
        pairs, src="doc_a", dst="doc_b", max_iterations=max_iterations
    )
    return comp.select(
        F.col("node").alias(id_col),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("keep"),
    )


def embedding_near_duplicates_md5(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 24,
    n_bands: int = 3,
) -> DataFrame:
    """ORACLE-EXPRESSIBLE unlabeled embedding near-dup pairs (r14): the
    integer md5-hyperplane variant of embedding_near_duplicates.
    Signatures come from ann.md5_sign_signatures (one Arrow integer
    matmul — bit-exact on every engine); candidates meet inside
    (band, 8-bit band value) buckets (24 planes / 3 bands: pairs within
    <= 2 sign disagreements are guaranteed candidates by pigeonhole);
    exact double cosine verifies >= threshold. Returns
    (vec_a, vec_b, cos_sim rounded to 6). A DuckDB oracle replays
    bucketing, candidate generation AND the verify value-for-value.

    Scale: buckets per band = 2^(n_planes/n_bands) (256 at 24/3) —
    bounded candidate streams, one band self-join shuffle + one pair
    distinct; vectors re-attach by id after the narrow dedupe (the
    ann_lsh plan rule)."""
    from incubator_xtable_spark.operators.ann import md5_sign_signatures

    if n_planes % n_bands:
        raise ValueError("n_planes must divide into n_bands equal slices")
    band_bits = n_planes // n_bands
    mask = (1 << band_bits) - 1
    parallelism = vectors.sparkSession.sparkContext.defaultParallelism
    if vectors.rdd.getNumPartitions() < parallelism:
        vectors = vectors.repartition(parallelism)
    # lazily localCheckpointed (r15): both sides of the band self-join
    # read this frame — unmaterialized, the scan + md5 signature kernel
    # evaluates twice (the non-md5 variant below already materializes its
    # band keys for exactly this reason; this variant had missed it)
    sigs = md5_sign_signatures(
        vectors, id_col=id_col, vec_col=vec_col, dim=dim, n_planes=n_planes
    ).localCheckpoint(eager=False)
    banded = sigs.select(
        "kid",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), b * band_bits)
                    .bitwiseAND(F.lit(mask))
                    .cast("int")
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bval"),
    )
    a = banded.select("band", "bval", F.col("kid").alias("vec_a"))
    b = banded.select("band", "bval", F.col("kid").alias("vec_b"))
    pairs = (
        a.join(b, ["band", "bval"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # exact-cosine verify: bounded corpora gather rows from ONE broadcast
    # matrix (ids-only boundary payload), larger corpora re-attach vectors
    # by id — operators/ann.cos_verify_pairs, bit-identical either tier
    # (sequential-sum dots both ways, so the DuckDB oracle's replay of the
    # verify VALUE is unaffected)
    from incubator_xtable_spark.operators.ann import cos_verify_pairs

    return (
        cos_verify_pairs(pairs, vectors, id_col=id_col, vec_col=vec_col, dim=dim)
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """UNLABELED embedding near-duplicate pairs — the SemDeDup-shaped
    operator a real 100 TB pipeline runs (real corpora carry no label
    column to block on). Returns (vec_a, vec_b, cos_sim) with
    vec_a < vec_b and exact cosine >= threshold.

    Blocking: n_bands independent random-hyperplane LSH tables
    (operators/ann.lsh_bucket — the ann_lsh_topk banding shape applied
    to a SELF-join). Candidates meet only inside (band, bucket) groups;
    with multiprobe, each vector additionally posts its n_planes
    1-bit-flip neighbor buckets on ONE side of the join (covering band
    keys at Hamming distance <= 1 in either direction, since every
    vector appears on both sides before the canonical least/greatest
    pairing). Exact cosine verifies every surviving pair — LSH decides
    only WHO gets compared, never the similarity value.

    Recall (random-hyperplane theory, collision prob per plane
    1 - theta/pi): at cos >= 0.9 a Hamming<=1 band match happens with
    p ~ 0.67 per 8-plane band, so 8 bands miss a true pair with prob
    ~ (1-p)^8 < 1e-3; the pytest gate plants near-identical vectors and
    requires >= 0.9 recall vs the exact all-pairs baseline.

    Scale (100 TB posture): NO all-pairs and NO label crutch — the
    candidate stream is (bucket, id) only (narrow rows), bucket
    population is bounded by 2^n_planes per band times the data's
    direction distribution, and sum over buckets of |bucket|^2 stays
    subquadratic for any corpus that isn't a single direction. Shuffles:
    one bucket self-join + one pair distinct + one vector re-attach;
    vectors (dim-sized arrays) never ride the explode — they re-attach
    by id AFTER the dedupe, the ann_lsh_topk lesson. Versus the
    label-blocked dedup_embedding_cosine registry entry (an ORACLE
    BASELINE, O(N^2/L) within labels): this is the recipe that survives
    a 100x scale-up."""
    from incubator_xtable_spark.operators.ann import lsh_band_keys_arrow

    vectors = _spread(vectors)

    # band keys via ONE Arrow-batched numpy matmul (r11: the pure-JVM
    # lsh_bucket_bands HOF tree cost ~2 s/evaluation at sf0.1 — ~8M
    # interpreted lambda calls; the matmul is ~10 ms/batch), lazily
    # localCheckpointed so the exact and probe branches of the self-join
    # read the SAME materialized keys instead of projecting twice
    keyed = lsh_band_keys_arrow(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        n_planes=n_planes,
        n_bands=n_bands,
        seed=seed,
    ).localCheckpoint(eager=False)
    # narrow candidate stream: (band-prefixed bucket, id); exact buckets
    # on the left, exact + 1-bit-flip probes on the right. Band-prefixing
    # is an INT compose (band * 2^n_planes + key) — a 1:1 relabel of the
    # old "band:key" strings (same collisions, same pairs) that shuffles
    # 4-byte ints instead of strings (guide §2.3 narrower types)
    stride = 1 << n_planes
    exact = keyed.select(
        F.col("kid").alias("lid"),
        F.explode(
            F.array(
                *[
                    (F.lit(b * stride) + F.col(f"b{b}")).cast("int")
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )
    probe_cols = []
    for b in range(n_bands):
        key = F.col(f"b{b}")
        probe_cols.append((F.lit(b * stride) + key).cast("int"))
        if multiprobe:
            probe_cols.extend(
                (F.lit(b * stride) + key.bitwiseXOR(F.lit(2**i))).cast("int")
                for i in range(n_planes)
            )
    probed = keyed.select(
        F.col("kid").alias("rid"), F.explode(F.array(*probe_cols)).alias("bucket")
    )
    pairs = (
        exact.join(probed, "bucket")
        .filter(F.col("lid") != F.col("rid"))
        # canonical orientation BEFORE distinct: a collision seen only as
        # (exact of y, probe of x) must still yield the (min, max) pair
        .select(
            F.least("lid", "rid").alias("vec_a"),
            F.greatest("lid", "rid").alias("vec_b"),
        )
        .distinct()
    )
    # exact-cosine verify: bounded corpora gather rows from ONE broadcast
    # matrix (ids-only boundary payload), larger corpora re-attach vectors
    # by id — operators/ann.cos_verify_pairs, bit-identical either tier
    from incubator_xtable_spark.operators.ann import cos_verify_pairs

    return (
        cos_verify_pairs(pairs, vectors, id_col=id_col, vec_col=vec_col, dim=dim)
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing (MOSS) fingerprint sets: rolling k-token-gram 32-bit
    hashes, minimum per w-window, distinct — any shared token run of
    length >= w + k - 1 between two documents is GUARANTEED to share a
    fingerprint (robust to insertions, unlike positional hashing).
    Narrow per-row projection (array HOFs, no shuffle); the registry's
    text_winnow_fingerprint pins the selection against DuckDB."""
    tk = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(1, size(tk) - {k - 1}),"
        f" i -> cast(conv(substring(md5(array_join(slice(tk, i, {k}), ' ')), 1, 8),"
        "              16, 10) AS LONG))"
    )
    wins = F.expr(
        f"array_distinct(transform(sequence(1, size(hs) - {w - 1}),"
        f" w_i -> array_min(slice(hs, w_i, {w}))))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), tk.alias("tk"))
        .filter(F.size("tk") >= k + w - 1)
        .select("doc_id", grams.alias("hs"))
        .select("doc_id", wins.alias("fingerprints"))
    )


def winnow_near_duplicates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints:
    (doc_a, doc_b, n_shared) for pairs sharing >= min_shared
    fingerprints. The inverted-index shape: explode fingerprint sets,
    self-join inside fingerprint buckets, count per pair.

    Scale: ONE shuffle groups postings by fingerprint; "stop
    fingerprints" appearing in more than max_bucket documents are
    dropped before the self-join (a common phrase would otherwise make
    one bucket quadratic — same reason text search engines drop stop
    words), so bucket joins stay bounded. Quadratic blowup is impossible
    by construction: sum over buckets of |bucket|^2 <= N * max_bucket."""
    fp = winnow_fingerprints(
        _spread(docs), id_col=id_col, text_col=text_col, k=k, w=w
    ).select("doc_id", F.explode("fingerprints").alias("fp"))
    # stop-fingerprint filter: bound every bucket
    counts = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    fp = fp.join(
        F.broadcast(counts.filter(F.col("n_docs") > max_bucket).select("fp")),
        "fp",
        "left_anti",
    )
    left = fp.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    right = fp.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    pairs = left.join(right, "fp").filter(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def embedding_dedup_keep_decisions(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """SemDeDup-shaped END-TO-END embedding dedup: LSH-blocked exact-
    cosine near-dup pairs (embedding_near_duplicates) -> transitive
    clusters (connected_components) -> per-vector KEEP decision
    (keeper = min id per cluster). One row per vector belonging to any
    near-dup cluster: (vec_id, cluster_id, keep); corpus filter is
    ``vectors.join(out.filter(~out.keep), id_col, "left_anti")``.
    Scale: inherits the banded-bucket bounds; the component stage sees
    only the PAIR set (tiny vs the corpus) and takes the bounded
    union-find fast path when small."""
    pairs = embedding_near_duplicates(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        threshold=threshold,
        n_planes=n_planes,
        n_bands=n_bands,
        seed=seed,
        multiprobe=multiprobe,
    ).select("vec_a", "vec_b")
    comp = connected_components(pairs, src="vec_a", dst="vec_b")
    return comp.select(
        F.col("node").alias(id_col),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("keep"),
    )
