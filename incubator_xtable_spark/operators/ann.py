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

import os

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


def lsh_bucket_bands(
    vec: Column, dim: int, n_planes: int, n_bands: int, seed: int = 42
) -> Column:
    """Array of n_bands LSH bucket keys as ONE expression: a single 3-D
    (band, plane, dim) hyperplane literal + nested transforms. Value-
    identical to ``lsh_bucket(vec, dim, n_planes, seed + 1000*band)``
    per band (pinned by pytest) but a ~3-node tree instead of
    n_bands*n_planes separate literal/aggregate subtrees — the IVF
    "one 2-D literal" lesson: Catalyst analysis time on the fanned-out
    form dominated execution (measured ~6 s warm for 500 rows)."""
    lit3 = F.lit(
        [
            [[float(x) for x in p] for p in _hyperplanes(dim, n_planes, seed + 1000 * b)]
            for b in range(n_bands)
        ]
    )
    weights = F.lit([2**i for i in range(n_planes)])

    def band_key(band_planes: Column) -> Column:
        bits = F.transform(
            band_planes,
            lambda p: F.when(
                F.aggregate(
                    F.zip_with(vec, p, lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        return F.aggregate(
            F.zip_with(bits, weights, lambda b, w: b * w), F.lit(0), lambda acc, v: acc + v
        )

    return F.transform(lit3, band_key)


def lsh_band_keys_arrow(
    vectors: "DataFrame",
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_bands: int,
    seed: int = 42,
) -> "DataFrame":
    """(kid, b0..b{n_bands-1}) band keys via ONE Arrow-batched numpy
    projection: each batch is a single (n, dim) @ (dim, bands*planes)
    float64 matmul + sign + bit-weight sum — vectorized C per batch
    instead of Catalyst's per-element interpreted HOF lambdas.

    Why not the pure-JVM lsh_bucket_bands expression here: measured at
    sf0.1 (2,000 x 64-dim vectors) the nested transform/zip_with/
    aggregate tree costs ~2 s PER EVALUATION (~8M interpreted lambda
    calls + per-element allocations); the Arrow matmul is ~10 ms plus
    batch transfer. Same hyperplanes (driver-side, seed-deterministic,
    captured in the closure — no worker-side repo imports), so recall
    properties are identical; keys are row-local, hence partition-layout
    invariant. Sign ties at dot==0.0 may resolve differently than the
    JVM fold (summation order), which changes WHO gets compared, never
    a verified similarity value. Scale: map-only, zero shuffles, zero
    driver collects; the hyperplane literal is (bands*planes*dim)
    floats broadcast once in the closure."""
    import pyarrow as _pa_mod  # noqa: F401 — assert availability at plan time

    H = np.asarray(
        [_hyperplanes(dim, n_planes, seed + 1000 * b) for b in range(n_bands)],
        dtype=np.float64,
    )
    planes_t = np.ascontiguousarray(H.reshape(n_bands * n_planes, dim).T)
    weights = 2 ** np.arange(n_planes, dtype=np.int64)
    out_schema = ", ".join(["kid LONG"] + [f"b{b} INT" for b in range(n_bands)])
    nb, npl, d = n_bands, n_planes, dim

    def _keys(batches):
        import numpy as _np
        import pyarrow as _pa

        for batch in batches:
            ids = batch.column(0)
            lst = batch.column(1)
            if lst.null_count:
                raise ValueError("lsh_band_keys_arrow: null vectors are not bucketable")
            flat = lst.flatten().to_numpy(zero_copy_only=False)
            if len(flat) != len(ids) * d:
                raise ValueError(
                    f"lsh_band_keys_arrow: expected uniform dim {d}, got "
                    f"{len(flat)} values for {len(ids)} vectors"
                )
            arr = _np.asarray(flat, dtype=_np.float64).reshape(len(ids), d)
            bits = (arr @ planes_t) > 0.0
            keys = (bits.reshape(-1, nb, npl) * weights).sum(axis=2).astype(_np.int32)
            yield _pa.record_batch(
                [ids] + [_pa.array(keys[:, b]) for b in range(nb)],
                names=["kid"] + [f"b{b}" for b in range(nb)],
            )

    return vectors.select(
        F.col(id_col).cast("long").alias("kid"), F.col(vec_col).alias("v")
    ).mapInArrow(_keys, out_schema)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _flat2d(lst, n: int, dim: int, what: str) -> "np.ndarray":
    """Arrow list column -> (n, dim) float64, refusing ragged/null input."""
    if lst.null_count:
        raise ValueError(f"{what}: null vectors are not scorable")
    flat = lst.flatten().to_numpy(zero_copy_only=False)
    if len(flat) != n * dim:
        raise ValueError(
            f"{what}: expected uniform dim {dim}, got {len(flat)} values for {n} rows"
        )
    return np.asarray(flat, dtype=np.float64).reshape(n, dim)


def _seq_dot_rows(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    """Per-row dot product in STRICT left-to-right accumulation order —
    bit-identical to the JVM ``dot`` fold (((0+x0*y0)+x1*y1)+...), which
    is what keeps Arrow-scored values equal to the HOF-scored values the
    DuckDB oracles replay. One vectorized add per dimension instead of
    one interpreted Catalyst lambda call per element (~1 us each)."""
    acc = np.zeros(len(a), dtype=np.float64)
    for j in range(a.shape[1]):
        acc += a[:, j] * b[:, j]
    return acc


def attach_cos_raw_arrow(
    df: DataFrame,
    *,
    dim: int,
    keep: list[str],
    qv_col: str = "qv",
    cv_col: str = "cv",
) -> DataFrame:
    """Append ``cos_raw`` = dot(qv, cv) / (||qv|| * ||cv||) via ONE Arrow
    pass, preserving the exact IEEE semantics of the JVM expression it
    replaces (sequential-order dots and norms, sqrt, then the same
    multiply/divide shape) — so rounded outputs, window orderings and
    oracle hashes are unchanged. ``df`` must carry ``qv``/``cv`` array
    columns; ``keep`` lists the pass-through output columns.

    Why: the per-candidate rerank cosine was a Catalyst HOF fold —
    interpreted per element, measured ~1 us/element/core — so a 75k-pair
    rerank at dim 64 burned ~5M lambda calls per side. The kernel is a
    handful of vectorized ops per batch. Map-only, no shuffle change."""
    from pyspark.sql import types as T

    fields = [next(f for f in df.schema.fields if f.name == c) for c in keep]
    out_schema = T.StructType(
        [*fields, T.StructField("cos_raw", T.DoubleType(), True)]
    )
    idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    keep_idx = [idx[c] for c in keep]
    qv_i, cv_i = idx[qv_col], idx[cv_col]
    d_ = dim

    def _cos(batches):
        import numpy as _np
        import pyarrow as _pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            q = _flat2d(rb.column(qv_i), n, d_, "attach_cos_raw_arrow(qv)")
            c = _flat2d(rb.column(cv_i), n, d_, "attach_cos_raw_arrow(cv)")
            cos = _seq_dot_rows(q, c) / (
                _np.sqrt(_seq_dot_rows(q, q)) * _np.sqrt(_seq_dot_rows(c, c))
            )
            yield _pa.record_batch(
                [rb.column(i) for i in keep_idx] + [_pa.array(cos)],
                names=[*keep, "cos_raw"],
            )

    return df.mapInArrow(_cos, out_schema)


def _broadcast_vecs_max_bytes() -> int:
    """Bounded-corpus gate for the gather-verify path (0 disables).

    Same auto-gating pattern as connected_components' union-find and the
    driver footer path: when the RAW vector matrix fits comfortably in a
    broadcast (default 64 MB — the session's autoBroadcastJoinThreshold),
    shipping two id columns to the Python workers and gathering rows from
    one broadcast matrix beats re-attaching a dim-sized array payload to
    every candidate pair. The gate is on BYTES of the corpus, not SF: a
    100 TB corpus always takes the join path below."""
    try:
        return int(os.environ.get("XT_BROADCAST_VECS_MAX_BYTES", str(64 * 1024 * 1024)))
    except ValueError:
        return 64 * 1024 * 1024


def _probe_vec_table(frame: DataFrame, idc: str, vecc: str, max_rows: int):
    """Short-circuiting boundedness probe shared by the gather tiers:
    collect up to ``max_rows + 1`` (kid, v) rows as ONE Arrow table;
    return it when the frame proved bounded, else None (the caller then
    takes the join tier). A 100 TB corpus pays one cheap limit probe,
    never a full collect."""
    tbl = (
        frame.select(
            F.col(idc).cast("long").alias("kid"),
            F.col(vecc).cast("array<double>").alias("v"),
        )
        .limit(max_rows + 1)
        .toArrow()
    )
    return tbl if tbl.num_rows <= max_rows else None


def _sorted_vec_matrix(tbl, dim: int, what: str):
    """(ids_sorted, mat_sorted) from a ``_probe_vec_table`` result —
    stable-argsorted by id so kernels can searchsorted-gather."""
    ids = tbl.column("kid").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _flat2d(tbl.column("v").combine_chunks(), len(ids), dim, what)
    order = np.argsort(ids, kind="stable")
    return ids[order], np.ascontiguousarray(mat[order])


def cos_verify_pairs(
    pairs: DataFrame,
    vectors: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    a_col: str = "vec_a",
    b_col: str = "vec_b",
) -> DataFrame:
    """``cos_raw`` for an (a_col, b_col) candidate-id pair stream against
    a vector corpus keyed by unique ``id_col`` — the verify step of every
    embedding near-dup path. Output: (a_col, b_col, cos_raw).

    Two tiers, bit-identical values (both run ``_seq_dot_rows`` — the
    strict left-to-right JVM-fold order the DuckDB oracles replay):

    - BOUNDED corpora (raw matrix <= XT_BROADCAST_VECS_MAX_BYTES,
      default 64 MB; probed with a short-circuiting limit(n+1), so a
      100 TB corpus pays one cheap probe, never a collect): the corpus
      ships ONCE as a broadcast ndarray and only the two id columns
      cross the Python boundary per pair. Versus the join tier this
      removes two joins from the plan and cuts the boundary payload
      from 2*dim doubles per pair to 2 longs (measured 0.5 GB -> 8 MB
      for a 526k-pair verify at dim 64, guide §8: move keys, not
      payloads). Pairs whose id is absent from the corpus drop, exactly
      like the inner joins they replace.
    - LARGER corpora: re-attach vectors by id (two joins) and score via
      ``attach_cos_raw_arrow`` — the shape that needs no driver memory.
    """
    limit_bytes = _broadcast_vecs_max_bytes()
    max_rows = limit_bytes // (dim * 8) if limit_bytes > 0 else 0
    corpus = None
    if max_rows > 0:
        probe = (
            vectors.select(
                F.col(id_col).cast("long").alias("kid"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            .limit(max_rows + 1)
            .toArrow()
        )
        if probe.num_rows <= max_rows:
            corpus = probe
    if corpus is None:
        va = vectors.select(
            F.col(id_col).cast("long").alias(a_col), F.col(vec_col).alias("__av")
        )
        vb = vectors.select(
            F.col(id_col).cast("long").alias(b_col), F.col(vec_col).alias("__bv")
        )
        return attach_cos_raw_arrow(
            pairs.select(a_col, b_col).join(va, a_col).join(vb, b_col),
            dim=dim,
            keep=[a_col, b_col],
            qv_col="__av",
            cv_col="__bv",
        )

    ids = corpus.column("kid").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _flat2d(corpus.column("v").combine_chunks(), len(ids), dim, "cos_verify_pairs")
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order]
    mat_sorted = np.ascontiguousarray(mat[order])
    # per-vector norms once (same _seq_dot_rows accumulation the join tier
    # runs per PAIR row — identical input row, identical double)
    norms_sorted = np.sqrt(_seq_dot_rows(mat_sorted, mat_sorted))
    bc = pairs.sparkSession.sparkContext.broadcast((ids_sorted, mat_sorted, norms_sorted))

    from pyspark.sql import types as T

    a_t = next(f.dataType for f in pairs.schema.fields if f.name == a_col)
    b_t = next(f.dataType for f in pairs.schema.fields if f.name == b_col)
    out_schema = T.StructType(
        [
            T.StructField(a_col, a_t, True),
            T.StructField(b_col, b_t, True),
            T.StructField("cos_raw", T.DoubleType(), True),
        ]
    )

    def _gather_cos(batches):
        import numpy as _np
        import pyarrow as _pa

        kids, kmat, knorm = bc.value

        def _lookup(col):
            want = col.to_numpy(zero_copy_only=False).astype(_np.int64)
            pos = _np.searchsorted(kids, want)
            pos_c = _np.clip(pos, 0, len(kids) - 1)
            ok = kids[pos_c] == want
            return pos_c, ok

        for rb in batches:
            if rb.num_rows == 0:
                continue
            ia, ok_a = _lookup(rb.column(0).cast("int64"))
            ib, ok_b = _lookup(rb.column(1).cast("int64"))
            keep = ok_a & ok_b
            if not keep.all():
                rb = rb.take(_pa.array(_np.flatnonzero(keep), type=_pa.int64()))
                ia, ib = ia[keep], ib[keep]
                if rb.num_rows == 0:
                    continue
            cos = _seq_dot_rows(kmat[ia], kmat[ib]) / (knorm[ia] * knorm[ib])
            yield _pa.record_batch(
                [rb.column(0), rb.column(1), _pa.array(cos)],
                names=[a_col, b_col, "cos_raw"],
            )

    return pairs.select(a_col, b_col).mapInArrow(_gather_cos, out_schema)


def cos_rerank_pairs(
    pairs: DataFrame,
    qv: DataFrame,
    cv: DataFrame,
    *,
    dim: int,
    q_tbl=None,
) -> DataFrame:
    """``cos_raw`` for an ANN (q_id, c_id) shortlist against a query
    frame ``qv`` = (q_id, qv) and a candidate frame ``cv`` = (c_id, cv)
    — the rerank step shared by every ANN path (``cv`` may already be
    cell/partition-pruned; the probe below then collects only pruned
    rows). Output: (q_id, c_id, cos_raw).

    Same two tiers as ``cos_verify_pairs``, bit-identical values
    (_seq_dot_rows both ways): when BOTH frames fit the
    XT_BROADCAST_VECS_MAX_BYTES gate (short-circuiting limit(n+1)
    probes), only the id pairs cross the Python boundary and the two
    matrices ride one broadcast — removing the two re-attach joins and
    the per-pair array payload from the plan; otherwise the unchanged
    join tier (stream cv, broadcast qv) runs. Pairs naming an id absent
    from either frame drop, exactly like the inner joins.

    ``q_tbl`` accepts a pre-probed Arrow table for ``qv`` (the exact
    ``_probe_vec_table`` output a caller already collected, e.g. the
    IVFADC scorer's query broadcast) so one collect serves both the ADC
    gather and this rerank instead of re-running the probe job."""
    limit_bytes = _broadcast_vecs_max_bytes()
    max_rows = limit_bytes // (dim * 8) if limit_bytes > 0 else 0

    if q_tbl is None and max_rows > 0:
        q_tbl = _probe_vec_table(qv, "q_id", "qv", max_rows)
    c_tbl = _probe_vec_table(cv, "c_id", "cv", max_rows) if q_tbl is not None else None
    if c_tbl is None:
        return attach_cos_raw_arrow(
            pairs.select("q_id", "c_id").join(cv, "c_id").join(F.broadcast(qv), "q_id"),
            dim=dim,
            keep=["q_id", "c_id"],
        )

    q_ids, q_mat = _sorted_vec_matrix(q_tbl, dim, "cos_rerank_pairs(qv)")
    c_ids, c_mat = _sorted_vec_matrix(c_tbl, dim, "cos_rerank_pairs(cv)")
    q_norm = np.sqrt(_seq_dot_rows(q_mat, q_mat))
    c_norm = np.sqrt(_seq_dot_rows(c_mat, c_mat))
    bc = pairs.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, q_norm, c_ids, c_mat, c_norm)
    )

    from pyspark.sql import types as T

    q_t = next(f.dataType for f in pairs.schema.fields if f.name == "q_id")
    c_t = next(f.dataType for f in pairs.schema.fields if f.name == "c_id")
    out_schema = T.StructType(
        [
            T.StructField("q_id", q_t, True),
            T.StructField("c_id", c_t, True),
            T.StructField("cos_raw", T.DoubleType(), True),
        ]
    )

    def _gather_cos(batches):
        import numpy as _np
        import pyarrow as _pa

        qi, qm, qn, ci, cm, cn = bc.value

        def _lookup(col, kids):
            want = col.to_numpy(zero_copy_only=False).astype(_np.int64)
            pos = _np.searchsorted(kids, want)
            pos_c = _np.clip(pos, 0, max(len(kids) - 1, 0))
            ok = kids[pos_c] == want if len(kids) else _np.zeros(len(want), bool)
            return pos_c, ok

        for rb in batches:
            if rb.num_rows == 0:
                continue
            iq, ok_q = _lookup(rb.column(0).cast("int64"), qi)
            ic, ok_c = _lookup(rb.column(1).cast("int64"), ci)
            keep = ok_q & ok_c
            if not keep.all():
                rb = rb.take(_pa.array(_np.flatnonzero(keep), type=_pa.int64()))
                iq, ic = iq[keep], ic[keep]
                if rb.num_rows == 0:
                    continue
            cos = _seq_dot_rows(qm[iq], cm[ic]) / (qn[iq] * cn[ic])
            yield _pa.record_batch(
                [rb.column(0), rb.column(1), _pa.array(cos)],
                names=["q_id", "c_id", "cos_raw"],
            )

    return pairs.select("q_id", "c_id").mapInArrow(_gather_cos, out_schema)


def attach_adc_arrow(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    dim: int,
    keep: list[str],
    base_col: str | None = None,
    qv_bc=None,
) -> DataFrame:
    """Append ``approx_dot`` — the PQ/IVFADC compressed-domain score
    sum_j <q_sub_j, book_j[code_j]> (plus ``base_col``, the per-probe
    <q, centroid_cell> term, when given) — via ONE Arrow pass with a
    codebook GATHER per subspace, replacing the chain of m Catalyst HOF
    aggregates that evaluated interpreted per element per candidate.
    Accumulation order is preserved exactly (base term first, then
    subspaces in order, each subspace's dims left-to-right), so the
    shortlist ordering matches the HOF chain bit-for-bit.

    ``qv_bc`` (r14, guide §8 "move keys, not payloads"): a broadcast of
    ``(q_ids_sorted, q_mat_sorted)`` built from the SAME bounded query
    frame the join would otherwise attach. When given, ``df`` carries NO
    ``qv`` column — the kernel gathers each row's query vector by
    ``q_id`` from the broadcast, so the Python boundary ships 8 bytes of
    key instead of ``dim`` doubles per candidate row (dim 64: 512 B ->
    8 B, the dominant boundary payload of the scoring join). The gathered
    rows are the identical float64s the join delivered, so approx_dot is
    bit-for-bit unchanged; a q_id absent from the broadcast cannot occur
    (the probe rows derive from the same frame) and raises loudly.

    This is the textbook ADC formulation: the codebook reconstruction is
    a (n,) integer gather into an (n_codes, sub) array — vectorized C —
    instead of element_at on a 2-D literal per row."""
    from pyspark.sql import types as T

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = dim // m
    fields = [next(f for f in df.schema.fields if f.name == c) for c in keep]
    out_schema = T.StructType(
        [*fields, T.StructField("approx_dot", T.DoubleType(), True)]
    )
    idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    keep_idx = [idx[c] for c in keep]
    qv_i = None if qv_bc is not None else idx["qv"]
    qid_i = idx["q_id"] if qv_bc is not None else None
    codes_i = idx["codes"]
    base_i = idx[base_col] if base_col is not None else None
    d_ = dim

    def _adc(batches):
        import numpy as _np
        import pyarrow as _pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            if qv_bc is not None:
                q_ids, q_mat = qv_bc.value
                want = rb.column(qid_i).cast("int64").to_numpy(
                    zero_copy_only=False
                ).astype(_np.int64)
                pos = _np.searchsorted(q_ids, want)
                pos_c = _np.clip(pos, 0, max(len(q_ids) - 1, 0))
                if len(q_ids) == 0 or not (q_ids[pos_c] == want).all():
                    raise ValueError(
                        "attach_adc_arrow: q_id absent from the broadcast "
                        "query matrix (the probe rows must derive from it)"
                    )
                q = q_mat[pos_c]
            else:
                q = _flat2d(rb.column(qv_i), n, d_, "attach_adc_arrow(qv)")
            codes_l = rb.column(codes_i)
            if codes_l.null_count:
                raise ValueError("attach_adc_arrow: null code rows are not scorable")
            codes = _np.asarray(
                codes_l.flatten().to_numpy(zero_copy_only=False)
            ).reshape(n, m)
            acc = None
            if base_i is not None:
                acc = rb.column(base_i).to_numpy(zero_copy_only=False).astype(
                    _np.float64, copy=True
                )
            for j, B in enumerate(books):
                bv = B[codes[:, j]]  # (n, sub) gather
                tacc = _np.zeros(n, dtype=_np.float64)
                for t in range(sub):
                    tacc += q[:, j * sub + t] * bv[:, t]
                acc = tacc if acc is None else acc + tacc
            yield _pa.record_batch(
                [rb.column(i) for i in keep_idx] + [_pa.array(acc)],
                names=[*keep, "approx_dot"],
            )

    return df.mapInArrow(_adc, out_schema)


def _int_ids_or_none(df: DataFrame, col: str, *, long_only: bool = False):
    """The fused single-pass tiers compare/searchsorted ids as int64 (the
    same assumption the r14 gather tiers already make); non-integer id
    schemas fall back to the join tiers. ``long_only`` additionally
    requires LongType — the fused kernels EMIT q_id as int64, so a
    narrower query-id schema must keep the join tier to preserve the
    output schema exactly."""
    from pyspark.sql import types as T

    t_ = next(f.dataType for f in df.schema.fields if f.name == col)
    if long_only:
        return t_ if isinstance(t_, T.LongType) else None
    return t_ if isinstance(t_, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)) else None


def _probe_pair_expand(cell_arr, probe_cells, probe_rows_by_cell):
    """(row_pos, probe_pos) index arrays pairing every batch row whose
    cell is probed with every probe entry for that cell. Pure index
    bookkeeping — the float scoring that follows sees exactly the rows
    the broadcast probe JOIN would have produced (same pairs; per-pair
    arithmetic is row-independent, so pairing order never changes a
    value)."""
    rows_l, probes_l = [], []
    for c, pidx in zip(probe_cells, probe_rows_by_cell):
        rows = np.flatnonzero(cell_arr == c)
        if rows.size and pidx.size:
            rows_l.append(np.repeat(rows, pidx.size))
            probes_l.append(np.tile(pidx, rows.size))
    if not rows_l:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    return np.concatenate(rows_l), np.concatenate(probes_l)


def fused_adc_scores(
    corpus: DataFrame,
    *,
    dim: int,
    codebooks: list[list[list[float]]],
    qv_bc,
    probe_tbl=None,
    centroids: list[list[float]] | None = None,
    pre_encoded: bool = False,
    id_col: str = "c_id",
    vec_col: str = "cv",
    q_id_type=None,
) -> DataFrame:
    """FUSED encode + probe-join + ADC (r15, guide §4.2 / §2.4 / §8):
    ONE mapInArrow pass over the corpus that (a) PQ/IVF-encodes each raw
    batch (exact ``_encode_arrow`` float ops — same matmul argmin, same
    lowest-index tie rule; skipped when ``pre_encoded``), (b) pairs rows
    with the queries probing their cell (``probe_tbl``: the COLLECTED
    JVM-computed (q_id, cell, q_cent_dot) probe frame, so the cell list
    and base dot keep the _nearest_cells sequential-fold values
    bit-for-bit — nothing is re-derived in numpy; ``None`` = flat PQ,
    every query scores every row, no base term), and (c) emits
    (q_id, c_id, approx_dot) with the exact ``attach_adc_arrow``
    accumulation (base first, then subspaces in order, dims
    left-to-right within each) — so the shortlist ordering is
    bit-identical to the three-operator chain it replaces.

    Why: the chain was encode-kernel -> Arrow->JVM -> BroadcastExchange
    + BroadcastHashJoin on cell -> JVM->Arrow -> ADC kernel: two Python
    boundary round-trips and two codegen stages whose only job was to
    glue two numpy passes together. Scale posture unchanged: map-only
    over the corpus, zero shuffles, the probe table is |Q| x n_probe
    rows collected once (bounded-queries tier only — unbounded query
    streams keep the join tier in the callers)."""
    from pyspark.sql import types as T

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = dim // m
    C = None if centroids is None else np.asarray(centroids, dtype=np.float64)
    Cn2 = None if C is None else (C * C).sum(axis=1)
    d_ = dim

    q_ids_sorted = qv_bc.value[0]
    # driver-side: resolve each probe row's position in the broadcast
    # query matrix once (attach_adc_arrow's per-batch searchsorted hoisted)
    if probe_tbl is not None:
        p_qid = probe_tbl.column("q_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p_cell = probe_tbl.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        p_base = probe_tbl.column("q_cent_dot").to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(q_ids_sorted, p_qid)
        pos_c = np.clip(pos, 0, max(len(q_ids_sorted) - 1, 0))
        if p_qid.size and (
            len(q_ids_sorted) == 0 or not (q_ids_sorted[pos_c] == p_qid).all()
        ):
            raise ValueError(
                "fused_adc_scores: probe q_id absent from the broadcast "
                "query matrix (the probe rows must derive from it)"
            )
        probe_cells = [int(c) for c in np.unique(p_cell)]
        probe_rows_by_cell = [np.flatnonzero(p_cell == c) for c in probe_cells]
        p_qpos = pos_c
    else:
        # flat PQ: every query probes "everything"; base term absent
        p_qid = q_ids_sorted
        p_base = None
        probe_cells = None
        probe_rows_by_cell = None
        p_qpos = np.arange(len(q_ids_sorted), dtype=np.int64)

    id_field = next(f for f in corpus.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [
            T.StructField("q_id", q_id_type or T.LongType(), True),
            T.StructField("c_id", id_field.dataType, id_field.nullable),
            T.StructField("approx_dot", T.DoubleType(), True),
        ]
    )
    if pre_encoded:
        src = corpus.select(F.col(id_col).alias("c_id"), "cell", "codes")
    else:
        src = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))

    def _score(batches):
        import numpy as _np
        import pyarrow as _pa

        qm = qv_bc.value[1]
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids = rb.column(0)
            if pre_encoded:
                cell = rb.column(1).to_numpy(zero_copy_only=False).astype(_np.int64)
                codes_l = rb.column(2)
                if codes_l.null_count:
                    raise ValueError("fused_adc_scores: null code rows are not scorable")
                codes = _np.asarray(
                    codes_l.flatten().to_numpy(zero_copy_only=False)
                ).reshape(n, m)
            else:
                X = _flat2d(rb.column(1), n, d_, "fused_adc_scores(cv)")
                R = X
                cell = None
                if C is not None:
                    d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + Cn2[None, :]
                    cell = d2.argmin(axis=1)
                    R = X - C[cell]
                codes = _np.empty((n, m), dtype=_np.int64)
                for j, B in enumerate(books):
                    Rj = R[:, j * sub : (j + 1) * sub]
                    Bn2 = (B * B).sum(axis=1)
                    dj = (Rj * Rj).sum(axis=1)[:, None] - 2.0 * (Rj @ B.T) + Bn2[None, :]
                    codes[:, j] = dj.argmin(axis=1)
            if probe_cells is not None:
                rowp, pp = _probe_pair_expand(cell, probe_cells, probe_rows_by_cell)
            else:
                rowp = _np.repeat(_np.arange(n, dtype=_np.int64), len(p_qid))
                pp = _np.tile(_np.arange(len(p_qid), dtype=_np.int64), n)
            if rowp.size == 0:
                continue
            # drop self-pairs (the JVM filter c_id != q_id)
            cid64 = ids.cast("int64").to_numpy(zero_copy_only=False).astype(_np.int64)
            keep = cid64[rowp] != p_qid[pp]
            rowp, pp = rowp[keep], pp[keep]
            if rowp.size == 0:
                continue
            q = qm[p_qpos[pp]]
            acc = None if p_base is None else p_base[pp].copy()
            pc = codes[rowp]
            for j, B in enumerate(books):
                bv = B[pc[:, j]]
                tacc = _np.zeros(len(rowp), dtype=_np.float64)
                for t in range(sub):
                    tacc += q[:, j * sub + t] * bv[:, t]
                acc = tacc if acc is None else acc + tacc
            idx = _pa.array(rowp, type=_pa.int64())
            yield _pa.record_batch(
                [
                    _pa.array(p_qid[pp]),
                    ids.take(idx),
                    _pa.array(acc),
                ],
                names=["q_id", "c_id", "approx_dot"],
            )

    return src.mapInArrow(_score, out_schema)


def fused_cell_cos_scores(
    corpus: DataFrame,
    *,
    dim: int,
    centroids: list[list[float]],
    q_tbl,
    probe_tbl,
    id_col: str = "c_id",
    vec_col: str = "cv",
    q_id_type=None,
) -> DataFrame:
    """FUSED IVF scoring (r15, guide §4.2 / §2.4 / §8): ONE mapInArrow
    pass over the RAW corpus that assigns each row's coarse cell (the
    exact ``_encode_arrow`` matmul argmin — lowest-index ties), pairs it
    with the queries probing that cell (``probe_tbl``: the collected
    JVM-computed (q_id, cell) frame — query-side probe order untouched),
    and emits the exact cosine (q_id, c_id, cos_raw) directly — the
    ``_seq_dot_rows`` accumulation and norm shape of the
    ``cos_rerank_pairs`` gather kernel it replaces, so values are
    bit-identical.

    Versus the r14 chain (encode kernel -> JVM -> broadcast probe join
    -> rerank gather kernel): one Python boundary instead of two, no
    BroadcastExchange, and — because each row's raw vector is already in
    the kernel's batch — NO corpus-wide bounded collect for the rerank
    matrix: the corpus side streams at any size (the collected side is
    only the |Q|-row query matrix). Bounded-queries tier only; unbounded
    query streams keep the join tier in ann_ivf_topk."""
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)
    Cn2 = (C * C).sum(axis=1)
    d_ = dim

    q_ids_sorted, q_mat = _sorted_vec_matrix(q_tbl, dim, "fused_cell_cos_scores(qv)")
    q_norm = np.sqrt(_seq_dot_rows(q_mat, q_mat))

    p_qid = probe_tbl.column("q_id").to_numpy(zero_copy_only=False).astype(np.int64)
    p_cell = probe_tbl.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.searchsorted(q_ids_sorted, p_qid)
    pos_c = np.clip(pos, 0, max(len(q_ids_sorted) - 1, 0))
    ok = q_ids_sorted[pos_c] == p_qid if len(q_ids_sorted) else np.zeros(len(p_qid), bool)
    # probes whose q_id is absent from the query frame drop, exactly like
    # the inner rerank join they replace
    p_qid, p_cell, p_qpos = p_qid[ok], p_cell[ok], pos_c[ok]
    probe_cells = [int(c) for c in np.unique(p_cell)]
    probe_rows_by_cell = [np.flatnonzero(p_cell == c) for c in probe_cells]

    bc = corpus.sparkSession.sparkContext.broadcast((q_mat, q_norm))

    id_field = next(f for f in corpus.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [
            T.StructField("q_id", q_id_type or T.LongType(), True),
            T.StructField("c_id", id_field.dataType, id_field.nullable),
            T.StructField("cos_raw", T.DoubleType(), True),
        ]
    )
    src = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))

    def _score(batches):
        import numpy as _np
        import pyarrow as _pa

        qm, qn = bc.value
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids = rb.column(0)
            X = _flat2d(rb.column(1), n, d_, "fused_cell_cos_scores(cv)")
            d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + Cn2[None, :]
            cell = d2.argmin(axis=1)
            rowp, pp = _probe_pair_expand(cell, probe_cells, probe_rows_by_cell)
            if rowp.size == 0:
                continue
            cid64 = ids.cast("int64").to_numpy(zero_copy_only=False).astype(_np.int64)
            keep = cid64[rowp] != p_qid[pp]
            rowp, pp = rowp[keep], pp[keep]
            if rowp.size == 0:
                continue
            # candidate norms per batch row once, gathered per pair — the
            # same _seq_dot_rows input rows, hence the same doubles the
            # gather tier computes from its collected matrix
            cn = _np.sqrt(_seq_dot_rows(X, X))
            cos = _seq_dot_rows(qm[p_qpos[pp]], X[rowp]) / (qn[p_qpos[pp]] * cn[rowp])
            idx = _pa.array(rowp, type=_pa.int64())
            yield _pa.record_batch(
                [_pa.array(p_qid[pp]), ids.take(idx), _pa.array(cos)],
                names=["q_id", "c_id", "cos_raw"],
            )

    return src.mapInArrow(_score, out_schema)


def _band_probe_csr(q_band_keys: "np.ndarray", probe_fn) -> list[tuple]:
    """Per-band CSR probe index for the fused LSH kernels: for band b,
    (keys_sorted, offsets, qpos_flat) such that a corpus key's matching
    query positions are qpos_flat[offsets[i]:offsets[i+1]] where i is the
    key's searchsorted slot. ``probe_fn(base_keys) -> list of key arrays``
    expands each query's probe set (multi-probe bit flips; identity for
    exact banding)."""
    bands = []
    n_q = len(q_band_keys)
    for b in range(q_band_keys.shape[1]) if q_band_keys.size else []:
        keys_l, qpos_l = [], []
        for probe_keys in probe_fn(q_band_keys[:, b]):
            keys_l.append(probe_keys)
            qpos_l.append(np.arange(n_q, dtype=np.int64))
        keys = np.concatenate(keys_l) if keys_l else np.empty(0, np.int64)
        qpos = np.concatenate(qpos_l) if qpos_l else np.empty(0, np.int64)
        order = np.argsort(keys, kind="stable")
        keys, qpos = keys[order], qpos[order]
        uniq, starts = np.unique(keys, return_index=True)
        offsets = np.append(starts, len(keys)).astype(np.int64)
        bands.append((uniq, offsets, qpos))
    return bands


def fused_lsh_cos_scores(
    corpus: DataFrame,
    *,
    dim: int,
    q_tbl,
    corpus_keys_fn,
    query_keys_fn,
    probe_fn,
    id_col: str = "c_id",
    vec_col: str = "cv",
) -> DataFrame:
    """FUSED banded-LSH candidate generation + exact cosine (r15, guide
    §4.2 / §2.4 / §8): ONE mapInArrow pass over the raw corpus that
    computes each row's band keys (``corpus_keys_fn`` — the exact numpy
    math of the lsh_band_keys_arrow / md5_sign_signatures kernels it
    absorbs), matches them against a driver-built probe index over the
    bounded query frame (``query_keys_fn`` runs the SAME numpy ops on the
    collected query matrix, so bucket values are identical to the
    Spark-side kernel they replace; ``probe_fn`` expands multi-probe bit
    flips), de-duplicates multi-band collisions LOCALLY (all of a corpus
    row's bands live in its own batch row, so the per-row unique is
    exactly the global distinct the join pipeline needed), drops
    self-pairs, and emits (q_id, c_id, cos_raw) with the
    ``cos_rerank_pairs`` gather-kernel arithmetic (_seq_dot_rows dots and
    norms) — bit-identical values.

    Versus the r14 chain (band-keys kernel x2 -> bucket explode ->
    BroadcastExchange + join -> distinct Exchange+HashAggregate ->
    rerank gather kernel + its corpus-side bounded collect): one Python
    boundary, zero shuffles before the top-k window, and the corpus side
    streams at ANY size — only the |Q|-row query matrix is collected.
    Bounded-queries tier only; unbounded query streams keep the join
    pipeline in the callers."""
    from pyspark.sql import types as T

    q_ids_sorted, q_mat = _sorted_vec_matrix(q_tbl, dim, "fused_lsh_cos_scores(qv)")
    q_norm = np.sqrt(_seq_dot_rows(q_mat, q_mat))
    q_keys = query_keys_fn(q_mat) if len(q_mat) else np.empty((0, 0), np.int64)
    bands = _band_probe_csr(np.asarray(q_keys, dtype=np.int64), probe_fn)
    n_q = len(q_ids_sorted)
    d_ = dim

    bc = corpus.sparkSession.sparkContext.broadcast(
        (q_ids_sorted, q_mat, q_norm, bands)
    )
    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType(), True),
            T.StructField("c_id", T.LongType(), True),
            T.StructField("cos_raw", T.DoubleType(), True),
        ]
    )
    src = corpus.select(
        F.col(id_col).cast("long").alias("c_id"), F.col(vec_col).alias("cv")
    )

    def _score(batches):
        import numpy as _np
        import pyarrow as _pa

        qids, qm, qn, bands_ = bc.value
        for rb in batches:
            n = rb.num_rows
            if n == 0 or not bands_:
                continue
            ids64 = rb.column(0).to_numpy(zero_copy_only=False).astype(_np.int64)
            X = _flat2d(rb.column(1), n, d_, "fused_lsh_cos_scores(cv)")
            ckeys = _np.asarray(corpus_keys_fn(X), dtype=_np.int64)
            rows_l, qpos_l = [], []
            for b, (keys_s, offs, qpos_flat) in enumerate(bands_):
                if not len(keys_s):
                    continue
                rk = ckeys[:, b]
                slot = _np.searchsorted(keys_s, rk)
                slot_c = _np.clip(slot, 0, len(keys_s) - 1)
                hit = keys_s[slot_c] == rk
                rows = _np.flatnonzero(hit)
                if not rows.size:
                    continue
                s = slot_c[rows]
                cnt = offs[s + 1] - offs[s]
                nz = cnt > 0
                rows, s, cnt = rows[nz], s[nz], cnt[nz]
                if not rows.size:
                    continue
                total = int(cnt.sum())
                # CSR expansion: each matched row repeats for its slot's
                # query positions
                rep_start = _np.repeat(offs[s], cnt)
                within = _np.arange(total) - _np.repeat(
                    _np.cumsum(cnt) - cnt, cnt
                )
                rows_l.append(_np.repeat(rows, cnt))
                qpos_l.append(qpos_flat[rep_start + within])
            if not rows_l:
                continue
            rowp = _np.concatenate(rows_l)
            qpp = _np.concatenate(qpos_l)
            # multi-band collisions: one (q, c) pair scores once — the
            # local equivalent of the pipeline's global distinct
            pair_key = rowp * max(n_q, 1) + qpp
            uniq_idx = _np.unique(pair_key, return_index=True)[1]
            rowp, qpp = rowp[uniq_idx], qpp[uniq_idx]
            keep = ids64[rowp] != qids[qpp]
            rowp, qpp = rowp[keep], qpp[keep]
            if not rowp.size:
                continue
            cn = _np.sqrt(_seq_dot_rows(X, X))
            cos = _seq_dot_rows(qm[qpp], X[rowp]) / (qn[qpp] * cn[rowp])
            yield _pa.record_batch(
                [
                    _pa.array(qids[qpp]),
                    _pa.array(ids64[rowp]),
                    _pa.array(cos),
                ],
                names=["q_id", "c_id", "cos_raw"],
            )

    return src.mapInArrow(_score, out_schema)


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

    # skew gate (multimodal rule): spread a single-file input before the
    # per-row bucket computation, but never full-shuffle a well-split scan
    parallelism = vectors.sparkSession.sparkContext.defaultParallelism
    if vectors.rdd.getNumPartitions() < parallelism:
        vectors = vectors.repartition(parallelism)
    qv = queries.select(
        F.col(id_col).cast("long").alias("q_id"), F.col(vec_col).alias("qv")
    )
    H = np.asarray(
        [_hyperplanes(dim, n_planes, seed + 1000 * b) for b in range(n_bands)],
        dtype=np.float64,
    )
    planes_t = np.ascontiguousarray(H.reshape(n_bands * n_planes, dim).T)
    weights = 2 ** np.arange(n_planes, dtype=np.int64)
    nb, npl = n_bands, n_planes

    def _keys_fn(X):
        # the exact lsh_band_keys_arrow math (same hyperplanes, same sign
        # rule) — shared by the corpus batches and the collected query
        # matrix, so bucket values are identical on both sides
        bits = (X @ planes_t) > 0.0
        return (bits.reshape(-1, nb, npl) * weights).sum(axis=2)

    def _probe_fn(base_keys):
        out = [base_keys]
        if multiprobe:
            out.extend(base_keys ^ (1 << i) for i in range(npl))
        return out

    # Bounded-queries tier (r15, guide §4.2/§2.4/§8): band keys, bucket
    # probing, multi-band dedupe AND the exact cosine fuse into ONE Arrow
    # pass over the raw corpus (fused_lsh_cos_scores) — the two band-key
    # kernels, bucket explode, broadcast join, distinct exchange and the
    # rerank's corpus-side bounded collect are gone; the corpus streams
    # at any size. Unbounded query streams keep the join pipeline below.
    limit_bytes = _broadcast_vecs_max_bytes()
    max_rows = limit_bytes // (dim * 8) if limit_bytes > 0 else 0
    q_tbl = _probe_vec_table(qv, "q_id", "qv", max_rows) if max_rows > 0 else None
    if q_tbl is not None:
        scored = fused_lsh_cos_scores(
            vectors, dim=dim, q_tbl=q_tbl, corpus_keys_fn=_keys_fn,
            query_keys_fn=_keys_fn, probe_fn=_probe_fn,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        # NARROW candidate stream: (bucket, c_id) only. Carrying the
        # vectors through the bucket explode + pair dedupe shuffles
        # dim-sized arrays per (candidate x band) and makes distinct()
        # hash wide rows — measured 3-4x slower at sf0.1 (r3 bench
        # regression); vectors re-attach by id AFTER the dedupe.
        cand = lsh_band_keys_arrow(
            vectors, id_col=id_col, vec_col=vec_col, dim=dim,
            n_planes=n_planes, n_bands=n_bands, seed=seed,
        ).select(
            F.col("kid").alias("c_id"),
            F.explode(
                F.array(
                    *[
                        F.concat(F.lit(f"{b}:"), F.col(f"b{b}").cast("string"))
                        for b in range(n_bands)
                    ]
                )
            ).alias("bucket"),
        )
        q = lsh_band_keys_arrow(
            queries, id_col=id_col, vec_col=vec_col, dim=dim,
            n_planes=n_planes, n_bands=n_bands, seed=seed,
        ).withColumnRenamed("kid", "q_id")
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
        # a close pair collides in several bands — dedupe (narrow) first
        pairs = (
            cand.join(F.broadcast(qp), "bucket")
            .filter(F.col("q_id") != F.col("c_id"))
            .select("q_id", "c_id")
            .distinct()
        )
        cv = vectors.select(
            F.col(id_col).cast("long").alias("c_id"), F.col(vec_col).alias("cv")
        )
        scored = cos_rerank_pairs(pairs, qv, cv, dim=dim)
    w = W.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )


def md5_plane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic INTEGER hyperplane weights derived from md5: weight
    of plane p (0-based) at dimension d (1-based) is the first 4 hex
    digits of md5(f"{p}_{d}") minus 32768 — i.e. a value in
    [-32768, 32767]. Both Spark's md5() and DuckDB's md5() compute the
    same digest, so an oracle can recompute the planes exactly; here
    they are precomputed driver-side (data-independent constants) and
    shipped as literals."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:4], 16) - 32768
            for d in range(1, dim + 1)
        ]
        for p in range(n_planes)
    ]


def md5_sign_signatures(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
) -> DataFrame:
    """(kid LONG, sig LONG) integer-exact hyperplane sign signatures:
    embeddings quantize to floor(double(x)*1e9+0.5) int64, each plane is
    an md5-derived INTEGER weight vector (md5_plane_weights), the sign
    bits come from one Arrow integer matmul per batch — bit-identical in
    Spark, numpy and DuckDB SQL (no float summation-order hazard). The
    shared kernel under ann_lsh_md5_topk and the oracle-expressible
    embedding near-dup entry. Map-only, zero shuffles; the weight
    literal is (n_planes*dim) small ints in the closure."""
    W_int = np.asarray(md5_plane_weights(n_planes, dim), dtype=np.int64)
    planes_t = np.ascontiguousarray(W_int.T)  # (dim, n_planes)
    bitw = 2 ** np.arange(n_planes, dtype=np.int64)
    d = dim

    def _sig(batches):
        import numpy as _np
        import pyarrow as _pa

        for batch in batches:
            ids = batch.column(0)
            lst = batch.column(1)
            if lst.null_count:
                raise ValueError("md5_sign_signatures: null vectors are not bucketable")
            flat = lst.flatten().to_numpy(zero_copy_only=False)
            if len(flat) != len(ids) * d:
                raise ValueError(
                    f"md5_sign_signatures: expected uniform dim {d}, got "
                    f"{len(flat)} values for {len(ids)} vectors"
                )
            arr = _np.asarray(flat, dtype=_np.float64).reshape(len(ids), d)
            q9 = _np.floor(arr * 1e9 + 0.5).astype(_np.int64)
            bits = (q9 @ planes_t) >= 0  # integer matmul: exact
            sig = (bits * bitw).sum(axis=1).astype(_np.int64)
            yield _pa.record_batch([ids, _pa.array(sig)], names=["kid", "sig"])

    return df.select(
        F.col(id_col).cast("long").alias("kid"), F.col(vec_col).alias("v")
    ).mapInArrow(_sig, "kid LONG, sig LONG")


def ann_lsh_md5_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 12,
    n_bands: int = 3,
) -> DataFrame:
    """ORACLE-EXPRESSIBLE banded LSH top-k (r14): the integer-exact
    variant of ann_lsh_topk. Embedding values quantize to
    floor(double(x) * 1e9 + 0.5) int64; each of ``n_planes`` hyperplanes
    is an md5-derived INTEGER weight vector (md5_plane_weights), so the
    sign bits come from pure int64 dot products — bit-identical in
    Spark, numpy AND DuckDB SQL (no float summation-order hazard).
    The ``n_planes``-bit signature splits into ``n_bands`` contiguous
    bands; candidates share >= 1 band value with a query (the
    MinHash-banding shape); exact double cosine reranks (the proven
    KNN_ORACLE arithmetic), fully tie-broken by c_id.

    Plan shape is ann_lsh_topk's: one Arrow map pass for signatures
    (integer matmul — exact), narrow (bucket, id) candidate stream,
    broadcast query probes, distinct before the rerank join. No
    multiprobe (the oracle mirrors bands exactly). Scale: bucket count
    per band = 2^(n_planes/n_bands); candidate volume bounded by band
    collisions, never quadratic.

    Overflow envelope: |quantized| <= ~2^35 for unit-ish embeddings,
    |weight| <= 2^15, dim 64 -> |dot| < 2^56, safely inside int64 on
    every engine."""
    from pyspark.sql import Window as W

    if n_planes % n_bands:
        raise ValueError("n_planes must divide into n_bands equal slices")
    band_bits = n_planes // n_bands

    def sigs_of(df: DataFrame) -> DataFrame:
        return md5_sign_signatures(
            df, id_col=id_col, vec_col=vec_col, dim=dim, n_planes=n_planes
        )

    mask = (1 << band_bits) - 1

    def band_keys(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col("kid").alias(out_id),
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

    parallelism = vectors.sparkSession.sparkContext.defaultParallelism
    if vectors.rdd.getNumPartitions() < parallelism:
        vectors = vectors.repartition(parallelism)
    qv = queries.select(
        F.col(id_col).cast("long").alias("q_id"), F.col(vec_col).alias("qv")
    )
    W_int = np.asarray(md5_plane_weights(n_planes, dim), dtype=np.int64)
    planes_t = np.ascontiguousarray(W_int.T)
    bitw = 2 ** np.arange(n_planes, dtype=np.int64)
    nb, bb = n_bands, band_bits

    def _keys_fn(X):
        # the exact md5_sign_signatures math + the band_keys shift/mask
        # split — INTEGER arithmetic throughout, so corpus batches, the
        # collected query matrix and the DuckDB oracle all agree exactly
        q9 = np.floor(X * 1e9 + 0.5).astype(np.int64)
        sig = (((q9 @ planes_t) >= 0) * bitw).sum(axis=1)
        return np.stack([(sig >> (b * bb)) & mask for b in range(nb)], axis=1)

    def _probe_fn(base_keys):
        return [base_keys]  # exact banding: the oracle mirrors bands 1:1

    # Bounded-queries tier (r15, guide §4.2/§2.4/§8): signatures, band
    # probing, multi-band dedupe AND the exact cosine fuse into ONE Arrow
    # pass over the raw corpus (fused_lsh_cos_scores) — two signature
    # kernels, the posexplode, broadcast join, distinct exchange and the
    # rerank's corpus-side bounded collect leave the plan; candidate sets
    # and cos_raw values are bit-identical (integer bucket math, same
    # _seq_dot_rows rerank arithmetic), so the oracle hash is unchanged.
    # Unbounded query streams keep the join pipeline below.
    limit_bytes = _broadcast_vecs_max_bytes()
    max_rows = limit_bytes // (dim * 8) if limit_bytes > 0 else 0
    q_tbl = _probe_vec_table(qv, "q_id", "qv", max_rows) if max_rows > 0 else None
    if q_tbl is not None:
        scored = fused_lsh_cos_scores(
            vectors, dim=dim, q_tbl=q_tbl, corpus_keys_fn=_keys_fn,
            query_keys_fn=_keys_fn, probe_fn=_probe_fn,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        cand = band_keys(sigs_of(vectors), "c_id")
        qp = band_keys(sigs_of(queries), "q_id")
        pairs = (
            cand.join(F.broadcast(qp), ["band", "bval"])
            .filter(F.col("q_id") != F.col("c_id"))
            .select("q_id", "c_id")
            .distinct()
        )
        # rerank via the Arrow cosine kernel — exact sequential-sum
        # semantics (attach_cos_raw_arrow), so the DuckDB oracle's
        # replayed values and tie-breaks are bit-identical
        cv = vectors.select(
            F.col(id_col).cast("long").alias("c_id"), F.col(vec_col).alias("cv")
        )
        scored = cos_rerank_pairs(pairs, qv, cv, dim=dim)
    w = W.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )


def kmeans_centroids(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_sample: int = 100_000,
    max_iter: int = 20,
) -> list[list[float]]:
    """Coarse-quantizer training for IVF: Lloyd's k-means on a BOUNDED
    driver-side sample (numpy, vectorized, deterministic seed).

    Why not MLlib: with k ~ sqrt(N) the quantizer quality is set by a
    modest sample, and per-iteration Spark job latency dominates any
    accuracy gain from full-corpus iterations — a 100k x 64-float
    sample is ~25 MB and converges in milliseconds locally. One Spark
    job total (the limited sample collect); the corpus itself is never
    shuffled for training."""
    x = _deterministic_sample(vectors, vec_col, max_sample)
    rng = np.random.default_rng(seed)
    return _lloyd(x, n_centroids, rng, max_iter).tolist()


def _deterministic_sample(vectors: DataFrame, vec_col: str, max_sample: int) -> "np.ndarray":
    """Bounded training sample whose CONTENT is a pure function of the
    data: rows ordered by xxhash64 of the vector itself (a seeded
    pseudo-random but reproducible order), then limited. A bare
    ``.limit(n)`` takes whatever partitions answer first, so codebooks —
    and every downstream ANN result — would vary with partition layout
    despite the fixed k-means seed. orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k + merge, no full sort
    shuffle), so the determinism is free at scale. Returns the sample as
    an (n, dim) float64 ndarray via ONE Arrow transfer (r14 — the
    row-pickle collect measured ~3x slower on a cold path; same rows,
    same order, same doubles)."""
    tbl = (
        vectors.select(F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.xxhash64("v"))
        .limit(max_sample)
        .toArrow()
    )
    lst = tbl.column("v").combine_chunks()
    flat = lst.flatten().to_numpy(zero_copy_only=False)
    n = len(lst)
    return np.asarray(flat, dtype=np.float64).reshape(n, -1) if n else np.empty((0, 0))


def _lloyd(x: "np.ndarray", n_centroids: int, rng, max_iter: int) -> "np.ndarray":
    """The shared k-means kernel (seeded init, vectorized assign, mean
    update, allclose convergence) behind the IVF coarse quantizer and the
    PQ sub-codebooks — one implementation so fixes land in both."""
    n = len(x)
    k = min(n_centroids, n)
    centers = x[rng.choice(n, size=k, replace=False)]
    for _ in range(max_iter):
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 (vectorized assign)
        d = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * x @ centers.T
            + (centers * centers).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        new_centers = centers.copy()
        for j in range(k):
            members = x[assign == j]
            if len(members):
                new_centers[j] = members.mean(axis=0)
        if np.allclose(new_centers, centers):
            break
        centers = new_centers
    return centers


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: the data-driven counterpart to
    ann_lsh_topk. A KMeans coarse quantizer assigns every vector to its
    nearest centroid (one JVM-side argmin over broadcast centroid
    literals — no Python, no shuffle); each query probes its n_probe
    nearest centroids' lists; exact cosine reranks inside the probed
    union. Returns (q_id, c_id, cos_sim, rank).

    Versus LSH: probe fraction is ~n_probe/n_centroids of the corpus but
    ADAPTS to the data's cluster structure (hyperplanes are oblivious),
    which is why IVF recalls higher on clustered embeddings at equal
    probe cost. 100 TB tuning: n_centroids ~ sqrt(N) keeps lists ~sqrt(N)
    long; the candidate join shuffles on centroid id with queries
    broadcast; assignment is a projection (no shuffle).

    Recall < 1.0 by construction; pytest checks recall against the
    brute-force baseline. ``centroids`` accepts a pre-trained quantizer
    (skip training, e.g. for incremental corpora)."""
    from pyspark.sql import Window as W

    if centroids is None:
        centroids = kmeans_centroids(
            vectors, vec_col=vec_col, n_centroids=n_centroids, seed=seed
        )

    # ONE 2-D literal + one indexed transform: the whole argmin is a
    # 3-node expression regardless of n_centroids (a per-centroid
    # struct/aggregate tree made Catalyst analysis the bottleneck)
    lit_cents = F.lit([[float(x) for x in c] for c in centroids])

    def nearest(vec: Column, n: int) -> Column:
        """array of the n nearest centroid ids, JVM-side argsort via
        array_sort over (dist, id) structs."""
        cells = F.transform(
            lit_cents,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(
                        vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                i.alias("i"),
            ),
        )
        return F.slice(F.array_sort(cells), 1, n).getField("i")

    # skew gate for the per-row ENCODE only: the rerank frames below are
    # either probed (gather tier — a collect, where a repartition is a
    # wasted shuffle) or re-shuffled by their join keys anyway (join
    # tier), so only the encode input needs spreading. One .rdd probe
    # total (guide §1.2: each probe re-plans the frame on the driver).
    enc_in = vectors
    parallelism = vectors.sparkSession.sparkContext.defaultParallelism
    if enc_in.rdd.getNumPartitions() < parallelism:
        enc_in = enc_in.repartition(parallelism)
    dim = len(centroids[0])
    qp = queries.select(
        F.col(id_col).alias("q_id"),
        F.explode(nearest(F.col(vec_col), n_probe)).alias("cell"),
    )
    cv = vectors.select(
        F.col(id_col).cast("long").alias("c_id"), F.col(vec_col).alias("cv")
    )
    qv = queries.select(
        F.col(id_col).cast("long").alias("q_id"), F.col(vec_col).alias("qv")
    )
    # Bounded-queries tier (r15, guide §4.2/§2.4/§8): cell assignment,
    # probe matching AND the exact cosine fuse into ONE Arrow pass over
    # the raw corpus (fused_cell_cos_scores) — the encode boundary
    # round-trip, the probes BroadcastExchange+join and the rerank's
    # corpus-side bounded collect are gone (the corpus side now streams
    # at ANY size; only the query matrix is collected). The probe cells
    # are collected from the same JVM `nearest` expression, so WHO gets
    # compared is unchanged; cos_raw keeps the _seq_dot_rows semantics.
    # Unbounded query streams keep the join tier below.
    limit_bytes = _broadcast_vecs_max_bytes()
    max_rows = limit_bytes // (dim * 8) if limit_bytes > 0 else 0
    q_tbl = _probe_vec_table(qv, "q_id", "qv", max_rows) if max_rows > 0 else None
    if q_tbl is not None:
        probe_tbl = qp.select(F.col("q_id").cast("long").alias("q_id"), "cell").toArrow()
        scored = fused_cell_cos_scores(
            enc_in.select(
                F.col(id_col).cast("long").alias("c_id"), F.col(vec_col).alias("cv")
            ),
            dim=dim, centroids=centroids, q_tbl=q_tbl, probe_tbl=probe_tbl,
        )
    else:
        # corpus-side assignment: the Arrow matmul kernel (the HOF argmin
        # tree is interpreted per element — the r12 encode lesson); the
        # small query side keeps the JVM expression above.
        # No .distinct() on the pairs: every candidate lives in exactly
        # ONE cell and a query's probed cells are distinct indexes of one
        # sorted slice, so the join cannot emit a (q_id, c_id) pair twice
        # (guide §2.4 "a distinct on data that is already unique")
        cand = _encode_arrow(
            enc_in, id_col=id_col, vec_col=vec_col, dim=dim, centroids=centroids,
            spread=False,
        ).select("c_id", "cell")
        pairs = (
            cand.join(F.broadcast(qp), "cell")
            .filter(F.col("q_id") != F.col("c_id"))
            .select("q_id", "c_id")
        )
        scored = cos_rerank_pairs(pairs, qv, cv, dim=dim)
    w = W.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN
# ---------------------------------------------------------------------------


def pq_train(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    max_sample: int = 100_000,
    max_iter: int = 20,
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks (each n_codes x dim/m): split every
    vector into m contiguous subvectors and run Lloyd's k-means
    independently per subspace on ONE bounded driver sample (the
    kmeans_centroids rationale: quantizer quality is set by a modest
    sample; the corpus never shuffles for training). Returns
    codebooks[j][c] = centroid c of subspace j."""
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    sub = dim // m
    x = _deterministic_sample(vectors, vec_col, max_sample)
    rng = np.random.default_rng(seed)
    return [
        _lloyd(x[:, j * sub : (j + 1) * sub], n_codes, rng, max_iter).tolist()
        for j in range(m)
    ]


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    spread: bool = True,
) -> DataFrame:
    """Encode every vector as m codebook ids (array<int>, one per
    subspace) — one Arrow matmul pass, map-only (the r12 encode
    kernel; the previous JVM HOF argmin was interpreted per element).
    At 100 TB the encoded corpus is dim/m * 4-bit-ish per subspace
    instead of 4-8 bytes per float: a 64-dim float64 row (512 B)
    compresses to m ints (m=8 -> ~32 B logical, 8 B as int8 storage),
    so the compressed-domain scan reads ~16-64x fewer bytes than raw
    vectors."""
    return _encode_arrow(
        vectors, id_col=id_col, vec_col=vec_col, dim=dim, codebooks=codebooks,
        spread=spread,
    ).select("c_id", "codes")


def ivfpq_train(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    max_sample: int = 100_000,
    max_iter: int = 20,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Joint IVF-PQ training (Jégou et al., "Product Quantization for
    Nearest Neighbor Search" — the IVFADC construction): a coarse
    quantizer over raw vectors, then per-subspace PQ codebooks trained
    on the RESIDUALS x - centroid(x). Residual encoding is what makes
    the composition beat flat PQ: residuals are centered near zero with
    far less variance than raw vectors, so the same code budget spends
    its resolution where the data actually is.

    One bounded content-deterministic driver sample trains BOTH stages
    (assignment + residuals are numpy on the sample); the corpus never
    shuffles for training. Returns (centroids, residual_codebooks)."""
    if dim % m:
        raise ValueError(f"ivfpq_train: dim {dim} not divisible by m {m}")
    sub = dim // m
    x = _deterministic_sample(vectors, vec_col, max_sample)
    rng = np.random.default_rng(seed)
    centers = _lloyd(x, n_centroids, rng, max_iter)
    d = (
        (x * x).sum(axis=1)[:, None]
        - 2.0 * x @ centers.T
        + (centers * centers).sum(axis=1)[None, :]
    )
    resid = x - centers[d.argmin(axis=1)]
    books = [
        _lloyd(resid[:, j * sub : (j + 1) * sub], n_codes, rng, max_iter).tolist()
        for j in range(m)
    ]
    return centers.tolist(), books


def ann_ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 3,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    seed: int = 42,
    trained: tuple[list[list[float]], list[list[list[float]]]] | None = None,
) -> DataFrame:
    """IVF-PQ (IVFADC) — the actual billion-vector architecture: coarse
    IVF cells bound WHO is scored (only the n_probe probed cells' rows),
    PQ/ADC in the residual domain bounds WHAT each score reads (m int
    codes, not dim floats), and exact cosine reranks the k*refine
    shortlist. Returns (q_id, c_id, cos_sim, rank).

    Approximate score for candidate x in cell c against query q:
    <q, x> ~ <q, centroid_c> + sum_j <q_sub_j, book_j[code_j(x)]>
    (the dot-product ADC decomposition of x ~ centroid_c + residual^).
    The <q, centroid_c> term is one lookup per (query, probed cell);
    the residual term indexes m small codebook literals by the stored
    codes — all JVM expressions, no Python.

    Plan shape (audited, sf0.001): the candidate-bounding join is
    enc JOIN broadcast(probes) ON cell — BroadcastHashJoin, so the scan
    prunes to probed cells before any arithmetic; the shortlist is a
    per-q_id rank window (WindowGroupLimit pre-top-N); only |Q|*k*refine
    rows re-attach raw vectors (the single non-broadcast join, narrow on
    c_id) with the query side broadcast again. Zero SortMergeJoin on the
    scoring path. At 100 TB: partition/bucket the encoded corpus BY CELL
    and the probe join becomes partition pruning — probing n_probe of
    n_centroids cells reads n_probe/n_centroids of the data; versus flat
    PQ (ann_pq_topk) which still scans every encoded row, and versus IVF
    (ann_ivf_topk) which reads dim floats for every candidate in the
    probed cells. Recall-vs-budget gates live in pytest: at an EQUAL
    exact-score budget IVF-PQ probes more cells than IVF can afford and
    must recall at least as well.

    ``trained`` accepts a pre-trained (centroids, residual_codebooks)
    pair (incremental corpora / reuse across query batches)."""
    from pyspark.sql import Window as W

    if trained is None:
        trained = ivfpq_train(
            vectors,
            vec_col=vec_col,
            dim=dim,
            n_centroids=n_centroids,
            m=m,
            n_codes=n_codes,
            seed=seed,
        )
    centroids, codebooks = trained

    # skew gate for the per-row ENCODE/SCORE input only (one .rdd probe;
    # the rerank cv below is probed/collected or re-shuffled by its join
    # key, so repartitioning it is a wasted shuffle in both rerank tiers)
    enc_in = vectors
    parallelism = vectors.sparkSession.sparkContext.defaultParallelism
    if enc_in.rdd.getNumPartitions() < parallelism:
        enc_in = enc_in.repartition(parallelism)

    cv = vectors.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    # raw corpus handed down: the bounded-queries tier fuses
    # encode + probe + ADC into one Arrow pass (fused_adc_scores); the
    # join tier encodes it there via ivfpq_encode_corpus unchanged
    return _ivfpq_score_rerank(
        None, cv, queries, centroids, codebooks, dim,
        id_col=id_col, vec_col=vec_col, k=k, n_probe=n_probe, refine=refine,
        raw=enc_in,
    )


def _nearest_cells(vec: Column, lit_cents: Column, n: int) -> Column:
    """Indexes of the n nearest coarse centroids (squared L2), as one
    JVM expression over a single 2-D centroid literal."""
    cells = F.transform(
        lit_cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            i.alias("i"),
        ),
    )
    return F.slice(F.array_sort(cells), 1, n).getField("i")


def ivfpq_encode_corpus(
    vectors: DataFrame,
    trained: tuple[list[list[float]], list[list[list[float]]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    spread: bool = True,
) -> DataFrame:
    """IVF-PQ ingest encode: (c_id, cv, cell, codes) — cell assignment
    plus PQ codes of the RESIDUAL. Persist with
    ``.write.partitionBy("cell")`` to get the file-pruning serving
    layout consumed by ``ann_ivfpq_topk_partitioned`` (raw vectors ride
    along so the rerank reads them from the SAME pruned files).

    The encode is ONE Arrow pass of numpy matmuls per batch —
    (n, dim) @ (dim, K) for cells, then per-subspace (n, sub) @
    (sub, codes) for residual codes. The previous Catalyst HOF argmin
    tree was interpreted per element (~1 us each) and measured 2.85 s
    at sf0.1 (50k x 64-dim); the matmul kernel is the
    lsh_band_keys_arrow lesson applied to the encode. Centroids and
    codebooks are small closure literals; map-only, zero shuffles.
    Distance ties resolve to the lowest cell/code index (same rule as
    the JVM array_min ordering); exact float ulps may differ from the
    HOF fold on boundary points — the recall gates and the
    partitioned == in-memory equality (both sides share THIS encode)
    are unaffected."""
    centroids, codebooks = trained
    if dim % len(codebooks):
        raise ValueError(f"dim {dim} not divisible by m {len(codebooks)}")
    return _encode_arrow(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        centroids=centroids,
        codebooks=codebooks,
        keep_vec=True,
        spread=spread,
    )


def _encode_arrow(
    vectors: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    keep_vec: bool = False,
    spread: bool = True,
) -> DataFrame:
    """Shared Arrow matmul encode kernel: per batch, (n, dim) @ (dim, K)
    argmin for ``cell`` (when centroids given) and per-subspace
    (n, sub) @ (sub, codes) argmin for ``codes`` (when codebooks given;
    of the RESIDUAL when centroids are also given, of the raw vector
    otherwise — flat PQ). Output columns: c_id[, cv][, cell][, codes].
    Map-only, zero shuffles; argmin ties take the lowest index (the JVM
    array_min struct-ordering rule). ``spread=False`` skips the skew
    gate when the CALLER already spread the input — each ``.rdd`` probe
    re-plans the whole frame on the driver (r14: ~0.1-0.3 s/query of
    pure plan-conversion overhead, guide §1.2 per-task work)."""
    from pyspark.sql import types as T

    C = None if centroids is None else np.asarray(centroids, dtype=np.float64)
    Cn2 = None if C is None else (C * C).sum(axis=1)
    books = None if codebooks is None else [np.asarray(b, dtype=np.float64) for b in codebooks]
    books_n2 = None if books is None else [(B * B).sum(axis=1) for B in books]
    sub = None if books is None else dim // len(books)
    d_ = dim
    m_ = None if books is None else len(books)

    id_field = next(f for f in vectors.schema.fields if f.name == id_col)
    vec_field = next(f for f in vectors.schema.fields if f.name == vec_col)
    fields = [T.StructField("c_id", id_field.dataType, id_field.nullable)]
    names = ["c_id"]
    if keep_vec:
        fields.append(T.StructField("cv", vec_field.dataType, vec_field.nullable))
        names.append("cv")
    if C is not None:
        fields.append(T.StructField("cell", T.IntegerType(), False))
        names.append("cell")
    if books is not None:
        fields.append(T.StructField("codes", T.ArrayType(T.IntegerType()), False))
        names.append("codes")
    out_schema = T.StructType(fields)

    def _enc(batches):
        import numpy as _np
        import pyarrow as _pa

        for rb in batches:
            ids = rb.column(0)
            lst = rb.column(1)
            if len(ids) == 0:
                continue
            if lst.null_count:
                raise ValueError("arrow encode: null vectors are not encodable")
            flat = lst.flatten().to_numpy(zero_copy_only=False)
            n = len(ids)
            if len(flat) != n * d_:
                raise ValueError(
                    f"arrow encode: expected uniform dim {d_}, got "
                    f"{len(flat)} values for {n} vectors"
                )
            X = _np.asarray(flat, dtype=_np.float64).reshape(n, d_)
            cols = [ids]
            if keep_vec:
                cols.append(lst)
            R = X
            if C is not None:
                d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + Cn2[None, :]
                cell = d2.argmin(axis=1)
                R = X - C[cell]
                cols.append(_pa.array(cell.astype(_np.int32)))
            if books is not None:
                codes = _np.empty((n, m_), dtype=_np.int32)
                for j, (B, Bn2) in enumerate(zip(books, books_n2)):
                    Rj = R[:, j * sub : (j + 1) * sub]
                    dj = (Rj * Rj).sum(axis=1)[:, None] - 2.0 * (Rj @ B.T) + Bn2[None, :]
                    codes[:, j] = dj.argmin(axis=1)
                cols.append(
                    _pa.ListArray.from_arrays(
                        _pa.array(_np.arange(0, (n + 1) * m_, m_, dtype=_np.int32)),
                        _pa.array(codes.ravel()),
                    )
                )
            yield _pa.record_batch(cols, names=names)

    # skew gate (multimodal rule): spread a single-file corpus across the
    # cores before the per-row encode; never full-shuffle a well-split scan
    if spread:
        parallelism = vectors.sparkSession.sparkContext.defaultParallelism
        if vectors.rdd.getNumPartitions() < parallelism:
            vectors = vectors.repartition(parallelism)
    return vectors.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv")
    ).mapInArrow(_enc, out_schema)


def ivfpq_probe_cells(
    queries: DataFrame,
    trained: tuple[list[list[float]], list[list[list[float]]]],
    *,
    vec_col: str = "embedding",
    n_probe: int = 3,
) -> list[int]:
    """Driver-side union of every query's probed cells — at most
    n_centroids ints from one bounded collect (cells, not data), the
    static partition-pruning predicate for the cell-partitioned layout."""
    centroids, _ = trained
    lit_cents = F.lit([[float(x) for x in c] for c in centroids])
    rows = (
        queries.select(
            F.explode(_nearest_cells(F.col(vec_col), lit_cents, n_probe)).alias("cell")
        )
        .distinct()
        .collect()
    )
    return sorted(int(r["cell"]) for r in rows)


def _ivfpq_score_rerank(
    enc: DataFrame | None,
    cv: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int,
    refine: int,
    raw: DataFrame | None = None,
) -> DataFrame:
    """Shared IVFADC scoring: per-query shortlist window over the ADC
    approx dot, then exact-cosine rerank. ``enc`` is the pre-encoded
    (c_id, cell, codes) frame (the partitioned serving path, possibly
    cell-pruned); ``raw`` is the raw vector frame for the in-memory path
    — exactly one of the two is given (when ``raw`` is given and the
    join tier needs an encode, it encodes here). ``cv`` is (c_id, cv).

    Tiers (r15, guide §4.2 / §2.4 / §8): when the query frame proves
    bounded (one XT_BROADCAST_VECS_MAX_BYTES limit-probe — reused by the
    rerank, so no extra job) AND ids are integer, the whole
    encode + probe-join + ADC chain runs as ONE fused mapInArrow pass
    (fused_adc_scores) fed by a driver collect of the tiny JVM-computed
    (q_id, cell, q_cent_dot) probe frame — two Python boundary
    round-trips, one BroadcastExchange and one BroadcastHashJoin
    removed from the plan, approx_dot bit-identical (same floats, same
    accumulation order, probe cells/bases straight from the JVM
    expressions). Unbounded query streams keep the r13 join-payload
    tier unchanged (probes broadcast-joined on cell, qv riding each
    candidate row, attach_adc_arrow scoring)."""
    from pyspark.sql import Window as W

    lit_cents = F.lit([[float(x) for x in c] for c in centroids])
    qv = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
    )
    # probe list per query + the constant <q, centroid_cell> term (a
    # |Q| x n_probe frame — stays a JVM expression, it is tiny)
    probes = qv.select(
        "q_id",
        "qv",
        F.explode(_nearest_cells(F.col("qv"), lit_cents, n_probe)).alias("cell"),
    ).withColumn(
        "q_cent_dot",
        F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.element_at(lit_cents, F.col("cell") + 1),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )

    corpus = enc if enc is not None else raw
    q_id_type = _int_ids_or_none(qv, "q_id", long_only=True)
    c_id_ok = _int_ids_or_none(cv, "c_id") is not None
    limit_bytes = _broadcast_vecs_max_bytes()
    max_rows = limit_bytes // (dim * 8) if limit_bytes > 0 else 0
    q_tbl = (
        _probe_vec_table(qv, "q_id", "qv", max_rows)
        if max_rows > 0 and q_id_type is not None and c_id_ok
        else None
    )
    if q_tbl is not None:
        q_ids, q_mat = _sorted_vec_matrix(q_tbl, dim, "_ivfpq_score_rerank(qv)")
        qv_bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))
        probe_tbl = (
            probes.select(
                F.col("q_id").cast("long").alias("q_id"), "cell", "q_cent_dot"
            ).toArrow()
        )
        if enc is not None:
            scored = fused_adc_scores(
                enc, dim=dim, codebooks=codebooks, qv_bc=qv_bc,
                probe_tbl=probe_tbl, pre_encoded=True, q_id_type=q_id_type,
            )
        else:
            scored = fused_adc_scores(
                raw.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv")),
                dim=dim, codebooks=codebooks, qv_bc=qv_bc, probe_tbl=probe_tbl,
                centroids=centroids, pre_encoded=False, q_id_type=q_id_type,
            )
    else:
        if enc is None:
            enc = ivfpq_encode_corpus(
                raw, (centroids, codebooks), id_col=id_col, vec_col=vec_col,
                dim=dim, spread=False,
            ).select("c_id", "cell", "codes")
        joined = enc.join(F.broadcast(probes), "cell").filter(
            F.col("c_id") != F.col("q_id")
        )
        scored = attach_adc_arrow(
            joined,
            codebooks,
            dim=dim,
            keep=["q_id", "c_id"],
            base_col="q_cent_dot",
            qv_bc=None,
        )
    w_short = W.partitionBy("q_id").orderBy(F.desc("approx_dot"), F.asc("c_id"))
    shortlist = (
        scored.withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= k * refine)
        .select("q_id", "c_id")
    )

    reranked = cos_rerank_pairs(shortlist, qv, cv, dim=dim, q_tbl=q_tbl)
    w = W.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )


def ann_ivfpq_topk_partitioned(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    trained: tuple[list[list[float]], list[list[list[float]]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 3,
    refine: int = 4,
) -> DataFrame:
    """IVF-PQ serving over the CELL-PARTITIONED corpus — the actual
    billion-vector layout: ``corpus`` is an ``ivfpq_encode_corpus``
    output persisted ``partitionBy("cell")`` and read back, so the
    static ``cell IN (probe set)`` filter applied here is PARTITION
    PRUNING — the scan opens only the probed cells' FILES (probing
    n_probe of n_centroids cells reads ~n_probe/n_centroids of the
    bytes), then the per-query broadcast probe join narrows candidates
    within them exactly as the in-memory path does. The probe set is
    the union over queries (<= n_centroids ints, one bounded collect of
    cell ids — never data). Results are IDENTICAL to ann_ivfpq_topk
    with the same ``trained`` pair: the static filter is a superset of
    every query's probe list, so no candidate is lost.

    The rerank's raw vectors come from the SAME pruned scan (cv rides
    in the corpus), so at no point does any stage read an unprobed
    cell's bytes. Recall gates: tests/test_pipeline_operators.py
    asserts partitioned == in-memory equality and file-level pruning."""
    centroids, codebooks = trained
    cells = ivfpq_probe_cells(queries, trained, vec_col=vec_col, n_probe=n_probe)
    pruned = corpus.filter(F.col("cell").isin(cells))
    enc = pruned.select("c_id", "cell", "codes")
    cv = pruned.select("c_id", "cv")
    return _ivfpq_score_rerank(
        enc, cv, queries, centroids, codebooks, dim,
        id_col=id_col, vec_col=vec_col, k=k, n_probe=n_probe, refine=refine,
    )


def ann_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    seed: int = 42,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization ANN (asymmetric distance computation): the
    corpus is scanned in the COMPRESSED domain — each candidate's
    approximate dot product against a query is sum_j <q_sub_j,
    codebook_j[code_j]>, touching only the m int codes — then the
    k*refine best candidates per query rerank with exact cosine on the
    re-attached raw vectors. Returns (q_id, c_id, cos_sim, rank).

    Plan shape: encode = one projection over the corpus; the scoring join
    broadcasts the (small) query side against the encoded corpus — the
    scan is PQ's point: it reads m ints per row, not dim floats; the
    shortlist filter is a rank<=N window per q_id (WindowGroupLimit:
    map-side pre-top-N before the exchange); only |Q| * k * refine rows
    re-attach raw vectors (narrow shuffle join on c_id). No Python UDFs
    anywhere; recall is gated by pytest against the brute-force baseline.

    ``codebooks`` accepts a pre-trained quantizer (incremental corpora /
    reuse across queries)."""
    from pyspark.sql import Window as W

    if codebooks is None:
        codebooks = pq_train(
            vectors, vec_col=vec_col, dim=dim, m=m, n_codes=n_codes, seed=seed
        )
    sub = dim // len(codebooks)

    # skew gate for the per-row ENCODE input only (one .rdd probe; the
    # rerank cv below is probed/collected or re-shuffled by its join key)
    enc_in = vectors
    parallelism = vectors.sparkSession.sparkContext.defaultParallelism
    if enc_in.rdd.getNumPartitions() < parallelism:
        enc_in = enc_in.repartition(parallelism)

    qv = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
    )
    cv = vectors.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    # ADC score: per subspace, the query's subvector dotted with the
    # candidate's RECONSTRUCTED subvector (codebook_j[code_j]). Bounded
    # query frames (r15, guide §4.2/§2.4/§8): the encode + every-query
    # scoring runs as ONE fused Arrow pass over the raw corpus
    # (fused_adc_scores, probe_tbl=None = flat PQ all-pairs) — the
    # encode boundary round-trip and the broadcast nested-loop join are
    # gone from the plan; approx_dot keeps the exact attach_adc_arrow
    # accumulation. Unbounded query streams keep the join tier (encode,
    # broadcast join with the qv payload, attach_adc_arrow).
    q_id_type = _int_ids_or_none(qv, "q_id", long_only=True)
    c_id_ok = _int_ids_or_none(cv, "c_id") is not None
    limit_bytes = _broadcast_vecs_max_bytes()
    max_rows = limit_bytes // (dim * 8) if limit_bytes > 0 else 0
    q_tbl = (
        _probe_vec_table(qv, "q_id", "qv", max_rows)
        if max_rows > 0 and q_id_type is not None and c_id_ok
        else None
    )
    if q_tbl is not None:
        q_ids, q_mat = _sorted_vec_matrix(q_tbl, dim, "ann_pq_topk(qv)")
        qv_bc = vectors.sparkSession.sparkContext.broadcast((q_ids, q_mat))
        scored = fused_adc_scores(
            enc_in.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv")),
            dim=dim, codebooks=codebooks, qv_bc=qv_bc, probe_tbl=None,
            pre_encoded=False, q_id_type=q_id_type,
        )
    else:
        enc = pq_encode(
            enc_in, codebooks, id_col=id_col, vec_col=vec_col, dim=dim, spread=False
        )
        scored = attach_adc_arrow(
            enc.join(F.broadcast(qv), F.col("c_id") != F.col("q_id")),
            codebooks,
            dim=dim,
            keep=["q_id", "c_id"],
            qv_bc=None,
        )
    w_short = W.partitionBy("q_id").orderBy(F.desc("approx_dot"), F.asc("c_id"))
    shortlist = (
        scored.withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= k * refine)
        .select("q_id", "c_id")
    )

    reranked = cos_rerank_pairs(shortlist, qv, cv, dim=dim, q_tbl=q_tbl)
    w = W.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )


def ivf_assign_cells(
    vectors: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Append the IVF coarse-cell id to every vector (one JVM argmin over
    a single 2-D centroid literal — a pure projection, no shuffle).

    This is the STORAGE hook for the billion-vector layout: write the
    corpus ``partitionBy("cell")`` and a query's n_probe cell filter
    becomes PARTITION PRUNING — the scan never opens the other
    n_centroids - n_probe cells' files (tests/test_pipeline_operators.py
    pins inputFiles + the plan's PartitionFilters). ann_ivf_topk /
    ann_ivfpq_topk compute the same assignment inline; this helper
    exists so ingest can persist it."""
    lit_cents = F.lit([[float(x) for x in c] for c in centroids])
    cells = F.transform(
        lit_cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            i.alias("i"),
        ),
    )
    return vectors.select(
        F.col(id_col), F.col(vec_col), F.array_min(cells).getField("i").alias("cell")
    )
