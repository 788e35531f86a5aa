"""Z-order (Morton) clustering for multi-dimensional data skipping.

Min/max file statistics prune perfectly on ONE column when the data is
range-partitioned by it — and then prune almost nothing on any other
column. Interleaving the bits of k normalized dimensions into one
Morton value and range-partitioning by THAT gives every dimension
locality: each output file covers a small hyper-rectangle, so per-file
[min, max] ranges stay narrow on ALL k columns and a box predicate can
eliminate most files on any of them (the layout the engine's
data-skipping consumer — read_*_as_df(prune=...) and the Hudi/Iceberg
column-stats indexes — feeds on).

The declarative half already exists (targets/delta_target
clustering_columns lands the layout DECLARATION in the delta.clustering
domain); this is the physical rewrite that actually produces such a
layout, Spark-first:

  - normalization: one global min/max aggregate per column, broadcast
    as a 1-row cross join (the quantize_embeddings shape) — never a
    per-row window, never a sort;
  - the Morton value is a pure JVM bit expression (shiftleft/or over
    bits x k terms, whole-stage codegen);
  - layout: repartitionByRange(n_files, z) + sortWithinPartitions(z) —
    ONE range shuffle, the same cost as any clustered write.

Timestamps normalize via their epoch micros; strings via xxhash64
(hash order has no range locality — strings get dispersion, numeric
dims get locality, which matches how real z-order writers treat
untyped dimensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], mins: list[Column], maxs: list[Column], bits: int = 12) -> Column:
    """Morton-interleave ``cols`` (already cast to double) normalized to
    [0, 2^bits) by the supplied per-column min/max columns."""
    k = len(cols)
    scale = (1 << bits) - 1
    bucketed = []
    for c, mn, mx in zip(cols, mins, maxs):
        span = mx - mn
        b = F.when(span > 0, F.floor((c - mn) / span * F.lit(scale))).otherwise(F.lit(0))
        bucketed.append(F.least(F.greatest(b, F.lit(0)), F.lit(scale)).cast("long"))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, b in enumerate(bucketed):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1)), bit * k + i)
            )
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    *,
    n_files: int = 16,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    Morton order of ``cols``. Numeric/timestamp dimensions get range
    locality; string dimensions disperse via xxhash64. One global-bounds
    aggregate + one range shuffle; the z column does not survive into
    the output schema."""
    dims = []
    for name in cols:
        f = dict(zip(df.columns, df.schema.fields))[name]
        t = f.dataType.simpleString()
        if t.startswith("timestamp"):
            # NTZ refuses a direct long cast under ANSI; go through LTZ
            dims.append(F.col(name).cast("timestamp_ltz").cast("long").cast("double"))
        elif t in ("string",):
            dims.append(F.xxhash64(name).cast("double"))
        else:
            dims.append(F.col(name).cast("double"))
    bounds = df.agg(
        *[F.min(d).alias(f"mn{i}") for i, d in enumerate(dims)],
        *[F.max(d).alias(f"mx{i}") for i, d in enumerate(dims)],
    )
    with_z = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__z",
            zvalue(
                dims,
                [F.col(f"mn{i}") for i in range(len(dims))],
                [F.col(f"mx{i}") for i in range(len(dims))],
                bits,
            ),
        )
        .drop(*[f"mn{i}" for i in range(len(dims))], *[f"mx{i}" for i in range(len(dims))])
    )
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_pruning_fraction(df_path_reader, predicate_ranges: dict[str, tuple]) -> float:
    """Fraction of a parquet directory's files a min/max pruner can DROP
    for the given {col: (lo, hi)} box — the measurable effect of a
    layout. Computed from per-file min/max via one input_file_name
    aggregate (what a footer-stats pruner sees)."""
    df = df_path_reader
    aggs = []
    for c in predicate_ranges:
        aggs.append(F.min(c).alias(f"mn_{c}"))
        aggs.append(F.max(c).alias(f"mx_{c}"))
    per_file = df.groupBy(F.input_file_name().alias("f")).agg(*aggs).collect()
    total = len(per_file)
    kept = 0
    for r in per_file:
        overlap = True
        for c, (lo, hi) in predicate_ranges.items():
            if r[f"mx_{c}"] < lo or r[f"mn_{c}"] > hi:
                overlap = False
                break
        kept += 1 if overlap else 0
    return (total - kept) / total if total else 0.0
