"""Distributed row-index-aware reads of ORC data files.

Spark's native ORC reader serves the fast path for ORC data files, but
(unlike parquet) exposes no ``_metadata.row_index`` field — so any
feature that keys on per-file row positions (Delta deletion vectors,
CDC row diffs) needs its own ordinal-preserving scan. This module is
that scan: pyarrow.orc, one Spark task per file via ``mapInPandas``,
decoding stripe-by-stripe in container order and emitting each row's
0-based ordinal within its file. Mirrors the role of the reference's
format-agnostic data-file model (ref xtable-api
`model/storage/FileFormat.java:26-30`: APACHE_ORC is a first-class
enum member, so row-position features must cover it, not refuse).

Engaged ONLY for files that need row positions (the DV'd subset); plain
ORC scans stay on Spark's vectorized native reader.

Scale: one task per ORC file (a paths DataFrame repartitioned to file
count) — every file decodes in parallel, no driver funnel. Stripe-wise
iteration bounds peak memory to one stripe's columns, and the column
projection pushes into pyarrow's ORC reader (only requested columns
decode). Row ordinals are per-file, so no cross-task coordination.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc_rows(
    spark: SparkSession,
    paths: list[str],
    fields: list[T.StructField],
    *,
    path_col: Optional[str] = None,
    row_index_col: Optional[str] = None,
) -> DataFrame:
    """Scan ``paths`` (ORC files) into a DataFrame of ``fields``
    (projected by COLUMN NAME; absent columns resolve to null).
    ``path_col`` appends the absolute file path per row;
    ``row_index_col`` appends the 0-based row ordinal within its file —
    ORC stripes read in order, so the ordinal is the position Delta
    deletion vectors address."""
    out = T.StructType(list(fields))
    if path_col:
        out = out.add(path_col, T.StringType())
    if row_index_col:
        out = out.add(row_index_col, T.LongType())
    if not paths:
        return spark.createDataFrame([], out)
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = [f.name for f in fields]

    pdf_paths = spark.createDataFrame([(p,) for p in paths], "path STRING").repartition(
        len(paths)
    )

    def _scan(batches: Iterator["object"]) -> Iterator["object"]:
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        import pandas as pd
        import pyarrow.orc as orc

        for pdf_in in batches:
            for path in pdf_in["path"]:
                f = orc.ORCFile(path)
                present = [n for n in names if n in f.schema.names]
                # when NONE of the requested columns exist, reading
                # columns=[] would return 0-row tables and the file's
                # rows would silently vanish (desyncing DV ordinals);
                # read one physical column purely for cardinality — the
                # pdf[names] projection below drops it again
                read_cols = present or list(f.schema.names[:1])
                offset = 0
                n_stripes = f.nstripes
                for i in range(max(1, n_stripes)):
                    if n_stripes == 0:
                        tbl = f.read(columns=read_cols)
                    else:
                        tbl = f.read_stripe(i, columns=read_cols)
                    pdf = tbl.to_pandas()
                    for n in names:
                        if n not in pdf.columns:
                            pdf[n] = None
                    pdf = pdf[names]
                    if path_col:
                        pdf[path_col] = path
                    if row_index_col:
                        pdf[row_index_col] = range(offset, offset + len(pdf))
                    offset += len(pdf)
                    yield pdf

    return pdf_paths.mapInPandas(_scan, out)
