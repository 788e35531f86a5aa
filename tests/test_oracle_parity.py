"""Differential harness mirroring the driver's correctness gate: run every
registered query through Spark AND its DuckDB oracle, then compare
row-count, column names, and order-insensitive values.

CRITICAL: the comparison goes through *pandas* on both sides, exactly like
the driver — Spark via ``toPandas()`` (where DECIMAL stays ``object`` of
``Decimal`` and prints with trailing zeros), DuckDB via ``.df()`` (where
DECIMAL/HUGEINT become float64). Round-1 lesson: a value-level comparison
that normalizes Decimals locally can pass while the driver's string
canonicalization fails, so this file must NOT normalize — it compares the
``str()`` of the pandas cells verbatim. Queries therefore must emit plain
DOUBLE / BIGINT / STRING / BOOL / TIMESTAMP / DATE output columns
(plans/common.money_out) — never raw DECIMAL, never a raw array column
(unhashable in pandas sort_values).
"""

from __future__ import annotations

import os

import pytest

from incubator_xtable_spark.plans.registry import REGISTRY, _load_all

from .conftest import SF_SMOKE, register_duck_views

SF_DIR = os.environ.get("XT_TEST_SF_DIR", SF_SMOKE)

_load_all()
ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is not None)


def canon_pdf(pdf):
    """Driver-style canonicalization: sort columns by name, sort rows by all
    columns, then ``astype(str)`` COLUMN-wise (not str() per cell — pandas
    formats an all-midnight datetime64 column date-only, which is how Spark
    ``date`` and DuckDB ``DATE``-as-datetime64 agree). Raises on unsortable
    (array) columns the same way the driver's canonicalizer crashes on them."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    cols = list(pdf.columns)
    if cols and len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    pdf = pdf.astype(str)
    return [tuple(row) for row in pdf.itertuples(index=False)]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()

    register_duck_views(duck, SF_DIR)
    duck_pdf = duck.execute(spec.oracle).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column names differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )

    s_canon = canon_pdf(spark_pdf)
    d_canon = canon_pdf(duck_pdf)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first: {mismatches[:3]}"
