"""Differential harness mirroring the driver's correctness gate: run every
registered query through Spark AND its DuckDB oracle, then compare
row-count, column names, and order-insensitive values.

Comparison is strict (exact equality after canonicalization) because the
plans modules are written for cross-engine bit-determinism — decimal money
math, int/int ratios, tie-broken orderings. Any drift found here would be
a driver-gate failure, so it fails loudly.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import pytest

from incubator_xtable_spark.plans.registry import REGISTRY, _load_all

from .conftest import SF_SMOKE, register_duck_views

SF_DIR = os.environ.get("XT_TEST_SF_DIR", SF_SMOKE)

_load_all()
ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is not None)


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("D", v.isoformat())
    return ("s", str(v))


def canon_rows(cols, rows):
    """Sort columns by name (like the driver), then canonicalize values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [c for _, c in sorted(zip(cols, cols))], out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    register_duck_views(duck, SF_DIR)
    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    _, s_canon = canon_rows(spark_cols, spark_rows)
    _, d_canon = canon_rows(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first: {mismatches[:3]}"
