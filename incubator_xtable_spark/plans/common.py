"""Shared helpers for plans modules: table loading + cross-engine-exact
arithmetic building blocks.

Why decimals: the driver's correctness gate hashes values produced by Spark
and by DuckDB. ``sum(double)`` is order-dependent (parallel partial
aggregation sums in nondeterministic order), so two correct engines can
differ in final ulps. Decimal arithmetic is exact and associative, so both
engines agree bit-for-bit. Every money expression below therefore casts to
DECIMAL *before* aggregating, and every aggregate carries a final explicit
cast so the result schema is identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.sources.tables import load

PRICE = "decimal(12,2)"  # fits max price ~105k with headroom at sf100
PCT = "decimal(3,2)"  # 1 +/- discount/tax in [0.90, 1.10]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name)


def money(col: Column) -> Column:
    return col.cast(PRICE)


def one_minus(col: Column) -> Column:
    # (1 - x) evaluated in double is IEEE-deterministic, then snapped to
    # an exact 2-dp decimal; both engines produce the identical decimal.
    return (F.lit(1.0) - col).cast(PCT)


def one_plus(col: Column) -> Column:
    return (F.lit(1.0) + col).cast(PCT)


def revenue(price_col: Column, discount_col: Column) -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return money(price_col) * one_minus(discount_col)


def money_out(col: Column, scale: int = 4) -> Column:
    """Exact-decimal aggregate snapped ONCE to double for output.

    The DECIMAL intermediate keeps the aggregation order-insensitive (exact),
    and the single final DECIMAL->DOUBLE conversion is correctly rounded in
    both Spark (BigDecimal.doubleValue) and DuckDB, so the engines agree
    bit-for-bit. Emitting the DECIMAL itself breaks the driver's gate: its
    canonicalization pulls DuckDB DECIMAL through pandas as float64
    (``521320.603``) while Spark's toPandas() keeps ``Decimal('521320.6030')``
    — the canonical strings diverge whenever a trailing digit is zero.
    The oracle twin is ``CAST(CAST(sum(...) AS DECIMAL(38,s)) AS DOUBLE)``.
    """
    return col.cast(f"decimal(38,{scale})").cast("double")


def as_dbl(col: Column) -> Column:
    return col.cast("double")


def as_long(col: Column) -> Column:
    return col.cast("long")
