"""Query registry: the single source of truth for every capability the
engine claims (SURVEY.md §2 inventory + large-scale pipeline operators).

Each entry pairs
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame``  (the engine)
  - an optional DuckDB oracle SQL string                        (the gate)

The driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value hash, so every computed column must carry the SAME
alias in both implementations.

Cross-engine determinism rules used throughout (see plans/* modules):
  - money aggregates: cast operands to DECIMAL before summing — decimal
    arithmetic is exact and order-insensitive, so Spark and DuckDB agree
    bit-for-bit where double sums would drift by ulps under different
    summation orders;
  - ratios: integer/integer division in double is exact-in, deterministic
    IEEE out — safe;
  - LIMIT/top-k queries: always fully tie-broken ORDER BY;
  - year()/count() width differences: explicit CAST on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check
    category: str
    description: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    category: str,
    description: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, category, description)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every plans module so its @register decorators run."""
    global _LOADED
    if _LOADED:
        return
    from incubator_xtable_spark.plans import (  # noqa: F401
        events_queries,
        metadata_queries,
        pipeline_queries,
        relational,
        relational2,
        relational3,
        relational4,
        text_queries,
        vector_queries,
    )

    _LOADED = True
