"""Explicit key salting for EXTREME join skew.

AQE's skew-join handling (proven in tests/test_skew_join.py) splits a
hot reduce partition at MAP-OUTPUT granularity — when one key's rows
come from few mappers (or one), the hot partition is unsplittable and a
single task still processes the whole key. Salting fixes that case at
plan level: every big-side row gets a deterministic salt in
[0, n_salts), the small side replicates once per salt value, and the
join key becomes (key, salt) — the hot key's rows spread across n_salts
reduce partitions regardless of mapper layout.

Trade-off (docstring-level contract, the 100 TB math): the small side's
shuffle volume multiplies by n_salts, so this is for joins whose small
side is modest but above the broadcast threshold, with a measured hot
key. For small sides under the threshold just broadcast; for balanced
keys just let AQE work.

Deterministic: the salt is xxhash64 of the big side's whole row (not
rand()), so retried tasks and re-runs salt identically — a rand() salt
breaks Spark's task-retry determinism contract and can duplicate or
drop rows under speculative execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__xt_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` with ``small`` on ``on`` with the big side's hot keys
    spread over ``n_salts`` sub-partitions. Result rows/values are
    identical to ``big.join(small, on, how)`` (differential-tested);
    only the physical key distribution changes. Supported ``how``:
    inner / left / left_outer (the shapes where replicating the SMALL
    side cannot duplicate or lose matches)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} — replicating "
            "the small side under right/full outer joins would duplicate its "
            "unmatched rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    for c in (*keys, _SALT):
        if c == _SALT and _SALT in big.columns:
            raise ValueError(f"big side already carries a {_SALT} column")
    # content-deterministic salt over the whole row (see module docstring)
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, [*keys, _SALT], how).drop(_SALT)
