"""As-of (point-in-time) join as a composition of built-in DataFrame ops.

For each left row, find the latest right row with the same key whose
timestamp is <= (inclusive) or < (strict) the left timestamp.

Strategy (scale-first, no UDFs): union both sides tagged, single shuffle on
the join key, one window pass with ``last(..., ignorenulls=True)`` carrying
the most recent right-side payload forward, then keep left rows. This is
the classic "union + forward-fill" as-of join:

- one shuffle on the key (same cost as any keyed join),
- no row explosion (unlike range cross-joins),
- whole-stage-codegen-friendly window execution.

At 100 TB: partition count follows spark.sql.shuffle.partitions / AQE;
skewed keys can be salted by pre-splitting left and right on a salt column
before calling (the window only needs per-key time order, which salting by
time range preserves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_ATS = "__asof_ts"
_SIDE = "__asof_is_left"
_TB = "__asof_tb"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    right_tiebreak: str,
    left_unique: str | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Left as-of join.

    Parameters
    ----------
    on: equality key column (present in both sides).
    left_ts / right_ts: event-time columns.
    right_cols: {output_name: right_column} payload carried from the
        matched right row (NULL when no right row precedes the left row).
    right_tiebreak: right column breaking ties among equal right
        timestamps (the max wins, matching ORDER BY ts DESC, tb DESC LIMIT 1).
    left_unique: unused hint, kept for readability of call sites.
    inclusive: True -> right.ts <= left.ts; False -> strict <.
    """
    out_names = list(right_cols)
    right_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias(_ATS),
        F.col(right_tiebreak).alias(_TB),
        *[F.col(src).alias(out) for out, src in right_cols.items()],
    ).withColumn(_SIDE, F.lit(0 if inclusive else 1))

    left_tagged = left.withColumn(_ATS, F.col(left_ts)).withColumn(
        _SIDE, F.lit(1 if inclusive else 0)
    ).withColumn(_TB, F.lit(None).cast(right_tagged.schema[_TB].dataType))
    for out in out_names:
        left_tagged = left_tagged.withColumn(out, F.lit(None).cast(right_tagged.schema[out].dataType))

    unioned = left_tagged.unionByName(right_tagged, allowMissingColumns=True)

    w = (
        W.partitionBy(on)
        .orderBy(F.col(_ATS).asc(), F.col(_SIDE).asc(), F.col(_TB).asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in out_names],
        *[F.last(F.col(out), ignorenulls=True).over(w).alias(out) for out in out_names],
    )
    is_left = F.col(_SIDE) == (1 if inclusive else 0)
    return filled.filter(is_left).drop(_ATS, _SIDE, _TB)
