"""transformWithState operators (Spark 4's arbitrary-stateful API —
the successor to applyInPandasWithState, with TYPED state variables,
TTL, and timers managed per state variable instead of one opaque
tuple).

ENVIRONMENT GATE: Spark's transformWithState state protocol is
protobuf-based (pyspark/sql/streaming/proto/StateMessage_pb2) and this
container ships no google.protobuf — the operator definition and its
stream==batch differential tests (tests/test_streaming_tws.py) are
complete and skip-gated on `import google.protobuf`, becoming live the
moment the dependency exists. The applyInPandasWithState operators
(streaming/stateful.py) carry the engine's RUNNABLE stateful-streaming
coverage in this environment.

`streaming_user_totals` maintains per-user running aggregates
(n_events, exact decimal-cent total) in ONE ValueState row and emits
the updated totals for every user touched by a micro-batch — the
streaming profile table an ingestion pipeline keeps next to the event
stream. The engine's applyInPandasWithState operator
(streaming/stateful.py) predates this API; both remain so the two
stateful surfaces Spark ships are each exercised.

Scale posture (100 TB ingest):
- state is one row per user (two longs), sharded by the groupBy key
  across the state store — no driver funnel;
- optional ``ttl_ms`` bounds state to users active inside the TTL
  horizon (processing-time TTL is managed by the state store itself in
  this API — no hand-rolled timeout plumbing);
- output volume per batch is bounded by DISTINCT users in the batch
  (one row each), not event count;
- totals accumulate in integer cents (exact, order-insensitive), so
  stream == batch comparisons are bit-deterministic — the same
  decimal-money rule the batch oracle queries follow.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUT_SCHEMA = "user_id LONG, n_events LONG, total_cents LONG"


class _UserTotals(StatefulProcessor):
    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events LONG, total_cents LONG", self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator["pd.DataFrame"], timerValues
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n = 0
        cents = 0
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["value_cents"].sum())
        prev = self._totals.get() if self._totals.exists() else None
        if prev is not None:
            n += int(prev[0])
            cents += int(prev[1])
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "total_cents": [cents]}
        )

    def close(self) -> None:
        pass


def streaming_user_totals(
    events: DataFrame, *, ttl_ms: int | None = None, time_mode: str = "None"
) -> DataFrame:
    """events(user_id, value, ...) stream -> per-user running totals,
    one updated row per (user, micro-batch). `value` snaps to exact
    integer cents BEFORE the stateful operator so accumulation order
    never changes the result."""
    prepared = events.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("value_cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserTotals(ttl_ms),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode=time_mode,
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """The batch twin: what the stream's FINAL per-user emission must
    equal after an availableNow drain."""
    return (
        events.select(
            "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("value_cents"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("total_cents"),
        )
    )
