"""Custom stateful streaming operators (applyInPandasWithState).

The training-data ingestion staple the built-in operators cannot
express: STREAMING exact deduplication that (a) emits the first-seen
row per content key immediately (append mode — downstream sinks get
deduped documents with no terminal watermark wait), (b) counts the
duplicates each key keeps absorbing, and (c) bounds its state with an
event-time TTL so a year-long ingest does not accrete a year of keys.

Spark's native ``dropDuplicates`` on a stream keeps only the key in the
state store and cannot surface duplicate counts or per-key first-seen
metadata; ``dropDuplicatesWithinWatermark`` bounds state but likewise
emits no dup statistics. This operator keys the stream by content hash
and keeps one tiny state row per key: (first_seen ts, dup_count).

The reference (apache/incubator-xtable) has no event-time processing at
all (SURVEY §2.4 "Watermarks/windows — none"); this belongs to the
engine's LLM-pipeline surface, next to the batch dedup family in
`operators/dedup.py`.

Scale posture (100 TB ingest):
- State per key is O(1) (two longs); the state store shards by the
  groupBy key hash across executors — no driver funnel.
- Event-time TTL (``ttl_ms`` past the stream's watermark) expires idle
  keys, so state size tracks the DISTINCT keys inside the TTL horizon,
  not the stream's lifetime. A late duplicate arriving after its key
  expired re-emits as "first seen" — the documented trade; widen the
  TTL (more state) or run a batch `dedup_exact` sweep downstream to
  reconcile. (Spark fires timeouts only for groups WITHOUT data in the
  micro-batch, so a duplicate landing in the very batch its key would
  have expired is still deduped — expiry errs conservative.)
- The per-group python function sees Arrow batches (pandas), touches
  only the groups present in the micro-batch, and emits at most one
  row per (key, batch) — output volume is bounded by distinct keys per
  batch.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: first_seen (epoch micros), dup_count
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_seen_us", T.LongType()),
        T.StructField("dup_count", T.LongType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("content_key", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("emit_kind", T.StringType()),  # first | dup_update
        T.StructField("dup_count", T.LongType()),
    ]
)


def _make_dedup_fn(ttl_ms: int):
    def _dedup_fn(
        key: Tuple[str], pdfs: Iterator["object"], state: GroupState
    ) -> Iterator["object"]:
        import pandas as pd

        if state.hasTimedOut:
            # TTL horizon passed with no new rows for this key: drop the
            # state (a later duplicate re-emits as first — the
            # bounded-state trade)
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "doc_id"], kind="mergesort")
        n = int(len(rows))
        first = rows.iloc[0]
        ts_us = int(first["ts"].value // 1_000)
        if state.exists:
            first_seen_us, dup_count = state.get
            dup_count = int(dup_count) + n
            state.update((int(first_seen_us), dup_count))
            emit = pd.DataFrame(
                {
                    "content_key": [key[0]],
                    "doc_id": [int(first["doc_id"])],
                    "ts": [first["ts"]],
                    "text": [None],
                    "emit_kind": ["dup_update"],
                    "dup_count": [dup_count],
                }
            )
        else:
            dup_count = n - 1
            state.update((ts_us, dup_count))
            emit = pd.DataFrame(
                {
                    "content_key": [key[0]],
                    "doc_id": [int(first["doc_id"])],
                    "ts": [first["ts"]],
                    "text": [first["text"]],
                    "emit_kind": ["first"],
                    "dup_count": [dup_count],
                }
            )
        # re-arm the TTL: expire this key `ttl_ms` past the current watermark
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
        yield emit

    return _dedup_fn


def streaming_dedup_exact(
    stream_df: DataFrame,
    *,
    watermark: str = "1 hour",
    ttl_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Stateful streaming exact-dedup over a documents stream.

    ``stream_df`` needs (doc_id long, ts timestamp, text string). Rows
    key on sha256(text); the first row per key (earliest ts in its
    micro-batch, doc_id tie-break) emits as ``emit_kind='first'``
    carrying the text; later batches containing duplicates of a live key
    emit a single ``dup_update`` row with the running duplicate count
    (text null — no re-shipping of content). Keys idle past the
    watermark + ``ttl_ms`` expire from the state store.
    """
    keyed = stream_df.withWatermark("ts", watermark).withColumn(
        "content_key", F.sha2(F.col("text").cast("binary"), 256)
    )
    return keyed.groupBy("content_key").applyInPandasWithState(
        _make_dedup_fn(ttl_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
