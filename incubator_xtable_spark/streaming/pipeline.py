"""Structured Streaming pipelines.

Two parity pieces:
1. ``windowed_event_counts`` — the streaming twin of
   plans/events_queries.events_tumbling_hourly: readStream over the events
   parquet, 1h tumbling windows + watermark for late data. pytest runs it
   with Trigger.AvailableNow and asserts batch == streaming results.
2. ``continuous_sync`` — the reference's continuous mode
   (RunSync.java:257-280): re-run the ConversionController on a cadence;
   each tick is cheap because the INCREMENTAL path replays only new
   commits (micro-batch changelog semantics; the bookmark is the state
   store, CommitsBacklog the exactly-once queue — SURVEY §2.4).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (new files are discovered
    as they land — the ingest pattern for a continuously-growing dataset).

    The events ts column ships in two flavors across testdata generations
    (TIMESTAMP(NANOS) -> long under nanosAsLong, or TIMESTAMP(MICROS,
    NTZ)); a batch probe of the same directory picks the right streaming
    schema + normalization — mirrors sources/tables.load."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        probed = spark.read.parquet(sf_dir).schema["ts"].dataType
    except Exception:
        # empty ingest dir at startup (files land later): default to the
        # nanos-as-long flavor — the startup-before-first-file pattern
        # must keep working
        probed = T.LongType()
    raw = spark.readStream.schema(_events_raw_schema(probed)).parquet(f"{sf_dir}")
    if isinstance(probed, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(probed, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def windowed_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1h tumbling windows with a watermark for late data; streaming-safe
    aggregation (append mode after watermark passes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_stream_interval_join(
    events: DataFrame,
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream INNER join: purchases within ``interval``
    of a signup by the same user — the streaming twin of
    plans/events_queries.events_interval_join (pytest asserts stream ==
    batch under availableNow).

    State-boundedness at 100 TB ingest: both sides carry a watermark and
    the join condition time-bounds the match window, so Spark derives a
    state-eviction watermark for EACH side — a signup older than
    (watermark + interval) can never match a future purchase and its
    state drops; purchases age out after the watermark alone. Without
    the time bound the signup side would accumulate forever."""
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("signup_event"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_event"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {interval}")),
    )
    return joined.select(
        "user_id",
        "signup_event",
        "purchase_event",
        (F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")).alias(
            "micros_between"
        ),
        "purchase_value",
    )


def session_window_counts(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming gap-based sessions: the SAME session_window expression as
    the batch entry events_session_window_agg under a watermark — closed
    sessions (end < watermark) emit and their state evicts, so state is
    bounded by active sessions, not history. pytest pins stream == batch
    under availableNow."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).cast("int").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def run_available_now(stream_df: DataFrame, table_name: str, checkpoint: str) -> None:
    """Drain everything currently available into an in-memory sink
    (test/bootstrap harness for streaming jobs)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Streaming sync hook: sync-after-every-micro-batch, the Structured
# Streaming equivalent of the reference's Hudi post-commit XTableSyncTool
# (xtable-hudi-support/.../sync/XTableSyncTool.java:55-100): each arriving
# batch of source files triggers an incremental metadata sync so targets
# never lag more than one micro-batch behind the source.
# ---------------------------------------------------------------------------


def streaming_sync(
    spark: SparkSession,
    controller: Any,
    source: Any,
    targets: dict[Any, Any],
    *,
    watch_dir: str,
    schema: T.StructType,
    checkpoint: str,
    available_now: bool = True,
):
    """Watch ``watch_dir`` for new data files; every micro-batch runs one
    controller sync cycle (FULL first time, INCREMENTAL after). Returns the
    StreamingQuery; results accumulate in query metadata via logs."""
    stream = spark.readStream.schema(schema).parquet(watch_dir)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # the batch content is only the arrival signal; the sync reads
        # authoritative state from the source adapter
        controller.sync(source, targets)

    writer = stream.writeStream.foreachBatch(on_batch).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


# ---------------------------------------------------------------------------
# Continuous sync (RunSync.java:257-280)
# ---------------------------------------------------------------------------


def continuous_sync(
    controller: Any,
    source: Any,
    targets: dict[Any, Any],
    *,
    interval_sec: float = 5.0,
    max_cycles: Optional[int] = None,
    on_cycle: Optional[Callable[[int, dict], None]] = None,
) -> list[dict]:
    """Re-run sync on a cadence (the reference's default is 5 s). Each
    cycle is incremental after the first; results are returned per cycle."""
    history: list[dict] = []
    cycle = 0
    while max_cycles is None or cycle < max_cycles:
        results = controller.sync(source, targets)
        history.append(results)
        if on_cycle is not None:
            on_cycle(cycle, results)
        cycle += 1
        if max_cycles is not None and cycle >= max_cycles:
            break
        time.sleep(interval_sec)
    return history
