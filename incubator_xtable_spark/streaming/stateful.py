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
        # avoid pd.concat/sort for the common tiny-group shapes: most
        # content keys see a single 1-row chunk per micro-batch, and the
        # per-group python overhead IS the cost of this operator (r14)
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        if len(rows) > 1:
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


# ---------------------------------------------------------------------------
# Streaming NEAR-dup detection (r14): stateful SimHash banding
# ---------------------------------------------------------------------------

# state per (band, bval) bucket: member ids + signatures (bounded) and
# the saturation flag (stop-bucket semantics)
_NEARDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.LongType())),
        T.StructField("saturated", T.BooleanType()),
    ]
)

_NEARDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bval", T.IntegerType()),
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
        T.StructField("hamming", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _make_neardup_fn(max_hamming: int, max_bucket: int, ttl_ms: int):
    def _fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        # tiny-group fast path (see _make_dedup_fn): most buckets get one
        # 1-row chunk per micro-batch
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        if len(rows) > 1:
            rows = rows.sort_values(["ts", "doc_id"], kind="mergesort")
        if state.exists:
            doc_ids, sigs, saturated = state.get
            doc_ids = list(doc_ids)
            sigs = list(sigs)
            saturated = bool(saturated)
        else:
            doc_ids, sigs, saturated = [], [], False
        out_a, out_b, out_h, out_ts = [], [], [], []
        for doc_id, sig, ts in zip(rows["doc_id"], rows["sig"], rows["ts"]):
            doc_id = int(doc_id)
            sig = int(sig)
            if saturated:
                break  # stop-bucket: hot buckets stop matching AND growing
            if doc_id in doc_ids:
                continue  # replayed document: already a member, no re-emit
            if len(doc_ids) >= max_bucket:
                # the bucket went hot: drop its members, emit nothing for
                # this arrival, stop pairing (the batch kernel's
                # stop-fingerprint bound — sum over buckets of |bucket|^2
                # stays <= N * max_bucket; the cap trips BEFORE pairing so
                # a hot bucket's overflow arrival never fans out)
                doc_ids, sigs, saturated = [], [], True
                break
            for prev_id, prev_sig in zip(doc_ids, sigs):
                h = bin(prev_sig ^ sig).count("1")
                if h <= max_hamming:
                    a, b = (prev_id, doc_id) if prev_id < doc_id else (doc_id, prev_id)
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(h)
                    out_ts.append(ts)
            doc_ids.append(doc_id)
            sigs.append(sig)
        state.update((doc_ids, sigs, saturated))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
        if out_a:
            yield pd.DataFrame(
                {
                    "band": [int(key[0])] * len(out_a),
                    "bval": [int(key[1])] * len(out_a),
                    "doc_a": out_a,
                    "doc_b": out_b,
                    "hamming": out_h,
                    "ts": out_ts,
                }
            )

    return _fn


def streaming_simhash_near_dups(
    stream_df: DataFrame,
    *,
    watermark: str = "1 hour",
    max_hamming: int = 3,
    bits: int = 32,
    n_bands: int = 4,
    max_bucket: int = 64,
    ttl_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Streaming NEAR-duplicate detection (r14) — the banding kernel of
    `operators/dedup.simhash_near_duplicates` as a stateful stream
    operator. Each arriving document's SimHash (md5 token-hash family,
    the oracle-certified one; signature built JVM-side, zero Python in
    the per-row path) fans into ``n_bands`` (band, bval) bucket keys;
    per-bucket state holds the (doc_id, signature) members seen inside
    the TTL horizon, and an arriving document emits one row per
    in-bucket member within ``max_hamming`` — so a near-dup of ANY
    earlier in-horizon document surfaces the moment it arrives (the
    ingest-time quarantine gate batch sweeps can't give you).

    A close pair agreeing on several bands emits once PER band:
    consumers dedupe with ``dropDuplicates(["doc_a", "doc_b"])`` (or
    batch-side distinct in availableNow runs); the per-band emission
    keeps output append-mode and state per key O(bucket).

    Pigeonhole recall within the horizon matches the batch kernel:
    exact for ``max_hamming <= n_bands - 1``. Buckets that exceed
    ``max_bucket`` members SATURATE: members drop, further arrivals
    neither pair nor accrete (the batch stop-bucket bound — a
    near-uniform synthetic corpus cannot go quadratic in one bucket).
    Scale: state shards by (band, bval) across executors; per-key state
    is O(max_bucket) longs; TTL expiry bounds the horizon exactly like
    streaming_dedup_exact."""
    from incubator_xtable_spark.operators.dedup import simhash_from_hashes

    if bits > 32:
        raise ValueError("md5 token-hash family derives 32 hash bits")
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1

    def tok_hash(tok):
        return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")

    sigs = (
        stream_df.withWatermark("ts", watermark)
        .select(
            "doc_id",
            "ts",
            F.transform(
                F.array_distinct(F.split(F.col("text"), " ")), tok_hash
            ).alias("th"),
        )
        .select("doc_id", "ts", simhash_from_hashes(F.col("th"), bits).alias("sig"))
    )
    banded = sigs.select(
        "doc_id",
        "ts",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), b * band_bits)
                    .bitwiseAND(F.lit(mask))
                    .cast("int")
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bval"),
    )
    return banded.groupBy("band", "bval").applyInPandasWithState(
        _make_neardup_fn(max_hamming, max_bucket, ttl_ms),
        outputStructType=_NEARDUP_OUT_SCHEMA,
        stateStructType=_NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
