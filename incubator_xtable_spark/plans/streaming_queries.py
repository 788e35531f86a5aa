"""Driver-visible streaming queries: each callable RUNS a real
Structured Streaming pipeline (availableNow, checkpointed, multi
micro-batch) inside the query call and returns the terminal result as a
batch DataFrame, so the driver's DuckDB differential grades streaming
semantics end-to-end.

`dedup_streaming_firstseen` drives `streaming/stateful.py`'s
applyInPandasWithState exact-dedup over a synthesized re-ingest: the
documents table (doc_id < 400) streams in two micro-batches — the
originals, then a batch re-ingesting every doc_id % 5 == 0 text under a
new doc_id — and the emitted first/dup_update rows fold to
(keeper_doc_id, text, dup_total). Two batches exercise everything the
oracle checks (cross-batch state survival, accumulated dup counts, no
re-emission) at two trigger cycles instead of three (r9 bench hygiene;
the in-batch first-seen path is covered by any naturally duplicated
original texts and by tests/test_streaming_stateful.py). The oracle recomputes the synthesis +
fold in SQL (GROUP BY text), so a hash-match proves: first-seen keeps
the EARLIEST doc per text across batches, duplicate counts accumulate
across the state store, and no text is emitted twice.

The reference has no event-time/stateful processing (SURVEY §2.4); this
row belongs to the engine's LLM-pipeline surface.

Scale: the pinned 480-row sample keeps the driver/bench cost flat at
every SF (the operator itself is the 100 TB path — state is O(distinct
keys in TTL horizon), sharded by key). shuffle.partitions is pinned to
1 for the stream's state store (fresh checkpoint per call) and restored
after — a vanilla driver session would otherwise spread 480 rows over
200 state partitions; the emissions land in a memory sink (r9, VERDICT
r8 #6 — parquet-sink commit latency was pure overhead on a 480-row
fixture; the memory sink is append-visible per micro-batch and the
checkpoint is fresh per call, so the known can't-resume limitation
never applies).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.plans.registry import register
from incubator_xtable_spark.plans.common import t

_N_DOCS = 400  # originals: doc_id < 400; re-ingest: doc_id % 5 == 0

STREAM_DEDUP_ORACLE = f"""
WITH src AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_N_DOCS}
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents
  WHERE doc_id < {_N_DOCS} AND doc_id % 5 = 0
)
SELECT min(doc_id) AS keeper_doc_id,
       text,
       count(*) - 1 AS dup_total
FROM src
GROUP BY text
"""


def _docs_arrow(sf_dir: str, n_docs: int):
    """(doc_id int64, text string) pyarrow table of documents with
    doc_id < n_docs — DRIVER-SIDE fixture staging with zero Spark jobs
    (r14: the previous Spark-frame staging paid a full documents scan +
    toArrow collect per micro-batch frame; the pinned sample is a direct
    pyarrow read, same rows, same types)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return tbl.filter(pc.less(tbl["doc_id"], n_docs))


def _src_batches(spark: SparkSession, sf_dir: str) -> list:
    """The micro-batch pyarrow tables, in ingest order. ts is synthetic
    event time = epoch + doc_id minutes, so batch order == event-time
    order and first-seen == min doc_id (what the oracle computes)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # base offset keeps every synthetic ts STRICTLY ABOVE epoch 0: Spark's
    # initial watermark is 0, and a row whose event time equals the
    # watermark is dropped as late — doc_id 0 would silently vanish
    docs = _docs_arrow(sf_dir, _N_DOCS)
    ts_us = lambda ids: pc.multiply(  # noqa: E731
        pc.add(pc.multiply(ids, 60), 86_400), 1_000_000
    ).cast(pa.timestamp("us", tz="UTC"))
    base = pa.table(
        {"doc_id": docs["doc_id"], "ts": ts_us(docs["doc_id"]), "text": docs["text"]}
    )
    ids_np = docs["doc_id"].to_numpy()
    re = docs.filter(pa.array(ids_np % 5 == 0))
    new_ids = pc.add(re["doc_id"], 10_000)
    reingest = pa.table({"doc_id": new_ids, "ts": ts_us(new_ids), "text": re["text"]})
    return [base, reingest]


@register(
    "dedup_streaming_firstseen",
    oracle=STREAM_DEDUP_ORACLE,
    category="dedup",
    description="stateful streaming exact-dedup (applyInPandasWithState) folded to keeper+dup counts",
    graded=False,
)
def dedup_streaming_firstseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from incubator_xtable_spark.streaming.stateful import streaming_dedup_exact

    import pyarrow as pa
    import pyarrow.parquet as pq

    work = tempfile.mkdtemp(prefix="xt_stream_dedup_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ck")
    os.makedirs(in_dir)
    now = 1_700_000_000  # any fixed base; only relative order matters
    # FIXTURE SYNTHESIS, not a data path: the micro-batch files are a
    # pinned 480-row sample, staged ENTIRELY driver-side via pyarrow
    # (r14: zero Spark jobs — the previous per-frame toArrow collect paid
    # a documents scan each; a real ingest streams from arriving files,
    # never through here). tz=UTC keeps isAdjustedToUTC=true in the
    # parquet footer, so the readStream TIMESTAMP schema reads the same
    # instants back regardless of the driver session's timezone.
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("text", pa.string()),
        ]
    )
    for i, tbl in enumerate(_src_batches(spark, sf_dir)):
        dest = os.path.join(in_dir, f"b{i}.parquet")
        pq.write_table(tbl.cast(schema), dest)
        os.utime(dest, (now + 10 * i, now + 10 * i))

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    # r14 (guide §1 measured): availableNow appends a ZERO-input
    # micro-batch after the last file purely to evaluate event-time
    # timeouts — a full addBatch (state-store load/commit + Python
    # stateful exchange, ~1/3 of the entry's wall time) that provably
    # emits nothing here: the TTL is pinned 7 DAYS past a ~7-hour
    # event-time horizon, so no key can expire within the run. TTL
    # expiry semantics keep their own gate (tests/test_streaming_stateful.py,
    # which leaves this conf at its default). Restored in finally.
    prev_nodata = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    sink = f"xt_stream_dedup_{uuid.uuid4().hex[:12]}"
    try:
        stream = (
            spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        q = (
            # TTL pinned far past the synthetic event-time span (~7 days
            # vs the data's ~7 hours): batch-1 keys arm their timeout at
            # watermark 0, and the re-ingest batch must still find them
            # live. TTL EXPIRY semantics are gated separately in
            # tests/test_streaming_stateful.py.
            streaming_dedup_exact(
                stream, watermark="10 seconds", ttl_ms=7 * 86_400 * 1000
            )
            .writeStream.format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata)

    # materialize off the memory sink's in-memory table before returning
    # (the driver collects later; localCheckpoint pins the 400 rows so the
    # temp view can be dropped)
    emis = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    firsts = emis.filter(F.col("emit_kind") == "first").select(
        "content_key", F.col("doc_id").alias("keeper_doc_id"), "text"
    )
    totals = emis.groupBy("content_key").agg(F.max("dup_count").alias("dup_total"))
    return firsts.join(totals, "content_key").select("keeper_doc_id", "text", "dup_total")


# ---------------------------------------------------------------------------
# r14: streaming SimHash near-dup — the banding kernel as a stream
# ---------------------------------------------------------------------------

_ND_DOCS = 200  # originals: doc_id < 200; twins: doc_id % 9 == 0 re-ingested

# The oracle recomputes the md5 SimHash signatures over the SAME
# synthesized union and takes the BRUTE-FORCE pair set (no blocking):
# with 4 bands over 32 bits, banding recall is exact for Hamming <= 3
# (pigeonhole), so the streaming banded result equals brute force —
# certifying the stateful banding mechanics by value.
STREAM_NEARDUP_ORACLE = f"""
WITH src AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_ND_DOCS}
  UNION ALL
  SELECT doc_id + 20000 AS doc_id, text || ' extraword' AS text FROM documents
  WHERE doc_id < {_ND_DOCS} AND doc_id % 9 = 0
), th AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')),
                        tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT) AS h
  FROM src
), sg AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32), b ->
           CASE WHEN 2 * coalesce(list_sum(list_transform(h, v -> (v >> b) & 1)), 0) > len(h)
                THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sig
  FROM th
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sg a
JOIN sg b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
ORDER BY doc_a, doc_b
"""


@register(
    "dedup_streaming_neardup",
    oracle=STREAM_NEARDUP_ORACLE,
    category="dedup",
    description="stateful streaming SimHash near-dup (per-bucket banding "
    "state) folded to the distinct pair set",
    graded=False,
)
def dedup_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming/stateful.streaming_simhash_near_dups driven availableNow
    over a synthesized two-batch ingest (originals, then near-identical
    twins of every doc_id % 9 == 0 under new ids) — cross-batch pairing,
    per-bucket state and the md5 signature family all exercised; the
    emitted per-band rows fold to DISTINCT (doc_a, doc_b, hamming),
    which the DuckDB oracle certifies against the brute-force pair set
    (banding recall is exact for max_hamming <= n_bands - 1, so the
    sets provably coincide). Same pinned-sample scale posture as
    dedup_streaming_firstseen."""
    from incubator_xtable_spark.streaming.stateful import streaming_simhash_near_dups

    import pyarrow as pa
    import pyarrow.parquet as pq

    import pyarrow.compute as pc

    # pinned-sample fixture staging, zero Spark jobs (r14 — see
    # dedup_streaming_firstseen): epoch 2024-01-01 UTC = 1704067200 s
    docs = _docs_arrow(sf_dir, _ND_DOCS)
    _EPOCH_US = 1_704_067_200 * 1_000_000
    base = pa.table(
        {
            "doc_id": docs["doc_id"],
            "ts": pc.add(
                pc.multiply(docs["doc_id"], 60 * 1_000_000), _EPOCH_US
            ).cast(pa.timestamp("us", tz="UTC")),
            "text": docs["text"],
        }
    )
    tw = docs.filter(pa.array(docs["doc_id"].to_numpy() % 9 == 0))
    twin_ts = pa.array(
        [_EPOCH_US + 500 * 60 * 1_000_000] * len(tw), pa.int64()
    ).cast(pa.timestamp("us", tz="UTC"))
    twins = pa.table(
        {
            "doc_id": pc.add(tw["doc_id"], 20_000),
            "ts": twin_ts,
            "text": pc.binary_join_element_wise(
                tw["text"].cast(pa.string()), " extraword", ""
            ),
        }
    )
    work = tempfile.mkdtemp(prefix="xt_stream_neardup_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ck")
    os.makedirs(in_dir)
    now = 1_700_000_000
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("text", pa.string()),
        ]
    )
    for i, tbl in enumerate([base, twins]):
        dest = os.path.join(in_dir, f"b{i}.parquet")
        pq.write_table(tbl.cast(schema), dest)
        os.utime(dest, (now + 10 * i, now + 10 * i))

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    # skip the zero-input timeout batch — same rationale and restore
    # discipline as dedup_streaming_firstseen (TTL 7 days >> horizon)
    prev_nodata = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    sink = f"xt_stream_neardup_{uuid.uuid4().hex[:12]}"
    try:
        stream = (
            spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        q = (
            streaming_simhash_near_dups(
                stream,
                watermark="10 seconds",
                max_hamming=3,
                max_bucket=1_000_000,  # the oracle is uncapped brute force
                ttl_ms=7 * 86_400 * 1000,
            )
            .writeStream.format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata)

    emis = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return (
        emis.select("doc_a", "doc_b", "hamming")
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
