"""Streaming stateful exact-dedup (streaming/stateful.py,
applyInPandasWithState): cross-micro-batch dedup with duplicate
counting, and event-time TTL state expiry."""

from __future__ import annotations

import os
import time

import pytest

from incubator_xtable_spark.streaming.stateful import streaming_dedup_exact

TS0 = "2024-01-01 00:00:00"


def _write_batch_file(spark, in_dir: str, rows: list[tuple], name: str, mtime: float):
    """One parquet file of (doc_id, ts, text) rows with a pinned mtime so
    maxFilesPerTrigger=1 replays files in write order."""
    import glob as _glob
    import shutil as _shutil

    df = spark.createDataFrame(rows, "doc_id LONG, ts STRING, text STRING").selectExpr(
        "doc_id", "CAST(ts AS TIMESTAMP) ts", "text"
    )
    d = os.path.join(in_dir, name + ".dir")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    part = _glob.glob(os.path.join(d, "part-*.parquet"))[0]
    dest = os.path.join(in_dir, name + ".parquet")
    _shutil.move(part, dest)
    _shutil.rmtree(d)
    os.utime(dest, (mtime, mtime))


def _run_dedup(spark, in_dir: str, out_dir: str, ckpt: str, **kw):
    stream = (
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    # 4 state-store partitions (pinned at checkpoint creation), not the
    # session's 32: keeps DISTRIBUTED multi-partition state semantics
    # under test while dropping 28 store load/commit cycles per
    # micro-batch of fixture-sized data (r15 suite-latency work; TTL and
    # noDataMicroBatches confs stay at their defaults here on purpose)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            streaming_dedup_exact(stream, **kw)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out_dir)


def test_cross_batch_dedup_and_dup_counts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    # batch 1: A twice (in-batch dup), B once
    _write_batch_file(
        spark,
        in_dir,
        [(1, TS0, "doc A"), (2, "2024-01-01 00:10:00", "doc A"), (3, TS0, "doc B")],
        "b1",
        now - 20,
    )
    # batch 2: A again (cross-batch dup), C new
    _write_batch_file(
        spark,
        in_dir,
        [(4, "2024-01-01 00:20:00", "doc A"), (5, "2024-01-01 00:20:00", "doc C")],
        "b2",
        now - 10,
    )
    out = _run_dedup(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"), watermark="10 seconds"
    )
    rows = {(r["emit_kind"], r["text"], r["doc_id"], r["dup_count"]) for r in out.collect()}
    # firsts: earliest row per key carries the text
    assert ("first", "doc A", 1, 1) in rows  # one in-batch duplicate absorbed
    assert ("first", "doc B", 3, 0) in rows
    assert ("first", "doc C", 5, 0) in rows
    # the cross-batch duplicate surfaces as a dup_update with running count
    assert ("dup_update", None, 4, 2) in rows
    assert len(rows) == 4
    # dedup invariant: distinct 'first' emissions == distinct texts
    firsts = out.filter("emit_kind = 'first'")
    assert firsts.count() == 3
    assert firsts.select("text").distinct().count() == 3


def test_event_time_ttl_expires_state(spark, tmp_path):
    """A key idle past watermark+ttl drops from the state store, so a
    late duplicate re-emits as 'first' — the documented bounded-state
    trade. Timeouts only fire for groups WITHOUT data in the batch
    (flatMapGroupsWithState semantics), so the expiry needs its own
    batch: b2 advances the watermark with an unrelated key, expiring A;
    b3's duplicate A then finds no state."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    _write_batch_file(spark, in_dir, [(1, TS0, "doc A")], "b1", now - 30)
    # watermark advances to 02:00 (0s delay), far past A's b1-era timeout
    # (ttl 1ms); A has no data here, so its timeout fires and state drops
    _write_batch_file(spark, in_dir, [(2, "2024-01-01 02:00:00", "doc B")], "b2", now - 20)
    _write_batch_file(spark, in_dir, [(3, "2024-01-01 02:10:00", "doc A")], "b3", now - 10)
    out = _run_dedup(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        watermark="0 seconds",
        ttl_ms=1,
    )
    got = [(r["emit_kind"], r["text"]) for r in out.orderBy("ts").collect()]
    assert got == [("first", "doc A"), ("first", "doc B"), ("first", "doc A")]


def test_no_ttl_within_horizon_keeps_state(spark, tmp_path):
    """Same shape as the TTL test but with a 1-day TTL: the second A stays
    a dup_update (state survived)."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    _write_batch_file(spark, in_dir, [(1, TS0, "doc A")], "b1", now - 30)
    _write_batch_file(spark, in_dir, [(2, "2024-01-01 02:00:00", "doc A")], "b2", now - 20)
    out = _run_dedup(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        watermark="0 seconds",
    )
    kinds = [r["emit_kind"] for r in out.orderBy("ts").collect()]
    assert kinds == ["first", "dup_update"]


# ---------------------------------------------------------------------------
# r14: streaming SimHash near-dup (stateful banding)
# ---------------------------------------------------------------------------


def _run_neardup(spark, in_dir: str, out_dir: str, ckpt: str, **kw):
    from incubator_xtable_spark.streaming.stateful import streaming_simhash_near_dups

    stream = (
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")  # see _run_dedup
    try:
        q = (
            streaming_simhash_near_dups(stream, **kw)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out_dir)


def test_streaming_neardup_matches_batch_kernel(spark, tmp_path):
    """availableNow over a staged corpus finds exactly the pair set of
    the batch md5-SimHash banding kernel (same signatures, same bands) —
    including a CROSS-batch pair (near-dup arriving a micro-batch after
    its original). Per-band emissions collapse to the batch pair set
    under dropDuplicates."""
    from pyspark.sql import functions as F

    from incubator_xtable_spark.operators.dedup import simhash_near_duplicates
    from incubator_xtable_spark.sources.tables import load

    from .conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 120)
    base_rows = [
        (int(r["doc_id"]), TS0, r["text"]) for r in docs.select("doc_id", "text").collect()
    ]
    # plant: near-identical twin of doc 7 arriving in a LATER batch
    twin_text = next(t for i, _, t in base_rows if i == 7) + " extraword"
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    _write_batch_file(spark, in_dir, base_rows[:60], "b1", now - 30)
    _write_batch_file(spark, in_dir, base_rows[60:], "b2", now - 20)
    _write_batch_file(
        spark, in_dir, [(900007, "2024-01-01 00:30:00", twin_text)], "b3", now - 10
    )
    out = _run_neardup(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        watermark="10 seconds",
        max_hamming=3,
        max_bucket=100_000,  # the batch twin runs uncapped
    )
    stream_pairs = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in out.dropDuplicates(["doc_a", "doc_b"]).collect()
    }
    # batch twin: same md5 family / 32 bits / 4 bands, NO blocking cols
    batch_df = docs.select("doc_id", "text", "lang", "source").unionByName(
        spark.createDataFrame(
            [(900007, twin_text, "xx", "planted")],
            "doc_id LONG, text STRING, lang STRING, source STRING",
        )
    )
    batch_pairs = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_duplicates(
            batch_df, max_hamming=3, bits=32, n_bands=4, hash_family="md5"
        ).collect()
    }
    assert stream_pairs == batch_pairs
    assert (7, 900007) in {(a, b) for a, b, _ in stream_pairs}  # cross-batch hit


def test_streaming_neardup_bucket_saturation_and_ttl(spark, tmp_path):
    """Stop-bucket semantics: a bucket pushed past max_bucket saturates
    (later members neither pair nor accrete); and TTL expiry drops
    bucket state so a post-horizon near-dup pair is NOT emitted (the
    bounded-state trade, same as exact dedup)."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    # identical docs all land in the same buckets: 4 members with
    # max_bucket=3 -> saturation after the 4th arrival
    _write_batch_file(
        spark,
        in_dir,
        [(i, TS0, "same text here") for i in range(1, 5)],
        "b1",
        now - 30,
    )
    # post-saturation arrival pairs with nothing
    _write_batch_file(
        spark, in_dir, [(9, "2024-01-01 00:05:00", "same text here")], "b2", now - 20
    )
    out = _run_neardup(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        watermark="10 seconds",
        max_bucket=3,
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    # members 1-3 paired before saturation; 4 tripped the cap; 9 found a
    # saturated bucket
    assert pairs == {(1, 2), (1, 3), (2, 3)}

    # TTL: near-dup arriving past the horizon emits nothing
    in2 = str(tmp_path / "in2")
    os.makedirs(in2)
    _write_batch_file(spark, in2, [(1, TS0, "alpha beta gamma")], "c1", now - 30)
    # unrelated doc advances the watermark far past ttl -> bucket expires
    _write_batch_file(spark, in2, [(2, "2024-01-01 02:00:00", "unrelated words entirely")], "c2", now - 20)
    _write_batch_file(spark, in2, [(3, "2024-01-01 02:10:00", "alpha beta gamma")], "c3", now - 10)
    out2 = _run_neardup(
        spark,
        in2,
        str(tmp_path / "out2"),
        str(tmp_path / "ck2"),
        watermark="0 seconds",
        ttl_ms=1,
    )
    assert {(r["doc_a"], r["doc_b"]) for r in out2.collect()} == set()
