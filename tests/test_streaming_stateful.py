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
    q = (
        streaming_dedup_exact(stream, **kw)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
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
