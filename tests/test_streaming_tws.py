"""transformWithState running user totals (streaming/tws.py): the
Spark-4 arbitrary-stateful API exercised end-to-end — cross-micro-batch
accumulation in a typed ValueState, Update-mode emission, and an exact
stream == batch differential (integer-cent accumulation makes the
comparison bit-deterministic)."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest

# Spark's transformWithState wire protocol is protobuf-based
# (pyspark/sql/streaming/proto/StateMessage_pb2); this container ships
# no google.protobuf, so the operator is environment-gated — the module
# and these tests become live the moment protobuf exists.
pytest.importorskip("google.protobuf")

from incubator_xtable_spark.streaming.tws import (  # noqa: E402
    batch_user_totals,
    streaming_user_totals,
)


def _write_events_file(spark, in_dir: str, rows: list[tuple], name: str, mtime: float):
    df = spark.createDataFrame(rows, "user_id LONG, value DOUBLE")
    d = os.path.join(in_dir, name + ".dir")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
    dest = os.path.join(in_dir, name + ".parquet")
    shutil.move(part, dest)
    shutil.rmtree(d)
    os.utime(dest, (mtime, mtime))


def test_tws_totals_match_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    b1 = [(1, 10.25), (1, 0.10), (2, 5.00)]
    b2 = [(1, 1.01), (3, 7.77), (2, -2.50)]
    _write_events_file(spark, in_dir, b1, "b1", now - 20)
    _write_events_file(spark, in_dir, b2, "b2", now - 10)

    stream = (
        spark.readStream.schema("user_id LONG, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_user_totals(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.parquet(out_dir)

    # FINAL emission per user == the batch aggregate, exactly
    import pandas as pd  # noqa: F401

    rows = out.collect()
    final: dict[int, tuple[int, int]] = {}
    for r in rows:  # Update mode: later emissions supersede; totals only grow
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_cents"])
    batch = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in batch_user_totals(
            spark.createDataFrame(b1 + b2, "user_id LONG, value DOUBLE")
        ).collect()
    }
    assert final == batch
    # cross-batch accumulation really happened: user 1 appears with a
    # mid-stream emission smaller than its final total
    u1_emissions = sorted(r["n_events"] for r in rows if r["user_id"] == 1)
    assert u1_emissions[0] < u1_emissions[-1] == 3


def test_tws_restart_resumes_state(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    _write_events_file(spark, in_dir, [(7, 1.00)], "b1", now - 20)
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def _drain():
        stream = (
            spark.readStream.schema("user_id LONG, value DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        q = (
            streaming_user_totals(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _drain()
    _write_events_file(spark, in_dir, [(7, 2.00)], "b2", now - 10)
    _drain()  # fresh query, same checkpoint: ValueState must survive
    rows = spark.read.parquet(out_dir).collect()
    best = max((r["n_events"], r["total_cents"]) for r in rows if r["user_id"] == 7)
    assert best == (2, 300)
