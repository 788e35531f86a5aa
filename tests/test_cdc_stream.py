"""CDC streaming consumption (streaming/cdc_stream.py): ordered
per-commit micro-batches from every format, exactly-once per commit
within a run, cursor-resumable across runs."""

from __future__ import annotations

import os

import pyarrow as pa

from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.streaming.cdc_stream import cdc_batches, stream_cdc
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget


def _replay(batches):
    """Apply a CDC stream to a key->row dict (insert/postimage set,
    delete removes)."""
    state = {}
    for commit, df in batches:
        for r in df.collect():
            if r["_change_type"] in ("insert", "update_postimage"):
                state[r["id"]] = r
            elif r["_change_type"] == "delete":
                state.pop(r["id"], None)
    return state


def test_delta_stream_replay_and_resume(spark, tmp_path):
    from pyspark.sql import functions as F

    from incubator_xtable_spark.sources.delta_source import read_delta_as_df
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource

    base = str(tmp_path / "t")
    spark.range(0, 6).select(F.col("id").cast("long")).coalesce(1).write.parquet(base)
    source = ParquetConversionSource(spark, base, name="t")
    target = DeltaConversionTarget(spark, base)
    ctrl = ConversionController()
    ctrl.sync(source, {TableFormat.DELTA: target})
    spark.range(6, 9).select(F.col("id").cast("long")).coalesce(1).write.mode(
        "append"
    ).parquet(base)
    ctrl.sync(source, {TableFormat.DELTA: target})

    seen: list[str] = []

    def on_batch(commit, df):
        seen.append(commit)

    cursor = stream_cdc(spark, "DELTA", base, on_batch, max_ticks=1)
    assert seen == ["0", "1"] and cursor == "1"

    state = _replay(cdc_batches(spark, "DELTA", base))
    assert sorted(state) == sorted(
        r["id"] for r in read_delta_as_df(spark, base).collect()
    )

    # resume: nothing new, then one new commit appears
    seen2: list[str] = []
    cursor = stream_cdc(spark, "DELTA", base, lambda c, d: seen2.append(c), after_commit=cursor, max_ticks=1)
    assert seen2 == [] and cursor == "1"
    spark.range(9, 10).select(F.col("id").cast("long")).coalesce(1).write.mode(
        "append"
    ).parquet(base)
    ctrl.sync(source, {TableFormat.DELTA: target})
    cursor = stream_cdc(spark, "DELTA", base, lambda c, d: seen2.append(c), after_commit=cursor, max_ticks=1)
    assert seen2 == ["2"] and cursor == "2"


def test_iceberg_stream_follows_parent_chain_order(spark, tmp_path):
    """Iceberg snapshot ids are random; the stream must follow the
    parent chain, not numeric order (the fixture's second snapshot id
    999 is numerically smaller than the first)."""
    from .test_iceberg_equality_deletes import (
        _append_delete_snapshot,
        _eq_parquet,
        _field_id,
        _make_table,
    )
    from incubator_xtable_spark.sources.iceberg_source import IcebergConversionSource

    d = _make_table(spark, tmp_path)
    src = IcebergConversionSource(spark, d)
    first_sid = src._meta()["current-snapshot-id"]
    fid = _field_id(src, "id")
    eq = _eq_parquet(os.path.join(d, "eq.parquet"), {"id": pa.array([3], pa.int64())})
    _append_delete_snapshot(spark, d, [(eq, [fid], {})], snapshot_id=999)

    commits = [c for c, _ in cdc_batches(spark, "ICEBERG", d)]
    assert commits == [str(first_sid), "999"]
    state = _replay(cdc_batches(spark, "ICEBERG", d))
    assert sorted(state) == [i for i in range(20) if i != 3]
    # resume after the first snapshot sees only the delete commit
    commits2 = [c for c, _ in cdc_batches(spark, "ICEBERG", d, after_commit=str(first_sid))]
    assert commits2 == ["999"]


def test_hudi_stream(spark, tmp_path):
    from .hudi_logtable import avro_data_block, delete_block
    from .test_hudi_log_merge import AVRO_SCHEMA, _add_log, _commit, _write_base
    from incubator_xtable_spark.sources.hudi_source import read_hudi_as_df

    base = str(tmp_path / "mor")
    os.makedirs(os.path.join(base, ".hoodie"))
    props = {
        "hoodie.table.name": "t",
        "hoodie.table.type": "MERGE_ON_READ",
        "hoodie.table.version": "6",
        "hoodie.table.base.file.format": "PARQUET",
        "hoodie.populate.meta.fields": "false",
        "hoodie.table.partition.fields": "",
        "hoodie.table.recordkey.fields": "id",
    }
    with open(os.path.join(base, ".hoodie", "hoodie.properties"), "w") as fh:
        for k, v in props.items():
            fh.write(f"{k}={v}\n")
    s1 = _write_base(base, "g1_0-0-0_001.parquet", list(range(4)))
    _commit(
        base,
        "20240101000001000",
        "deltacommit",
        [{"fileId": "g1", "path": "g1_0-0-0_001.parquet", "fileSizeInBytes": s1, "numWrites": 4}],
    )
    _add_log(
        base,
        ".g1_001.log.1_0-1-0",
        "20240101000002000",
        [
            avro_data_block(spark, "20240101000002000", AVRO_SCHEMA, [{"id": 0, "v": "u"}]),
            delete_block(spark, "20240101000002000", ["2"]),
        ],
    )
    state = _replay(cdc_batches(spark, "HUDI", base))
    final = {r["id"]: r for r in read_hudi_as_df(spark, base, mode="snapshot").collect()}
    assert sorted(state) == sorted(final)
    assert state[0]["v"] == "u" and 2 not in state


def test_paimon_stream(spark, tmp_path):
    from .paimon_testtable import PaimonTestTable

    fields = [("id", "INT"), ("label", "STRING"), ("level", "INT")]
    t = PaimonTestTable(spark, str(tmp_path / "pt"), fields, partition_keys=["level"]).create()
    t.append([{"id": i, "label": f"l{i}", "level": 0} for i in range(3)])
    t.append([{"id": i, "label": f"l{i}", "level": 0} for i in range(3, 5)])
    commits = [c for c, _ in cdc_batches(spark, "PAIMON", t.base)]
    assert commits == ["1", "2"]
    state = _replay(cdc_batches(spark, "PAIMON", t.base))
    assert sorted(state) == list(range(5))
    assert [c for c, _ in cdc_batches(spark, "PAIMON", t.base, after_commit="1")] == ["2"]


def test_delta_stream_raises_on_pruned_gap(spark, tmp_path):
    """Commits expired between cursor and head must fail loudly, never
    silently drop changes."""
    import pytest
    from pyspark.sql import functions as F

    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource

    base = str(tmp_path / "t")
    spark.range(0, 3).select(F.col("id").cast("long")).coalesce(1).write.parquet(base)
    source = ParquetConversionSource(spark, base, name="t")
    target = DeltaConversionTarget(spark, base)
    ctrl = ConversionController()
    for i in range(3):
        if i:
            spark.range(3 + i, 4 + i).select(F.col("id").cast("long")).coalesce(
                1
            ).write.mode("append").parquet(base)
        ctrl.sync(source, {TableFormat.DELTA: target})
    os.remove(os.path.join(base, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="expired"):
        list(cdc_batches(spark, "DELTA", base, after_commit="0"))


def test_hudi_cursor_at_archive_boundary_not_a_gap(spark, tmp_path):
    """A cursor equal to the newest ARCHIVED instant missed nothing —
    the stream must resume cleanly, while an older archived cursor
    still raises."""
    import pytest

    from .test_hudi_log_merge import _commit, _write_base
    from incubator_xtable_spark.sync.retention import hudi_archive_timeline

    base = str(tmp_path / "mor")
    os.makedirs(os.path.join(base, ".hoodie"))
    props = {
        "hoodie.table.name": "t",
        "hoodie.table.type": "MERGE_ON_READ",
        "hoodie.table.version": "6",
        "hoodie.table.base.file.format": "PARQUET",
        "hoodie.populate.meta.fields": "false",
        "hoodie.table.partition.fields": "",
        "hoodie.table.recordkey.fields": "id",
    }
    with open(os.path.join(base, ".hoodie", "hoodie.properties"), "w") as fh:
        for k, v in props.items():
            fh.write(f"{k}={v}\n")
    instants = [f"2024010100000{i}000" for i in range(1, 6)]
    for i, inst in enumerate(instants):
        s = _write_base(base, f"g{i}_0-0-0_00{i}.parquet", [i])
        _commit(
            base,
            inst,
            "deltacommit",
            [{"fileId": f"g{i}", "path": f"g{i}_0-0-0_00{i}.parquet", "fileSizeInBytes": s, "numWrites": 1}],
        )
    hudi_archive_timeline(base, keep_last=2)  # archives instants[0:3]
    # cursor == newest archived instant: clean resume over the active tail
    commits = [c for c, _ in cdc_batches(spark, "HUDI", base, after_commit=instants[2])]
    assert commits == instants[3:]
    # cursor below the archive horizon: loss -> raise
    with pytest.raises(ValueError, match="archived"):
        list(cdc_batches(spark, "HUDI", base, after_commit=instants[0]))


def test_available_now_checkpointed_run_equals_batch(spark, tmp_path):
    """r6: run_cdc_stream(available_now=True) — the Structured-Streaming
    shaped driver — drains the backlog exactly once, its replayed state
    equals the batch read, and the cursor lands durably in the
    checkpoint dir."""
    from pyspark.sql import functions as F

    from incubator_xtable_spark.sources.delta_source import read_delta_as_df
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.streaming.cdc_stream import run_cdc_stream

    base = str(tmp_path / "t")
    spark.range(0, 6).select(F.col("id").cast("long")).coalesce(1).write.parquet(base)
    source = ParquetConversionSource(spark, base, name="t")
    target = DeltaConversionTarget(spark, base)
    ctrl = ConversionController()
    ctrl.sync(source, {TableFormat.DELTA: target})
    spark.range(6, 9).select(F.col("id").cast("long")).coalesce(1).write.mode("append").parquet(base)
    ctrl.sync(source, {TableFormat.DELTA: target})

    cp = str(tmp_path / "cp")
    state = {}

    def on_batch(commit, df):
        for r in df.collect():
            if r["_change_type"] in ("insert", "update_postimage"):
                state[r["id"]] = r
            elif r["_change_type"] == "delete":
                state.pop(r["id"], None)

    cursor = run_cdc_stream(spark, "DELTA", base, on_batch, cp, available_now=True)
    assert cursor == "1"
    assert open(os.path.join(cp, "cursor")).read() == "1"
    assert sorted(state) == sorted(r["id"] for r in read_delta_as_df(spark, base).collect())

    # second availableNow run: checkpoint prevents reprocessing
    calls = []
    cursor = run_cdc_stream(spark, "DELTA", base, lambda c, d: calls.append(c), cp, available_now=True)
    assert calls == [] and cursor == "1"


def test_restart_mid_backlog_resumes_from_checkpoint(spark, tmp_path):
    """A crash after N processed commits resumes at commit N+1 — the
    checkpoint advances per batch, not per run."""
    from pyspark.sql import functions as F

    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.streaming.cdc_stream import run_cdc_stream

    base = str(tmp_path / "t")
    source = ParquetConversionSource(spark, base, name="t")
    target = DeltaConversionTarget(spark, base)
    ctrl = ConversionController()
    for lo, hi in ((0, 3), (3, 6), (6, 9)):
        spark.range(lo, hi).select(F.col("id").cast("long")).coalesce(1).write.mode(
            "append"
        ).parquet(base)
        ctrl.sync(source, {TableFormat.DELTA: target})

    cp = str(tmp_path / "cp")
    processed: list[str] = []

    class Boom(Exception):
        pass

    def crashy(commit, df):
        if len(processed) == 2:
            raise Boom()
        processed.append(commit)

    import pytest

    with pytest.raises(Boom):
        run_cdc_stream(spark, "DELTA", base, crashy, cp, available_now=True)
    assert processed == ["0", "1"]
    assert open(os.path.join(cp, "cursor")).read() == "1"

    resumed: list[str] = []
    cursor = run_cdc_stream(spark, "DELTA", base, lambda c, d: resumed.append(c), cp, available_now=True)
    assert resumed == ["2"] and cursor == "2"
