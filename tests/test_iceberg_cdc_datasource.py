"""`spark.readStream.format("iceberg_cdc")`
(streaming/iceberg_cdc_datasource.py): parent-chain offsets, pure-python
manifest planning, executor-side pyarrow reads with position-delete /
puffin-DV decode. Differentials against read_iceberg_cdc."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.iceberg_source import (
    IcebergConversionSource,
    read_iceberg_cdc,
)
from incubator_xtable_spark.streaming.iceberg_cdc_datasource import IcebergCDCDataSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.iceberg_target import read_table_metadata

from .test_iceberg_deletes import deleted_table  # noqa: F401


def _register(spark):
    try:
        spark.dataSource.register(IcebergCDCDataSource)
    except Exception:
        pass


def _drain(spark, base, cp, name, starting=None):
    reader = spark.readStream.format("iceberg_cdc").option("path", base)
    if starting is not None:
        reader = reader.option("startingSnapshot", str(starting))
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"select * from {name}")


def _chain(base):
    meta = read_table_metadata(base)
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    chain, cur = [], meta["current-snapshot-id"]
    while cur is not None:
        chain.append(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    return list(reversed(chain))


def test_stream_equals_batch_changelog_with_position_deletes(spark, deleted_table):
    base, _victim = deleted_table
    _register(spark)
    got = _drain(spark, base, base + "/.cp", "ice_cdc_eq")
    rows = sorted(
        (r["id"], r["_change_type"], r["_commit_snapshot_id"]) for r in got.collect()
    )
    want = []
    for sid in _chain(base):
        want.extend(
            (r["id"], r["_change_type"], sid)
            for r in read_iceberg_cdc(spark, base, sid).collect()
        )
    assert rows == sorted(want)
    # the delete snapshot contributed exactly rows 0..2 as deletes
    deletes = [(i, c) for i, c, _ in rows if c == "delete"]
    assert sorted(i for i, _ in deletes) == [0, 1, 2]
    inserts = [i for i, c, _ in rows if c == "insert"]
    assert sorted(inserts) == list(range(20))


def test_starting_snapshot_skips_history(spark, deleted_table):
    base, _victim = deleted_table
    _register(spark)
    first = _chain(base)[0]
    got = _drain(spark, base, base + "/.cp2", "ice_cdc_sv", starting=first)
    rows = sorted((r["id"], r["_change_type"]) for r in got.collect())
    # only the delete snapshot is after the cursor
    assert rows == [(0, "delete"), (1, "delete"), (2, "delete")]


def test_equality_deletes_stream_as_row_deletes(spark, tmp_path):
    """r6 second pass: equality deletes (content=2) resolve in-stream —
    pure-python null-safe value match under the STRICT
    data_seq < delete_seq rule — matching the batch changelog."""
    import pyarrow as pa

    from .test_iceberg_equality_deletes import (
        _append_delete_snapshot,
        _eq_parquet,
        _field_id,
        _make_table,
    )

    d = _make_table(spark, tmp_path)
    src = IcebergConversionSource(spark, d)
    fid = _field_id(src, "id")
    eq = _eq_parquet(
        os.path.join(d, "e.parquet"), {"id": pa.array([3, 7, 12], pa.int64())}
    )
    _append_delete_snapshot(spark, d, [(eq, [fid], {})], snapshot_id=999)

    _register(spark)
    got = _drain(spark, d, str(tmp_path / "cp"), "ice_cdc_eqdel")
    sid = 999
    stream_rows = sorted(
        (r["id"], r["_change_type"])
        for r in got.filter(f"_commit_snapshot_id = {sid}").collect()
    )
    batch_rows = sorted(
        (r["id"], r["_change_type"]) for r in read_iceberg_cdc(spark, d, sid).collect()
    )
    assert stream_rows == batch_rows == [(3, "delete"), (7, "delete"), (12, "delete")]
    inserts = sorted(
        r["id"] for r in got.filter("_change_type = 'insert'").collect()
    )
    assert inserts == list(range(20))


def test_identity_partitioned_stream_attaches_partition_values(spark, tmp_path):
    from incubator_xtable_spark.model.core import InternalPartitionField
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    base = str(tmp_path / "pt")
    (
        spark.range(0, 8)
        .select(F.col("id").cast("long"), (F.col("id") % 2).cast("int").alias("bucket"))
        .repartition(2, "bucket")
        .write.partitionBy("bucket")
        .parquet(base)
    )
    src = ParquetConversionSource(
        spark, base, name="pt", partition_fields=[InternalPartitionField("bucket")]
    )
    res = ConversionController().sync(
        src, {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="pt")}
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    _register(spark)
    got = _drain(spark, base, str(tmp_path / "cp"), "ice_cdc_part")
    rows = got.select("id", "bucket").collect()
    assert len(rows) == 8 and all(r["bucket"] == r["id"] % 2 for r in rows)


def test_stream_across_partition_spec_evolution(spark, tmp_path):
    """Composition: the stream's pure-python planning resolves each
    manifest against ITS OWN spec (shared spec_field_mapping), so both
    generations of an identity -> +days(ts) evolution stream with
    correct partition values."""
    from .test_iceberg_spec_evolution import (
        _evolve_add_day_field,
        _identity_partitioned_table,
    )

    d = str(tmp_path / "evo")
    _identity_partitioned_table(spark, d)
    _evolve_add_day_field(spark, d)

    _register(spark)
    got = _drain(spark, d, str(tmp_path / "cp"), "ice_cdc_evo")
    rows = sorted((r["id"], r["region"], r["_change_type"]) for r in got.collect())
    assert rows == [
        (1, "a", "insert"),
        (2, "a", "insert"),
        (3, "a", "insert"),
        (4, "b", "insert"),
        (5, "b", "insert"),
        (10, "c", "insert"),
        (11, "c", "insert"),
    ]


def test_stream_equality_null_safe_match(spark, tmp_path):
    """A NULL equality value matches NULL data values in the stream's
    pure-python tuple match (spec null-safe rule) — batch parity."""
    import pyarrow as pa

    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    from .test_iceberg_equality_deletes import (
        _append_delete_snapshot,
        _eq_parquet,
        _field_id,
    )

    d = str(tmp_path / "icnull")
    df = spark.createDataFrame(
        [(0, "a"), (1, None), (2, "c"), (3, None)], "id LONG, name STRING"
    )
    df.coalesce(1).write.mode("overwrite").parquet(d)
    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="icnull"),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, d, table_name="icnull")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    src = IcebergConversionSource(spark, d)
    fid = _field_id(src, "name")
    eq = _eq_parquet(
        os.path.join(d, "eqdel-null.parquet"), {"name": pa.array([None], pa.string())}
    )
    _append_delete_snapshot(spark, d, [(eq, [fid], {})], snapshot_id=999)

    _register(spark)
    got = _drain(spark, d, str(tmp_path / "cp"), "ice_cdc_null")
    stream_rows = sorted(
        (r["id"], r["_change_type"])
        for r in got.filter("_commit_snapshot_id = 999").collect()
    )
    batch_rows = sorted(
        (r["id"], r["_change_type"]) for r in read_iceberg_cdc(spark, d, 999).collect()
    )
    assert stream_rows == batch_rows == [(1, "delete"), (3, "delete")]


def test_max_commits_per_trigger_bounded_catch_up_chain(spark, deleted_table, tmp_path):
    """Chain-walk pacing: with maxCommitsPerTrigger=1 each availableNow
    run advances ONE snapshot along the parent chain; two runs drain the
    2-snapshot history."""
    base, _victim = deleted_table
    _register(spark)
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("iceberg_cdc")
            .option("path", base)
            .option("maxCommitsPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return sorted(
            (r["id"], r["_change_type"]) for r in spark.read.parquet(out).collect()
        )

    first = run()
    assert [i for i, c in first if c == "insert"] == list(range(20))
    assert not [i for i, c in first if c == "delete"]
    second = run()
    assert [i for i, c in second if c == "delete"] == [0, 1, 2]
    assert len(second) == 23
