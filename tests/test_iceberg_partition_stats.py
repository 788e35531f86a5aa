"""Iceberg partition statistics files (table spec "Partition
Statistics" section, beyond the reference — ref xtable's Iceberg target
writes no statistics of either kind). One parquet row per partition of
the unified partition tuple; registered in table metadata's
``partition-statistics`` list; differentially checked against a groupBy
over the table's own rows; survives later commits (carry-forward) and
dies with expired snapshots (retention)."""

import os

import pytest

from incubator_xtable_spark.model.core import (
    InternalPartitionField,
    SyncStatusCode,
    TableFormat,
)
from incubator_xtable_spark.sources.iceberg_source import read_iceberg_as_df
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.iceberg_statistics import (
    read_partition_statistics,
    write_partition_statistics,
)
from incubator_xtable_spark.targets.iceberg_target import (
    IcebergConversionTarget,
    read_table_metadata,
)

from .conftest import SF_SMOKE


def _partitioned_iceberg(spark, tmp_path):
    base = str(tmp_path / "ice_part")
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .write.partitionBy("n_regionkey")
        .parquet(base)
    )
    res = ConversionController().sync(
        ParquetConversionSource(
            spark,
            base,
            name="nation",
            partition_fields=[InternalPartitionField("n_regionkey")],
        ),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="nation")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    return base


def test_partition_statistics_match_table_rows(spark, tmp_path):
    base = _partitioned_iceberg(spark, tmp_path)
    stats_path = write_partition_statistics(spark, base)
    assert os.path.exists(stats_path)
    meta = read_table_metadata(base)
    entries = meta["partition-statistics"]
    assert len(entries) == 1
    assert entries[0]["snapshot-id"] == meta["current-snapshot-id"]
    assert entries[0]["file-size-in-bytes"] == os.path.getsize(stats_path)

    rows = read_partition_statistics(base)
    # differential: per-partition record counts from the table itself
    expect = {
        r["n_regionkey"]: r["cnt"]
        for r in read_iceberg_as_df(spark, base).groupBy("n_regionkey").count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    got = {r["partition"]["n_regionkey"]: r["data_record_count"] for r in rows}
    assert got == expect
    assert all(r["data_file_count"] >= 1 for r in rows)
    assert all(r["total_data_file_size_in_bytes"] > 0 for r in rows)
    assert all(r["position_delete_file_count"] == 0 for r in rows)
    # rows sorted by partition tuple
    keys = [r["partition"]["n_regionkey"] for r in rows]
    assert keys == sorted(keys)


def test_partition_statistics_replaced_per_snapshot_and_carried_forward(spark, tmp_path):
    base = _partitioned_iceberg(spark, tmp_path)
    p1 = write_partition_statistics(spark, base)
    p2 = write_partition_statistics(spark, base)
    meta = read_table_metadata(base)
    assert len(meta["partition-statistics"]) == 1  # replaced, not stacked
    assert not os.path.exists(p1) and os.path.exists(p2)

    # a later commit carries the entry forward
    import pyarrow as pa
    import pyarrow.parquet as pq

    extra_dir = os.path.join(base, "n_regionkey=9")
    os.makedirs(extra_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {"n_nationkey": pa.array([99], pa.int32()), "n_name": ["XANADU"]}
        ),
        os.path.join(extra_dir, "f9.parquet"),
    )
    res = ConversionController().sync(
        ParquetConversionSource(
            spark,
            base,
            name="nation",
            partition_fields=[InternalPartitionField("n_regionkey")],
        ),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="nation")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    meta = read_table_metadata(base)
    assert len(meta["partition-statistics"]) == 1  # prior snapshot's entry kept
    # stats for the NEW snapshot cover the new partition
    write_partition_statistics(spark, base)
    rows = read_partition_statistics(base)
    assert any(r["partition"]["n_regionkey"] == 9 and r["data_record_count"] == 1 for r in rows)


def test_conformance_flags_missing_partition_stats_file(spark, tmp_path):
    from incubator_xtable_spark.model.conformance import check_iceberg_conformance

    base = _partitioned_iceberg(spark, tmp_path)
    p = write_partition_statistics(spark, base)
    report = check_iceberg_conformance(spark, base)
    assert not [i for i in report.issues if "PART_STATS" in i.code], report.issues
    os.unlink(p)
    report = check_iceberg_conformance(spark, base)
    assert [i for i in report.issues if i.code == "ICE_PART_STATS_FILE_MISSING"]


def test_retention_drops_expired_snapshot_partition_stats(spark, tmp_path):
    from incubator_xtable_spark.sync.retention import iceberg_expire_snapshots

    base = _partitioned_iceberg(spark, tmp_path)
    old_meta = read_table_metadata(base)
    old_sid = old_meta["current-snapshot-id"]
    p1 = write_partition_statistics(spark, base)

    import pyarrow as pa
    import pyarrow.parquet as pq

    extra_dir = os.path.join(base, "n_regionkey=8")
    os.makedirs(extra_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {"n_nationkey": pa.array([88], pa.int32()), "n_name": ["ATLANTIS"]}
        ),
        os.path.join(extra_dir, "f8.parquet"),
    )
    res = ConversionController().sync(
        ParquetConversionSource(
            spark,
            base,
            name="nation",
            partition_fields=[InternalPartitionField("n_regionkey")],
        ),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="nation")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    iceberg_expire_snapshots(base, keep_last=1)
    meta = read_table_metadata(base)
    assert all(s["snapshot-id"] != old_sid for s in meta.get("snapshots", []))
    assert meta.get("partition-statistics", []) == []
    assert not os.path.exists(p1)


def test_unpartitioned_table_refuses_loudly(spark, tmp_path):
    """Partition statistics on an UNPARTITIONED table: the unified
    partition type is a zero-field struct parquet cannot store — the
    public API must refuse with a clear message, not crash inside
    pyarrow with ArrowNotImplementedError."""
    base = str(tmp_path / "ice_flat")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").write.parquet(base)
    res = ConversionController().sync(
        ParquetConversionSource(spark, base, name="nation"),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="nation")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    with pytest.raises(ValueError, match="unpartitioned"):
        write_partition_statistics(spark, base)
    # and nothing was committed: metadata carries no partition-statistics
    meta = read_table_metadata(base)
    assert meta.get("partition-statistics", []) == []
