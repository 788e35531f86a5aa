"""Cross-format row-lineage preservation: stable row ids SURVIVE format
conversion through the row_lineage channel — Delta Row Tracking
baseRowId -> Iceberg v3 first_row_id and back. Beyond the reference
(which has no row-id concept); the substrate that lets CDC / merge /
audit pipelines keep row identity when a table changes formats.

Scale note: the channel is metadata-sized (one long per ADDED file per
commit) and the target-side hand-out is O(adds) driver work inside the
commit build — no extra Spark jobs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from incubator_xtable_spark.model.conformance import check_iceberg_conformance
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.delta_source import (
    DeltaConversionSource,
    read_delta_as_df,
)
from incubator_xtable_spark.sources.iceberg_source import (
    IcebergConversionSource,
    read_iceberg_as_df,
)
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget
from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

from .conftest import SF_SMOKE


@pytest.fixture()
def rt_delta(spark, tmp_path):
    """A real Row-Tracking Delta table built by the engine itself."""
    d = str(tmp_path / "rt_interop")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").repartition(2).write.parquet(d)
    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="region"),
        {TableFormat.DELTA: DeltaConversionTarget(spark, d, row_tracking=True)},
    )
    assert res[TableFormat.DELTA].status == SyncStatusCode.SUCCESS
    return d


def _row_ids_by_key(df):
    return {r["r_regionkey"]: r["_row_id"] for r in df.select("r_regionkey", "_row_id").collect()}


def test_delta_rt_to_iceberg_v3_preserves_row_ids(spark, rt_delta):
    res = ConversionController().sync(
        DeltaConversionSource(spark, rt_delta, expose_row_lineage=True),
        {
            TableFormat.ICEBERG: IcebergConversionTarget(
                spark, rt_delta, table_name="rt", format_version=3
            )
        },
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, res[
        TableFormat.ICEBERG
    ].error
    delta_ids = _row_ids_by_key(read_delta_as_df(spark, rt_delta, with_row_ids=True))
    ice_ids = _row_ids_by_key(read_iceberg_as_df(spark, rt_delta, with_row_ids=True))
    assert delta_ids == ice_ids and len(delta_ids) == 5
    report = check_iceberg_conformance(spark, rt_delta)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_incremental_append_keeps_lineage_parity(spark, rt_delta):
    src = DeltaConversionSource(spark, rt_delta, expose_row_lineage=True)
    tgt = IcebergConversionTarget(spark, rt_delta, table_name="rt", format_version=3)
    ctrl = ConversionController()
    ctrl.sync(src, {TableFormat.ICEBERG: tgt})
    before = _row_ids_by_key(read_iceberg_as_df(spark, rt_delta, with_row_ids=True))

    # append through the engine's own RT Delta target (new baseRowIds)
    (
        spark.read.parquet(f"{SF_SMOKE}/region.parquet")
        .withColumn("r_regionkey", F.col("r_regionkey") + 100)
        .coalesce(1)
        .write.mode("append")
        .parquet(rt_delta)
    )
    res = ctrl.sync(
        ParquetConversionSource(spark, rt_delta, name="region"),
        {TableFormat.DELTA: DeltaConversionTarget(spark, rt_delta, row_tracking=True)},
    )
    assert res[TableFormat.DELTA].status == SyncStatusCode.SUCCESS
    res = ctrl.sync(src, {TableFormat.ICEBERG: tgt})
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, res[
        TableFormat.ICEBERG
    ].error

    delta_ids = _row_ids_by_key(read_delta_as_df(spark, rt_delta, with_row_ids=True))
    ice_ids = _row_ids_by_key(read_iceberg_as_df(spark, rt_delta, with_row_ids=True))
    assert delta_ids == ice_ids and len(delta_ids) == 10
    for k, rid in before.items():
        assert ice_ids[k] == rid, "carried rows must keep their ids"
    report = check_iceberg_conformance(spark, rt_delta)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_iceberg_v3_to_fresh_delta_rt(spark, rt_delta, tmp_path):
    """Round trip the other way: the v3 table feeds a FRESH Delta table
    whose Row Tracking takes the Iceberg first_row_ids verbatim."""
    ConversionController().sync(
        DeltaConversionSource(spark, rt_delta, expose_row_lineage=True),
        {
            TableFormat.ICEBERG: IcebergConversionTarget(
                spark, rt_delta, table_name="rt", format_version=3
            )
        },
    )
    out = str(tmp_path / "delta_from_ice")
    res = ConversionController().sync(
        IcebergConversionSource(spark, rt_delta, name="rt", expose_row_lineage=True),
        {TableFormat.DELTA: DeltaConversionTarget(spark, out, row_tracking=True)},
    )
    assert res[TableFormat.DELTA].status == SyncStatusCode.SUCCESS, res[
        TableFormat.DELTA
    ].error
    ice_ids = _row_ids_by_key(read_iceberg_as_df(spark, rt_delta, with_row_ids=True))
    out_ids = _row_ids_by_key(read_delta_as_df(spark, out, with_row_ids=True))
    assert out_ids == ice_ids


def test_refusals(spark, rt_delta, tmp_path):
    # channel into a v2 Iceberg target
    res = ConversionController().sync(
        DeltaConversionSource(spark, rt_delta, expose_row_lineage=True),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, rt_delta, table_name="rt")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.ERROR
    assert "format_version=3" in res[TableFormat.ICEBERG].error.error_message

    # channel into a Delta target without row tracking
    ConversionController().sync(
        DeltaConversionSource(spark, rt_delta, expose_row_lineage=True),
        {
            TableFormat.ICEBERG: IcebergConversionTarget(
                spark, rt_delta, table_name="rt", format_version=3
            )
        },
    )
    out = str(tmp_path / "plain_delta")
    res = ConversionController().sync(
        IcebergConversionSource(spark, rt_delta, name="rt", expose_row_lineage=True),
        {TableFormat.DELTA: DeltaConversionTarget(spark, out)},
    )
    assert res[TableFormat.DELTA].status == SyncStatusCode.ERROR
    assert "row_tracking=True" in res[TableFormat.DELTA].error.error_message

    # lineage from a NON-row-tracking delta table
    plain = str(tmp_path / "plain_src")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.parquet(plain)
    ConversionController().sync(
        ParquetConversionSource(spark, plain, name="region"),
        {TableFormat.DELTA: DeltaConversionTarget(spark, plain)},
    )
    src = DeltaConversionSource(spark, plain, expose_row_lineage=True)
    with pytest.raises(ValueError, match="baseRowId"):
        src.get_current_snapshot()
