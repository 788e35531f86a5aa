"""Delta column-mapping WRITE mode: id-carrying sources (Iceberg, Hudi
id-tracking) persist their field ids into the Delta metaData as
delta.columnMapping.{id,physicalName} with mode=name, protocol 2/5 —
the write-side inverse of delta_source._lift_column_mapping."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import types as T

from incubator_xtable_spark.model import schema_meta
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


def _latest_meta(base):
    import glob

    files = sorted(glob.glob(os.path.join(base, "_delta_log", "*.json")))
    meta = proto = None
    for f in files:
        for line in open(f):
            a = json.loads(line)
            meta = a.get("metaData", meta)
            proto = a.get("protocol", proto)
    return meta, proto


@pytest.fixture()
def iceberg_table(spark, tmp_path):
    """nation parquet -> Iceberg (assigns field ids 1..n)."""
    d = str(tmp_path / "ice_nation")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").write.parquet(d)
    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="nation"),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, d, table_name="nation")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    return d


def test_iceberg_to_delta_persists_field_ids(spark, iceberg_table):
    d = iceberg_table
    src = IcebergConversionSource(spark, d, name="nation")
    ids_in = {
        f.name: f.metadata.get(schema_meta.FIELD_ID)
        for f in src.get_current_table().read_schema.fields
    }
    assert all(v is not None for v in ids_in.values())

    res = ConversionController().sync(
        src, {TableFormat.DELTA: DeltaConversionTarget(spark, d)}
    )
    assert res[TableFormat.DELTA].status == SyncStatusCode.SUCCESS, res

    meta, proto = _latest_meta(d)
    cfg = meta["configuration"]
    assert cfg["delta.columnMapping.mode"] == "name"
    assert int(cfg["delta.columnMapping.maxColumnId"]) == max(ids_in.values())
    assert proto["minReaderVersion"] >= 2 and proto["minWriterVersion"] >= 5
    for f in json.loads(meta["schemaString"])["fields"]:
        md = f["metadata"]
        assert md["delta.columnMapping.id"] == ids_in[f["name"]]
        assert md["delta.columnMapping.physicalName"] == f["name"]

    # round-trip: the Delta source lifts the SAME canonical ids back
    dsrc = DeltaConversionSource(spark, d)
    ids_back = {
        f.name: f.metadata.get(schema_meta.FIELD_ID)
        for f in dsrc.get_current_table().read_schema.fields
    }
    assert ids_back == ids_in

    # and rows stay identical through every read path
    a = sorted(tuple(r) for r in read_iceberg_as_df(spark, d).collect())
    b = sorted(tuple(r) for r in read_delta_as_df(spark, d).collect())
    assert a == b and len(a) > 0


def test_parquet_source_writes_no_mapping(spark, tmp_path):
    d = str(tmp_path / "plain")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").write.parquet(d)
    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="region"),
        {TableFormat.DELTA: DeltaConversionTarget(spark, d)},
    )
    assert res[TableFormat.DELTA].status == SyncStatusCode.SUCCESS
    meta, proto = _latest_meta(d)
    assert "delta.columnMapping.mode" not in meta["configuration"]
    assert proto["minWriterVersion"] < 5


def test_partial_ids_complete_the_mapping(spark, tmp_path):
    """Delta requires every field mapped: fields without a source id get
    the next free ids after the max source id."""
    target = DeltaConversionTarget(spark, str(tmp_path / "t"))
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), True, {schema_meta.FIELD_ID: 7}),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.DoubleType(), True, {schema_meta.FIELD_ID: 3}),
        ]
    )
    mapped, max_id = target._with_column_mapping(schema)
    ids = {f.name: f.metadata["delta.columnMapping.id"] for f in mapped.fields}
    assert ids == {"a": 7, "b": 8, "c": 3}
    assert max_id == 8
