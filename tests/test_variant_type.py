"""VARIANT type support (Spark 4 VariantType): the Delta target
declares the `variantType` reader-writer feature (PROTOCOL.md — legacy
readers cannot decode the (metadata, value) binary pair), the Iceberg
v3 target maps it to the spec `variant` type (and v2 refuses loudly),
and the schema round-trips across a Delta -> Iceberg conversion.
Red-proven conformance: DELTA_VARIANT_FEATURE_MISSING."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import types as T

from incubator_xtable_spark.model.conformance import check_delta_conformance
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.delta_source import DeltaConversionSource
from incubator_xtable_spark.sources.iceberg_source import IcebergConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget
from incubator_xtable_spark.targets.iceberg_target import (
    IcebergConversionTarget,
    iceberg_fields_to_schema,
    schema_to_iceberg_fields,
)

VARIANT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("props", T.VariantType(), True),
        T.StructField(
            "nested", T.StructType([T.StructField("v2", T.VariantType(), True)])
        ),
    ]
)


def _codes(report):
    return {i.code for i in report.issues}


def _commit_schema(spark, base, schema):
    target = DeltaConversionTarget(spark, base)
    target.begin_sync(None)
    target.sync_schema(schema)
    target.sync_partition_spec([])
    return target.complete_sync(), target


def _protocol(base):
    with open(os.path.join(base, "_delta_log", f"{0:020d}.json")) as fh:
        for line in fh:
            a = json.loads(line)
            if "protocol" in a:
                return a["protocol"]
    return None


def test_variant_schema_declares_feature(spark, tmp_path):
    base = str(tmp_path / "var")
    _commit_schema(spark, base, VARIANT_SCHEMA)
    proto = _protocol(base)
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    report = check_delta_conformance(spark, base)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_conformance_red_on_missing_declaration(spark, tmp_path):
    base = str(tmp_path / "var_red")
    _commit_schema(spark, base, VARIANT_SCHEMA)
    log = os.path.join(base, "_delta_log", f"{0:020d}.json")
    lines = []
    for line in open(log):
        a = json.loads(line)
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 2}
        lines.append(json.dumps(a) + "\n")
    open(log, "w").writelines(lines)
    assert "DELTA_VARIANT_FEATURE_MISSING" in _codes(check_delta_conformance(spark, base))


def test_iceberg_fields_round_trip_variant(spark):
    fields = schema_to_iceberg_fields(VARIANT_SCHEMA)
    assert any(f["type"] == "variant" for f in fields)
    back = iceberg_fields_to_schema(fields)
    assert isinstance(back["props"].dataType, T.VariantType)
    assert isinstance(back["nested"].dataType["v2"].dataType, T.VariantType)


def test_iceberg_v2_refuses_variant(spark, tmp_path):
    tgt = IcebergConversionTarget(spark, str(tmp_path / "v2t"), table_name="t")
    tgt.begin_sync(None)
    with pytest.raises(ValueError, match="format_version=3"):
        tgt.sync_schema(VARIANT_SCHEMA)


def test_variant_survives_delta_to_iceberg_v3(spark, tmp_path):
    base = str(tmp_path / "var_conv")
    _commit_schema(spark, base, VARIANT_SCHEMA)
    res = ConversionController().sync(
        DeltaConversionSource(spark, base),
        {
            TableFormat.ICEBERG: IcebergConversionTarget(
                spark, base, table_name="var", format_version=3
            )
        },
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, res[
        TableFormat.ICEBERG
    ].error
    table = IcebergConversionSource(spark, base).get_current_table()
    assert isinstance(table.read_schema["props"].dataType, T.VariantType)
    assert isinstance(table.read_schema["nested"].dataType["v2"].dataType, T.VariantType)
