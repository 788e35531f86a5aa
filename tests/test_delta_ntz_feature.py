"""Delta timestampNtz table feature (PROTOCOL.md): a schema carrying
TIMESTAMP_NTZ anywhere must declare the reader-writer feature — legacy
readers interpret the physical values as UTC-adjusted and silently shift
them. Gates: the target declares it (nested included), plain tables stay
on the legacy protocol, conformance red-proves the missing declaration."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from incubator_xtable_spark.model.conformance import check_delta_conformance
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget

from .conftest import SF_SMOKE


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


def test_ntz_schema_declares_feature(spark, tmp_path):
    base = str(tmp_path / "ntz")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "nested",
                T.StructType([T.StructField("ts_local", T.TimestampNTZType(), True)]),
            ),
        ]
    )
    _commit_schema(spark, base, schema)
    proto = _protocol(base)
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "timestampNtz" in proto["readerFeatures"]
    assert "timestampNtz" in proto["writerFeatures"]
    report = check_delta_conformance(spark, base)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_plain_schema_stays_legacy(spark, tmp_path):
    base = str(tmp_path / "plain")
    schema = spark.read.parquet(f"{SF_SMOKE}/region.parquet").schema
    _commit_schema(spark, base, schema)
    proto = _protocol(base)
    assert proto["minReaderVersion"] == 1
    assert "readerFeatures" not in proto


def test_conformance_red_on_missing_declaration(spark, tmp_path):
    base = str(tmp_path / "ntz_red")
    schema = T.StructType([T.StructField("ts_local", T.TimestampNTZType(), True)])
    _commit_schema(spark, base, schema)
    log = os.path.join(base, "_delta_log", f"{0:020d}.json")
    lines = []
    for line in open(log):
        a = json.loads(line)
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 2}
        lines.append(json.dumps(a) + "\n")
    open(log, "w").writelines(lines)
    assert "DELTA_NTZ_FEATURE_MISSING" in _codes(check_delta_conformance(spark, base))
