"""file_format honored end-to-end (VERDICT r6 #2): Delta provider/extension
mapping (ref delta/DeltaActionsConverter.java:91-97, model/storage/
FileFormat.java:26-30), ORC tags surviving a Delta→Iceberg conversion, and
every parquet-based row-level reader refusing loudly — naming the file —
instead of silently parsing a non-parquet file as parquet."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.model.file_formats import (
    format_expr,
    from_delta_provider,
    from_extension,
    from_iceberg_manifest,
    require_parquet,
    to_iceberg_manifest,
)
from incubator_xtable_spark.sources.delta_source import (
    DeltaConversionSource,
    read_delta_as_df,
)
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": False, "metadata": {}},
            {"name": "label", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def test_mapping_helpers():
    assert from_delta_provider("parquet") == "PARQUET"
    assert from_delta_provider(None) == "PARQUET"  # spec default
    assert from_delta_provider("orc") == "APACHE_ORC"
    with pytest.raises(ValueError, match="not recognized"):
        from_delta_provider("hfile")
    assert from_extension("/a/b/part-0.parquet") == "PARQUET"
    assert from_extension("/a/b/part-0.ORC") == "APACHE_ORC"
    assert from_extension("/a/b/part-0.avro") == "APACHE_AVRO"
    assert from_extension("/a/b/no-ext", default="APACHE_ORC") == "APACHE_ORC"
    assert from_iceberg_manifest("ORC") == "APACHE_ORC"
    assert from_iceberg_manifest(None) == "PARQUET"
    assert to_iceberg_manifest("APACHE_AVRO") == "AVRO"
    assert to_iceberg_manifest("PARQUET") == "PARQUET"
    with pytest.raises(ValueError):
        from_iceberg_manifest("PUFFIN")
    require_parquet([("/x/a.parquet", "PARQUET")], reader="t")  # no raise
    with pytest.raises(NotImplementedError, match=r"a\.orc.*APACHE_ORC"):
        require_parquet([("/x/a.orc", None)], reader="t")


def test_format_expr_is_jvm_side(spark):
    df = spark.createDataFrame(
        [("/t/a.parquet",), ("/t/b.orc",), ("/t/c.avro",), ("/t/d",)], ["p"]
    )
    got = {r["p"]: r["f"] for r in df.select("p", format_expr(df.p).alias("f")).collect()}
    assert got == {
        "/t/a.parquet": "PARQUET",
        "/t/b.orc": "APACHE_ORC",
        "/t/c.avro": "APACHE_AVRO",
        "/t/d": "PARQUET",
    }


def _log_write(base: str, version: int, actions: list[dict]) -> None:
    d = os.path.join(base, "_delta_log")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{version:020d}.json"), "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _stats(ids):
    return json.dumps(
        {
            "numRecords": len(ids),
            "minValues": {"id": min(ids)},
            "maxValues": {"id": max(ids)},
            "nullCount": {"id": 0, "label": 0},
        }
    )


@pytest.fixture()
def mixed_format_delta(tmp_path):
    """A Delta table (provider=parquet) whose log registers one real parquet
    file AND one .orc-named file (as a foreign writer could)."""
    base = str(tmp_path / "mixed")
    os.makedirs(base, exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array([0, 1, 2], pa.int64()), "label": ["a", "b", "c"]}),
        os.path.join(base, "part-0001.parquet"),
    )
    with open(os.path.join(base, "part-0002.orc"), "wb") as fh:
        fh.write(b"ORC\x00not-really-readable-here")
    meta = {
        "id": "fmt-test",
        "name": "fmt",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1,
    }
    add = lambda p, ids: {
        "add": {
            "path": p,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(base, p)),
            "modificationTime": 1,
            "dataChange": True,
            "stats": _stats(ids),
        }
    }
    _log_write(
        base,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            add("part-0001.parquet", [0, 1, 2]),
            add("part-0002.orc", [3, 4, 5]),
        ],
    )
    return base


def test_delta_inventory_tags_by_extension(spark, mixed_format_delta):
    src = DeltaConversionSource(spark, mixed_format_delta)
    snap = src.get_current_snapshot()
    fmts = {
        os.path.basename(r["physical_path"]): r["file_format"]
        for r in snap.files.collect()
    }
    assert fmts == {"part-0001.parquet": "PARQUET", "part-0002.orc": "APACHE_ORC"}


def test_orc_tag_survives_delta_to_iceberg(spark, mixed_format_delta, tmp_path):
    """VERDICT r6 done-criterion: an ORC-extension file is tagged APACHE_ORC
    through a Delta→Iceberg conversion, and row reads raise naming the path."""
    from incubator_xtable_spark.sources.iceberg_source import (
        IcebergConversionSource,
        read_iceberg_as_df,
    )

    source = DeltaConversionSource(spark, mixed_format_delta)
    target = IcebergConversionTarget(spark, mixed_format_delta)
    res = ConversionController().sync(source, {TableFormat.ICEBERG: target})
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, res[
        TableFormat.ICEBERG
    ].error

    # the Iceberg manifest carries ORC for the orc file (spec spelling)
    isrc = IcebergConversionSource(spark, mixed_format_delta)
    meta = isrc._meta()
    entries, _ = isrc._entries_by_content(meta, isrc._head_snapshot_id(meta))
    by_name = {
        os.path.basename(e["data_file"]["file_path"]): e["data_file"]["file_format"]
        for e in entries
    }
    assert by_name == {"part-0001.parquet": "PARQUET", "part-0002.orc": "ORC"}

    # and the converted inventory reads back with the engine tag
    fmts = {
        os.path.basename(r["physical_path"]): r["file_format"]
        for r in isrc.get_current_snapshot().files.collect()
    }
    assert fmts["part-0002.orc"] == "APACHE_ORC"

    # row-level reads refuse loudly on BOTH sides, naming the file
    with pytest.raises(NotImplementedError, match=r"part-0002\.orc"):
        read_delta_as_df(spark, mixed_format_delta)
    with pytest.raises(NotImplementedError, match=r"part-0002\.orc"):
        read_iceberg_as_df(spark, mixed_format_delta)


def test_provider_orc_defaults_extensionless_files(spark, tmp_path):
    """provider=orc: extension-less files default to APACHE_ORC (the
    reference's provider rule), read refuses loudly."""
    base = str(tmp_path / "orc_table")
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "part-0001"), "wb") as fh:
        fh.write(b"ORC\x00")
    meta = {
        "id": "orc-test",
        "name": "orc",
        "format": {"provider": "orc", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1,
    }
    _log_write(
        base,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {
                "add": {
                    "path": "part-0001",
                    "partitionValues": {},
                    "size": 4,
                    "modificationTime": 1,
                    "dataChange": True,
                    "stats": _stats([0]),
                }
            },
        ],
    )
    src = DeltaConversionSource(spark, base)
    rows = src.get_current_snapshot().files.collect()
    assert [r["file_format"] for r in rows] == ["APACHE_ORC"]
    with pytest.raises(NotImplementedError, match="part-0001"):
        read_delta_as_df(spark, base)


def test_unknown_provider_refuses(spark, tmp_path):
    base = str(tmp_path / "weird")
    os.makedirs(base, exist_ok=True)
    meta = {
        "id": "weird",
        "name": "weird",
        "format": {"provider": "hfile", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1,
    }
    _log_write(
        base,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {
                "add": {
                    "path": "p1",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                    "stats": _stats([0]),
                }
            },
        ],
    )
    src = DeltaConversionSource(spark, base)
    with pytest.raises(ValueError, match="hfile"):
        src.get_current_snapshot().files.collect()


def test_parquet_only_targets_refuse_orc(spark, mixed_format_delta, tmp_path):
    """Delta / Hudi / Paimon targets cannot represent a non-parquet data
    file; syncing the mixed table into each must FAIL with the format named
    (per-target isolation turns the raise into a failed SyncResult)."""
    from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget
    from incubator_xtable_spark.targets.hudi_target import HudiConversionTarget
    from incubator_xtable_spark.targets.paimon_target import PaimonConversionTarget

    for fmt, target in [
        (TableFormat.DELTA, DeltaConversionTarget(spark, str(tmp_path / "d"))),
        (TableFormat.HUDI, HudiConversionTarget(spark, str(tmp_path / "h"))),
        (TableFormat.PAIMON, PaimonConversionTarget(spark, str(tmp_path / "p"))),
    ]:
        source = DeltaConversionSource(spark, mixed_format_delta)
        res = ConversionController().sync(source, {fmt: target})[fmt]
        assert res.status != SyncStatusCode.SUCCESS
        assert "APACHE_ORC" in str(res.error), (fmt, res.error)
