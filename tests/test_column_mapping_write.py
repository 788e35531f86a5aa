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


def test_read_renamed_physical_columns(spark, tmp_path):
    """External mode=name tables store PHYSICAL column names in parquet
    (e.g. after ALTER TABLE RENAME); reading by logical name would
    silently null the column — the reader must resolve physical names
    and present the logical schema."""
    import json
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from incubator_xtable_spark.sources.delta_source import read_delta_as_df

    base = str(tmp_path / "renamed")
    os.makedirs(os.path.join(base, "_delta_log"))
    # parquet stores the ORIGINAL (physical) name col-abc123
    pq.write_table(
        pa.table({"col-abc123": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(base, "part-0.parquet"),
    )
    schema_json = {
        "type": "struct",
        "fields": [
            {
                # logical name after a rename; physical stays col-abc123
                "name": "renamed_id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-abc123",
                },
            }
        ],
    }
    now = int(time.time() * 1000)
    with open(os.path.join(base, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "t",
                        "schemaString": json.dumps(schema_json),
                        "partitionColumns": [],
                        "configuration": {"delta.columnMapping.mode": "name"},
                        "format": {"provider": "parquet"},
                        "createdTime": now,
                    }
                }
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "part-0.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(base, "part-0.parquet")),
                        "modificationTime": now,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    df = read_delta_as_df(spark, base)
    assert df.columns == ["renamed_id"]
    assert sorted(r["renamed_id"] for r in df.collect()) == [1, 2, 3]

    # r6: mode=id is now a supported read path (field-id resolution,
    # test_mode_id_reads_resolve_by_parquet_field_id). Flipping THIS
    # table to mode=id must still fail loudly rather than silently null:
    # its files carry no parquet field ids, which violates the mode=id
    # writer contract.
    log = os.path.join(base, "_delta_log", f"{0:020d}.json")
    lines = []
    for line in open(log):
        a = json.loads(line)
        if "metaData" in a:
            a["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
        lines.append(json.dumps(a))
    with open(log, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="field Ids"):
        read_delta_as_df(spark, base).collect()


def test_renamed_column_converts_and_reads_via_name_mapping(spark, tmp_path):
    """Column-mapped Delta source with a renamed column (physical name
    differs) -> Iceberg: the name mapping written by the target lets the
    Iceberg reader resolve the stored column and present the logical
    schema — the full cross-format rename round trip."""
    import json
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
    from incubator_xtable_spark.sources.delta_source import (
        DeltaConversionSource,
        read_delta_as_df,
    )
    from incubator_xtable_spark.sources.iceberg_source import read_iceberg_as_df
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    base = str(tmp_path / "src")
    os.makedirs(os.path.join(base, "_delta_log"))
    pq.write_table(
        pa.table({"col-xyz": pa.array([7, 8], pa.int64())}),
        os.path.join(base, "p0.parquet"),
    )
    schema_json = {
        "type": "struct",
        "fields": [
            {
                "name": "logical_id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-xyz",
                },
            }
        ],
    }
    now = int(time.time() * 1000)
    with open(os.path.join(base, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "t",
                        "schemaString": json.dumps(schema_json),
                        "partitionColumns": [],
                        "configuration": {"delta.columnMapping.mode": "name"},
                        "createdTime": now,
                    }
                }
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "p0.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(base, "p0.parquet")),
                        "modificationTime": now,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    assert sorted(r[0] for r in read_delta_as_df(spark, base).collect()) == [7, 8]
    idir = str(tmp_path / "ice")
    res = ConversionController().sync(
        DeltaConversionSource(spark, base, name="t"),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, idir, table_name="t")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    ice = read_iceberg_as_df(spark, idir)
    assert ice.columns == ["logical_id"]
    assert sorted(r[0] for r in ice.collect()) == [7, 8]


def _cm_table(tmp_path, columns, rows, part_col=None):
    """Hand-built external mode=name Delta table. ``columns``:
    [(logical, physical, arrow_type)]; ``part_col``: (logical, physical,
    value) partition stored ONLY in partitionValues under its PHYSICAL
    key (the spec's keying)."""
    import json
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = str(tmp_path / "cm")
    os.makedirs(os.path.join(base, "_delta_log"))
    pq.write_table(
        pa.table({phys: pa.array(vals, typ) for (_, phys, typ), vals in zip(columns, rows)}),
        os.path.join(base, "p0.parquet"),
    )
    fields = [
        {
            "name": lg,
            "type": "long" if typ == pa.int64() else "string",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": i + 1,
                "delta.columnMapping.physicalName": phys,
            },
        }
        for i, (lg, phys, typ) in enumerate(columns)
    ]
    part_names = []
    pv = {}
    if part_col is not None:
        lg, phys, val = part_col
        fields.append(
            {
                "name": lg,
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": len(fields) + 1,
                    "delta.columnMapping.physicalName": phys,
                },
            }
        )
        part_names = [lg]
        pv = {phys: str(val)}
    now = int(time.time() * 1000)
    with open(os.path.join(base, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "t",
                        "schemaString": json.dumps({"type": "struct", "fields": fields}),
                        "partitionColumns": part_names,
                        "configuration": {"delta.columnMapping.mode": "name"},
                        "createdTime": now,
                    }
                }
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "p0.parquet",
                        "partitionValues": pv,
                        "size": os.path.getsize(os.path.join(base, "p0.parquet")),
                        "modificationTime": now,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    return base


def test_partition_values_keyed_by_physical_name(spark, tmp_path):
    """The spec keys add.partitionValues by PHYSICAL name; the reader
    must look partition columns up by it (logical lookup -> all-null)."""
    import pyarrow as pa

    from incubator_xtable_spark.sources.delta_source import read_delta_as_df, read_delta_cdf

    base = _cm_table(
        tmp_path,
        [("value_col", "col-v1", pa.int64())],
        [[10, 20]],
        part_col=("part_col", "col-p9", 7),
    )
    df = read_delta_as_df(spark, base)
    got = sorted((r["value_col"], r["part_col"]) for r in df.collect())
    assert got == [(10, 7), (20, 7)]
    cdf = read_delta_cdf(spark, base, 0)
    got = sorted((r["value_col"], r["part_col"], r["_change_type"]) for r in cdf.collect())
    assert got == [(10, 7, "insert"), (20, 7, "insert")]


def test_swap_renamed_columns_read_correctly(spark, tmp_path):
    """a<->b swap renames (each column's physical name is the OTHER's
    logical name): sequential renames would collide; the collision-safe
    two-phase rename must land values under the right logical names."""
    import pyarrow as pa

    from incubator_xtable_spark.sources.delta_source import read_delta_as_df

    base = _cm_table(
        tmp_path,
        [("a", "b", pa.int64()), ("b", "a", pa.int64())],
        [[1, 2], [100, 200]],
    )
    df = read_delta_as_df(spark, base)
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    # logical a stores in physical column "b" and vice versa
    assert rows == [(1, 100), (2, 200)]


def test_name_mapping_resolves_per_footer_schema(spark, tmp_path):
    """ADVICE r5: a file group mixing provenances — files written before
    a rename store the LOGICAL column name, files written after store
    the physical/storage name — must read each file with its own
    name-mapping resolution. First-footer-wins resolution silently
    nulls the mismatched files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from incubator_xtable_spark.sources.iceberg_source import (
        IcebergConversionSource,
        read_iceberg_as_df,
    )
    from incubator_xtable_spark.targets.iceberg_target import (
        metadata_dir,
        read_table_metadata,
    )

    from .test_iceberg_equality_deletes import (
        _append_delete_snapshot,
        _field_id,
        _make_table,
    )

    d = _make_table(spark, tmp_path, n=10, files=1)  # files store logical names
    src = IcebergConversionSource(spark, d)
    fid_id, fid_name = _field_id(src, "id"), _field_id(src, "name")

    # a second-provenance data file storing the physical name
    het = os.path.join(d, "hetero.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array([100, 101, 102], pa.int64()),
                "stored-name": pa.array(["h100", "h101", "h102"]),
            }
        ),
        het,
    )
    _append_delete_snapshot(spark, d, [], data_files=[(het, 3)], snapshot_id=777)

    # name mapping says logical `name` may be stored as `stored-name`
    meta = read_table_metadata(d)
    nm = [
        {"field-id": fid_id, "names": ["id"]},
        {"field-id": fid_name, "names": ["stored-name", "name"]},
    ]
    meta.setdefault("properties", {})["schema.name-mapping.default"] = json.dumps(nm)
    hint = int(open(os.path.join(metadata_dir(d), "version-hint.text")).read().strip())
    with open(os.path.join(metadata_dir(d), f"v{hint}.metadata.json"), "w") as fh:
        json.dump(meta, fh)

    got = sorted(
        (r["id"], r["name"]) for r in read_iceberg_as_df(spark, d).collect()
    )
    want = sorted(
        [(i, f"n{i}") for i in range(10)] + [(i, f"h{i}") for i in (100, 101, 102)]
    )
    assert got == want  # no nulls from either provenance


def _cm_id_table(tmp_path, file_names, ids, values, mode="id", part=None):
    """Hand-built external mode=id Delta table: ONE data file whose
    parquet column NAMES are ``file_names`` with field ids ``ids`` —
    names deliberately match neither logical nor physical names, so only
    field-id resolution can read it. Logical schema: value_col (long,
    id 1, physical col-v), label_col (string, id 2, physical col-l);
    optional (part_logical, id, value) identity partition."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = str(tmp_path / "cmid")
    os.makedirs(os.path.join(base, "_delta_log"))
    sch = pa.schema(
        [
            pa.field(file_names[0], pa.int64(), metadata={b"PARQUET:field_id": str(ids[0]).encode()}),
            pa.field(file_names[1], pa.string(), metadata={b"PARQUET:field_id": str(ids[1]).encode()}),
        ]
    )
    pq.write_table(
        pa.table(
            {file_names[0]: pa.array(values[0], pa.int64()), file_names[1]: values[1]},
            schema=sch,
        ),
        os.path.join(base, "p0.parquet"),
    )
    fields = [
        {
            "name": "value_col",
            "type": "long",
            "nullable": True,
            "metadata": {"delta.columnMapping.id": ids[0], "delta.columnMapping.physicalName": "col-v"},
        },
        {
            "name": "label_col",
            "type": "string",
            "nullable": True,
            "metadata": {"delta.columnMapping.id": ids[1], "delta.columnMapping.physicalName": "col-l"},
        },
    ]
    part_names, pv = [], {}
    if part is not None:
        lg, fid, val = part
        fields.append(
            {
                "name": lg,
                "type": "long",
                "nullable": True,
                "metadata": {"delta.columnMapping.id": fid, "delta.columnMapping.physicalName": f"col-p{fid}"},
            }
        )
        part_names = [lg]
        pv = {f"col-p{fid}": str(val)}
    now = int(time.time() * 1000)
    with open(os.path.join(base, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "t",
                        "schemaString": json.dumps({"type": "struct", "fields": fields}),
                        "partitionColumns": part_names,
                        "configuration": {"delta.columnMapping.mode": mode},
                        "createdTime": now,
                    }
                }
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "p0.parquet",
                        "partitionValues": pv,
                        "size": os.path.getsize(os.path.join(base, "p0.parquet")),
                        "modificationTime": now,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    return base


def test_mode_id_reads_resolve_by_parquet_field_id(spark, tmp_path):
    """r6: mode=id tables resolve columns by parquet FIELD ID — the data
    file's column names here match neither the logical nor the physical
    names, so only id resolution yields values (name matching would
    read all-null or fail)."""
    from incubator_xtable_spark.sources.delta_source import read_delta_as_df, read_delta_cdf

    base = _cm_id_table(
        tmp_path,
        file_names=("weird_x", "weird_y"),
        ids=(1, 2),
        values=([10, 20], ["a", "b"]),
        part=("level", 3, 7),
    )
    df = read_delta_as_df(spark, base)
    got = sorted((r["value_col"], r["label_col"], r["level"]) for r in df.collect())
    assert got == [(10, "a", 7), (20, "b", 7)]

    cdf = read_delta_cdf(spark, base, 0)
    got = sorted(
        (r["value_col"], r["label_col"], r["level"], r["_change_type"])
        for r in cdf.collect()
    )
    assert got == [(10, "a", 7, "insert"), (20, "b", 7, "insert")]


def test_mode_id_conversion_to_iceberg_keeps_ids(spark, tmp_path):
    """mode=id source converts to Iceberg with the Delta column-mapping
    ids as stable Iceberg field ids, and the Iceberg read resolves the
    oddly-named parquet via the same field ids Spark honors natively."""
    from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
    from incubator_xtable_spark.sources.delta_source import DeltaConversionSource
    from incubator_xtable_spark.sources.iceberg_source import (
        IcebergConversionSource,
        read_iceberg_as_df,
    )
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    base = _cm_id_table(
        tmp_path,
        file_names=("weird_x", "weird_y"),
        ids=(1, 2),
        values=([10, 20], ["a", "b"]),
    )
    src = DeltaConversionSource(spark, base)
    table = src.get_current_table()
    fids = {f.name: (f.metadata or {}).get("xtable.fieldId") for f in table.read_schema.fields}
    assert fids == {"value_col": 1, "label_col": 2}
    res = ConversionController().sync(
        src, {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="cmid")}
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, res[TableFormat.ICEBERG].error
    ice = IcebergConversionSource(spark, base).get_current_table()
    ice_fids = {f.name: (f.metadata or {}).get("xtable.fieldId") for f in ice.read_schema.fields}
    assert ice_fids == {"value_col": 1, "label_col": 2}
    # the file stores ids -> the iceberg read resolves BY FIELD ID (the
    # spec's primary rule), so the oddly-named parquet reads correctly
    got = sorted((r["value_col"], r["label_col"]) for r in read_iceberg_as_df(spark, base).collect())
    assert got == [(10, "a"), (20, "b")]


def test_mode_id_added_column_reads_null_from_old_files(spark, tmp_path):
    """Schema evolution under mode=id: a column added AFTER a file was
    written has no field id in that file and must read as null (the
    spec's ignoreMissing semantics) — while wholly id-less files still
    refuse loudly (test_read_renamed_physical_columns tail)."""
    import json as _json

    from incubator_xtable_spark.sources.delta_source import read_delta_as_df

    base = _cm_id_table(
        tmp_path,
        file_names=("weird_x", "weird_y"),
        ids=(1, 2),
        values=([10, 20], ["a", "b"]),
    )
    # evolve: add a third logical column with id 3 (absent from the file)
    log = os.path.join(base, "_delta_log", f"{0:020d}.json")
    lines = []
    for line in open(log):
        a = _json.loads(line)
        if "metaData" in a:
            sch = _json.loads(a["metaData"]["schemaString"])
            sch["fields"].append(
                {
                    "name": "added_col",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 3,
                        "delta.columnMapping.physicalName": "col-add",
                    },
                }
            )
            a["metaData"]["schemaString"] = _json.dumps(sch)
        lines.append(_json.dumps(a))
    with open(log, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    got = sorted(
        (r["value_col"], r["label_col"], r["added_col"])
        for r in read_delta_as_df(spark, base).collect()
    )
    assert got == [(10, "a", None), (20, "b", None)]
