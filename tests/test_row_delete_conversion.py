"""Row-delete passthrough: Delta deletion vectors converted to Iceberg
v2 position-delete files — NO data-file rewrite (the purged-shadow
fallback stays for targets that cannot express row-level deletes).

Scenario parity: ref delta/ITDeltaDeleteVectorConvert.java (DV tables
convert row-accurately) + iceberg spec v2 delete application rule
(delete_seq >= data_seq)."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.delta_dv import write_dv_file
from incubator_xtable_spark.sources.delta_source import (
    DeltaConversionSource,
    read_delta_as_df,
)
from incubator_xtable_spark.sources.iceberg_source import (
    IcebergConversionSource,
    read_iceberg_as_df,
)
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "label", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_data_file(path: str, ids: list[int]) -> dict:
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "label": [f"row-{i}" for i in ids]}),
        path,
    )
    return {
        "numRecords": len(ids),
        "minValues": {"id": min(ids), "label": f"row-{min(ids)}"},
        "maxValues": {"id": max(ids), "label": f"row-{max(ids)}"},
        "nullCount": {"id": 0, "label": 0},
    }


def _log_write(base: str, version: int, actions: list[dict]) -> None:
    d = os.path.join(base, "_delta_log")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{version:020d}.json"), "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _add(base, p, s, dv=None):
    return {
        "add": {
            "path": p,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(base, p)),
            "modificationTime": 1,
            "dataChange": True,
            "stats": json.dumps(s),
            **({"deletionVector": dv} if dv else {}),
        }
    }


def _base_table(tmp_path) -> tuple[str, dict, dict]:
    base = str(tmp_path / "dv_rowdel")
    os.makedirs(base, exist_ok=True)
    s1 = _write_data_file(os.path.join(base, "part-0001.parquet"), list(range(10)))
    s2 = _write_data_file(os.path.join(base, "part-0002.parquet"), list(range(10, 20)))
    meta = {
        "id": "dv-rowdel",
        "name": "dvtab",
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1,
    }
    _log_write(
        base,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
            {"metaData": meta},
            _add(base, "part-0001.parquet", s1),
            _add(base, "part-0002.parquet", s2),
        ],
    )
    return base, s1, s2


def _dv_commit(base: str, version: int, s1: dict, positions: list[int]) -> None:
    desc = write_dv_file(base, positions)
    _log_write(
        base,
        version,
        [
            {"remove": {"path": "part-0001.parquet", "deletionTimestamp": 2, "dataChange": True}},
            _add(base, "part-0001.parquet", s1, dv=desc),
        ],
    )


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_expose_snapshot_keeps_original_paths(spark, tmp_path):
    base, s1, _ = _base_table(tmp_path)
    _dv_commit(base, 1, s1, [2, 3, 7])
    src = DeltaConversionSource(spark, base, expose_row_deletes=True)
    snap = src.get_current_snapshot()
    rows = {os.path.basename(r["physical_path"]): r for r in snap.files.collect()}
    # original paths, physical record counts — no shadow rewrite
    assert set(rows) == {"part-0001.parquet", "part-0002.parquet"}
    assert rows["part-0001.parquet"]["record_count"] == 10
    assert not glob.glob(os.path.join(base, "*.purged-*"))
    # the delete set rides on row_deletes as an Iceberg-shaped parquet
    rd = snap.row_deletes.collect()
    assert len(rd) == 1
    assert os.path.basename(rd[0]["data_file_path"]) == "part-0001.parquet"
    assert rd[0]["delete_count"] == 3
    pos = pq.read_table(rd[0]["positions_path"]).to_pydict()
    assert pos["pos"] == [2, 3, 7]
    assert all(p == rd[0]["data_file_path"] for p in pos["file_path"])


def test_full_sync_writes_position_deletes(spark, tmp_path):
    base, s1, _ = _base_table(tmp_path)
    _dv_commit(base, 1, s1, [2, 3, 7])
    src = DeltaConversionSource(spark, base, expose_row_deletes=True)
    res = ConversionController().sync(
        src, {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="dvtab")}
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, res
    expected = [i for i in range(20) if i not in (2, 3, 7)]
    assert _ids(read_iceberg_as_df(spark, base)) == expected
    assert _ids(read_delta_as_df(spark, base)) == expected
    # manifest-level: data entries keep ORIGINAL paths; one content=1 entry
    isrc = IcebergConversionSource(spark, base)
    data, deletes = isrc._entries_by_content(isrc._meta(), isrc._meta()["current-snapshot-id"])
    data_paths = {os.path.basename(e["data_file"]["file_path"]) for e in data}
    assert data_paths == {"part-0001.parquet", "part-0002.parquet"}
    assert len(deletes) == 1
    de = deletes[0]["data_file"]
    assert ".deletes-" in de["file_path"]
    assert de["record_count"] == 3
    assert not glob.glob(os.path.join(base, "*.purged-*"))


def test_incremental_dv_supersedes_delete_file(spark, tmp_path):
    base, s1, _ = _base_table(tmp_path)
    src = DeltaConversionSource(spark, base, expose_row_deletes=True)
    target = IcebergConversionTarget(spark, base, table_name="dvtab")

    # full sync at v0 (no deletes yet)
    res = ConversionController().sync(src, {TableFormat.ICEBERG: target})
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    assert _ids(read_iceberg_as_df(spark, base)) == list(range(20))

    # v1: DELETE {2,3,7} via DV -> incremental sync carries a delete file
    _dv_commit(base, 1, s1, [2, 3, 7])
    res = ConversionController().sync(src, {TableFormat.ICEBERG: target})
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    assert res[TableFormat.ICEBERG].mode.value == "INCREMENTAL"
    expected1 = [i for i in range(20) if i not in (2, 3, 7)]
    assert _ids(read_iceberg_as_df(spark, base)) == expected1

    # v2: the DV widens to {2,3,7,5}; the new delete file SUPERSEDES the
    # old one for the same data file (protocol stem rule)
    _dv_commit(base, 2, s1, [2, 3, 5, 7])
    res = ConversionController().sync(src, {TableFormat.ICEBERG: target})
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    expected2 = [i for i in range(20) if i not in (2, 3, 5, 7)]
    assert _ids(read_iceberg_as_df(spark, base)) == expected2
    isrc = IcebergConversionSource(spark, base)
    data, deletes = isrc._entries_by_content(isrc._meta(), isrc._meta()["current-snapshot-id"])
    assert len(deletes) == 1  # superseded, not accumulated
    assert deletes[0]["data_file"]["record_count"] == 4
    # sequence rule: the delete's sequence is >= every data file's
    data_seqs = [int(e.get("sequence_number") or 0) for e in data]
    assert int(deletes[0].get("sequence_number") or 0) >= max(data_seqs)
    # the data files were never rewritten
    assert {os.path.basename(e["data_file"]["file_path"]) for e in data} == {
        "part-0001.parquet",
        "part-0002.parquet",
    }
    assert not glob.glob(os.path.join(base, "*.purged-*"))


def test_default_mode_still_purges_shadows(spark, tmp_path):
    """Without expose_row_deletes the legacy posture is unchanged: DV'd
    files convert to purged shadows (targets without delete support)."""
    base, s1, _ = _base_table(tmp_path)
    _dv_commit(base, 1, s1, [2, 3, 7])
    src = DeltaConversionSource(spark, base)
    snap = src.get_current_snapshot()
    assert snap.row_deletes is None
    names = {os.path.basename(r["physical_path"]) for r in snap.files.collect()}
    assert any(".purged-" in n for n in names)


def test_run_sync_auto_enables_exposure(spark, tmp_path):
    """run_once flips expose_row_deletes on iff every target supports
    row deletes."""
    from incubator_xtable_spark.run_sync import build_source, build_target

    base, s1, _ = _base_table(tmp_path)
    _dv_commit(base, 1, s1, [2, 3, 7])
    source = build_source(spark, "DELTA", {"tableBasePath": base})
    t_ice = build_target(spark, "ICEBERG", {"tableBasePath": base, "tableName": "t"})
    t_hudi = build_target(spark, "HUDI", {"tableBasePath": base, "tableName": "t"})
    assert getattr(t_ice, "supports_row_deletes", False) is True
    assert getattr(t_hudi, "supports_row_deletes", False) is False
    assert source.expose_row_deletes is False  # default stays off
