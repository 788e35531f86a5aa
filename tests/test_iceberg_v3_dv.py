"""Iceberg v3 deletion vectors: Puffin container + deletion-vector-v1
blobs on the row-delete channel (opt-in via
IcebergConversionTarget(format_version=3)).

The v3 DV blob frame is the Delta deletion-vector frame (BE length,
magic D1 33 39 64, 64-bit portable roaring, BE CRC), so the existing
bitmap codec is shared — these tests prove the container, the manifest
reference fields (referenced_data_file/content_offset/
content_size_in_bytes), and full conversion parity in both directions.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from incubator_xtable_spark.model.conformance import check_iceberg_conformance
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.model.puffin import (
    DELETION_VECTOR_V1,
    dv_blob_bytes,
    dv_blob_positions,
    read_dv_positions_from_puffin,
    read_puffin_footer,
    write_puffin,
)
from incubator_xtable_spark.sources.delta_source import (
    DeltaConversionSource,
    read_delta_as_df,
)
from incubator_xtable_spark.sources.iceberg_source import (
    IcebergConversionSource,
    read_iceberg_as_df,
)
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget
from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

from .test_row_delete_conversion import _base_table, _dv_commit


def test_puffin_roundtrip(tmp_path):
    p = str(tmp_path / "t.puffin")
    metas = write_puffin(
        p,
        [
            (DELETION_VECTOR_V1, dv_blob_bytes([1, 5, 99]), {"referenced-data-file": "a.parquet", "cardinality": 3}),
            (DELETION_VECTOR_V1, dv_blob_bytes([0]), {"referenced-data-file": "b.parquet", "cardinality": 1}),
        ],
        snapshot_id=7,
        sequence_number=3,
    )
    footer = read_puffin_footer(p)
    assert [b["type"] for b in footer["blobs"]] == [DELETION_VECTOR_V1] * 2
    assert footer["blobs"][0]["properties"]["referenced-data-file"] == "a.parquet"
    assert footer["blobs"][0]["snapshot-id"] == 7
    a = read_dv_positions_from_puffin(p, metas[0]["offset"], metas[0]["length"])
    b = read_dv_positions_from_puffin(p, metas[1]["offset"], metas[1]["length"])
    assert list(a) == [1, 5, 99] and list(b) == [0]

    # CRC detection
    blob = bytearray(open(p, "rb").read())
    blob[metas[0]["offset"] + 9] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError):
        read_dv_positions_from_puffin(p, metas[0]["offset"], metas[0]["length"])


def test_bad_magic_rejected(tmp_path):
    p = str(tmp_path / "bad.puffin")
    open(p, "wb").write(b"NOPE" + b"\x00" * 40)
    with pytest.raises(ValueError):
        read_puffin_footer(p)


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_delta_dv_to_iceberg_v3(spark, tmp_path):
    """Delta DVs -> Iceberg v3: deletes land as puffin DV blobs (no
    position-delete parquet in the manifests), read parity holds, and
    conformance stays green."""
    base, s1, _ = _base_table(tmp_path)
    _dv_commit(base, 1, s1, [2, 3, 7])
    res = ConversionController().sync(
        DeltaConversionSource(spark, base, expose_row_deletes=True),
        {
            TableFormat.ICEBERG: IcebergConversionTarget(
                spark, base, table_name="v3t", format_version=3
            )
        },
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, res[TableFormat.ICEBERG].error

    src = IcebergConversionSource(spark, base)
    meta = src._meta()
    assert meta["format-version"] == 3
    deletes = src._live_delete_entries(meta, meta["current-snapshot-id"])
    assert deletes, "expected DV delete entries"
    for e in deletes:
        df = e["data_file"]
        assert df["file_format"] == "PUFFIN"
        assert df["referenced_data_file"].endswith("part-0001.parquet")
        assert df["content_offset"] is not None and df["content_size_in_bytes"] > 0
    puffins = glob.glob(os.path.join(base, "metadata", "*.puffin"))
    assert puffins
    footer = read_puffin_footer(puffins[0])
    assert footer["blobs"][0]["type"] == DELETION_VECTOR_V1

    expected = sorted(i for i in range(20) if i not in (2, 3, 7))
    assert _ids(read_iceberg_as_df(spark, base)) == expected
    assert _ids(read_delta_as_df(spark, base)) == expected

    report = check_iceberg_conformance(spark, base)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_iceberg_v3_dv_to_delta_roundtrip(spark, tmp_path):
    """The v3 table reads back through the source's row-delete channel
    and converts its DVs into Delta deletion vectors."""
    base, s1, _ = _base_table(tmp_path)
    _dv_commit(base, 1, s1, [2, 3, 7])
    ConversionController().sync(
        DeltaConversionSource(spark, base, expose_row_deletes=True),
        {
            TableFormat.ICEBERG: IcebergConversionTarget(
                spark, base, table_name="v3t", format_version=3
            )
        },
    )
    out = str(tmp_path / "delta_out")
    os.makedirs(out)
    # fresh delta table elsewhere, fed by the v3 iceberg table
    res = ConversionController().sync(
        IcebergConversionSource(spark, base, name="v3t", expose_row_deletes=True),
        {TableFormat.DELTA: DeltaConversionTarget(spark, out)},
    )
    assert res[TableFormat.DELTA].status == SyncStatusCode.SUCCESS, res[TableFormat.DELTA].error
    expected = sorted(i for i in range(20) if i not in (2, 3, 7))
    assert _ids(read_delta_as_df(spark, out)) == expected
    # and the new delta table carries a REAL deletion vector
    dv_seen = False
    for f in glob.glob(os.path.join(out, "_delta_log", "*.json")):
        for line in open(f):
            a = json.loads(line)
            if "add" in a and a["add"].get("deletionVector"):
                dv_seen = True
    assert dv_seen


def test_v3_dv_widening_restates(spark, tmp_path):
    base, s1, _ = _base_table(tmp_path)
    _dv_commit(base, 1, s1, [2, 3, 7])
    tgt = IcebergConversionTarget(spark, base, table_name="v3t", format_version=3)
    ctrl = ConversionController()
    ctrl.sync(DeltaConversionSource(spark, base, expose_row_deletes=True), {TableFormat.ICEBERG: tgt})
    _dv_commit(base, 2, s1, [1, 2, 3, 7, 9])
    res = ctrl.sync(
        DeltaConversionSource(spark, base, expose_row_deletes=True), {TableFormat.ICEBERG: tgt}
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, res[TableFormat.ICEBERG].error
    expected = sorted(i for i in range(20) if i not in (1, 2, 3, 7, 9))
    assert _ids(read_iceberg_as_df(spark, base)) == expected
