"""Ordinal-preserving scans under realistic file shapes: ORC files with
MANY stripes and AVRO OCFs spanning multiple emit batches / container
blocks. The row ordinals these scans emit are what Delta deletion
vectors key positions by — an off-by-one at any stripe/batch boundary
silently deletes the wrong rows, so the continuity is pinned here at
boundary-crossing sizes."""

import os

import pyarrow as pa
import pyarrow.orc as orc
import pytest
from pyspark.sql import types as T

FIELDS = [
    T.StructField("id", T.LongType()),
    T.StructField("label", T.StringType()),
]


def test_orc_multi_stripe_ordinals_continuous(spark, tmp_path):
    from incubator_xtable_spark.sources.orc_scan import read_orc_rows

    n = 50_000
    p = str(tmp_path / "multi.orc")
    orc.write_table(
        pa.table(
            {"id": pa.array(range(n), pa.int64()), "label": [f"r{v}" for v in range(n)]}
        ),
        p,
        stripe_size=64 * 1024,
    )
    assert orc.ORCFile(p).nstripes > 5, "fixture must span many stripes"
    df = read_orc_rows(spark, [p], FIELDS, path_col="fp", row_index_col="ri")
    rows = df.select("id", "ri").collect()
    assert len(rows) == n
    # the ordinal must equal the row's position in file order — ids were
    # written in order, so ri == id everywhere, across every stripe seam
    assert all(r["ri"] == r["id"] for r in rows)


def test_orc_all_requested_columns_absent_keeps_cardinality(spark, tmp_path):
    """When NONE of the requested columns exist in the file, rows must
    NOT silently vanish (that would desync DV ordinals): cardinality and
    ordinals come from a physical column read purely for row counts, and
    every requested column resolves to null."""
    from incubator_xtable_spark.sources.orc_scan import read_orc_rows

    n = 30_000
    p = str(tmp_path / "foreign.orc")
    orc.write_table(
        pa.table({"other": pa.array(range(n), pa.int64())}),
        p,
        stripe_size=64 * 1024,
    )
    assert orc.ORCFile(p).nstripes > 3
    df = read_orc_rows(spark, [p], FIELDS, path_col="fp", row_index_col="ri")
    rows = df.collect()
    assert len(rows) == n
    assert all(r["id"] is None and r["label"] is None for r in rows)
    assert sorted(r["ri"] for r in rows) == list(range(n))


def test_orc_two_files_independent_ordinals(spark, tmp_path):
    from incubator_xtable_spark.sources.orc_scan import read_orc_rows

    paths = []
    for i in range(2):
        p = str(tmp_path / f"f{i}.orc")
        orc.write_table(
            pa.table(
                {
                    "id": pa.array(range(i * 1000, i * 1000 + 100), pa.int64()),
                    "label": [f"r{v}" for v in range(100)],
                }
            ),
            p,
        )
        paths.append(p)
    df = read_orc_rows(spark, paths, FIELDS, path_col="fp", row_index_col="ri")
    per_file = {}
    for r in df.collect():
        per_file.setdefault(os.path.basename(r["fp"]), []).append(r["ri"])
    assert sorted(per_file) == ["f0.orc", "f1.orc"]
    for rids in per_file.values():
        assert sorted(rids) == list(range(100))  # each file restarts at 0


def test_orc_missing_column_resolves_null(spark, tmp_path):
    from incubator_xtable_spark.sources.orc_scan import read_orc_rows

    p = str(tmp_path / "narrow.orc")
    orc.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), p)
    rows = read_orc_rows(spark, [p], FIELDS).collect()
    assert [(r["id"], r["label"]) for r in rows] == [(1, None), (2, None)]


def test_avro_ordinals_across_emit_batches(spark, tmp_path, monkeypatch):
    """Force the OCF scan's pandas flush boundary far below the row count:
    ordinals must stay continuous across flushes (the start_index
    handoff)."""
    import incubator_xtable_spark.sources.avro_scan as avro_scan
    from incubator_xtable_spark.model.avro_codec import write_ocf
    from incubator_xtable_spark.sources.avro_scan import read_avro_rows

    monkeypatch.setattr(avro_scan, "_BATCH_ROWS", 37)
    n = 500
    p = str(tmp_path / "many.avro")
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "label", "type": ["null", "string"], "default": None},
        ],
    }
    write_ocf(p, schema, [{"id": i, "label": f"r{i}"} for i in range(n)], codec="deflate")
    df = read_avro_rows(spark, [p], FIELDS, path_col="fp", row_index_col="ri")
    rows = df.select("id", "ri").collect()
    assert len(rows) == n
    assert all(r["ri"] == r["id"] for r in rows)
