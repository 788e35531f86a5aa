"""Hudi MOR full log-merge reads: the from-spec log block codec
(sources/hudi_log.py) + read_hudi_as_df(mode="snapshot").

Extends the r3 read-optimized MOR scope (the reference converts
getLatestBaseFiles only; so does our conversion) with the snapshot view
a real MOR reader serves: base rows overlaid with the un-compacted log
tail — upserts, deletes, rollbacks, parquet and avro data blocks.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from incubator_xtable_spark.sources.hudi_log import (
    AVRO_DATA_BLOCK,
    PARQUET_DATA_BLOCK,
    block_records,
    merged_log_records,
    read_log_blocks,
)
from incubator_xtable_spark.sources.hudi_source import read_hudi_as_df

from .hudi_logtable import (
    avro_data_block,
    delete_block,
    parquet_data_block,
    rollback_block,
)

AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"], "default": None},
        ],
    }
)

SPARK_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": False, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_base(base: str, name: str, ids: list[int]) -> int:
    path = os.path.join(base, name)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "v": [f"x{i}" for i in ids]}), path
    )
    return os.path.getsize(path)


def _commit(base: str, instant: str, action: str, stats: list[dict]) -> None:
    d = os.path.join(base, ".hoodie")
    meta = {
        "partitionToWriteStats": {"": stats},
        "extraMetadata": {"schema": SPARK_SCHEMA_JSON},
        "operationType": "UPSERT",
    }
    for suffix in (f"{action}.requested", f"{action}.inflight"):
        open(os.path.join(d, f"{instant}.{suffix}"), "w").close()
    with open(os.path.join(d, f"{instant}.{action}"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


@pytest.fixture()
def mor_base(tmp_path):
    base = str(tmp_path / "mor")
    os.makedirs(os.path.join(base, ".hoodie"))
    props = {
        "hoodie.table.name": "mor_tab",
        "hoodie.table.type": "MERGE_ON_READ",
        "hoodie.table.version": "6",
        "hoodie.table.base.file.format": "PARQUET",
        "hoodie.populate.meta.fields": "false",
        "hoodie.table.partition.fields": "",
        "hoodie.table.recordkey.fields": "id",
    }
    with open(os.path.join(base, ".hoodie", "hoodie.properties"), "w") as fh:
        for k, v in props.items():
            fh.write(f"{k}={v}\n")
    s1 = _write_base(base, "g1_0-0-0_001.parquet", list(range(5)))
    _commit(
        base,
        "20240101000001000",
        "deltacommit",
        [{"fileId": "g1", "path": "g1_0-0-0_001.parquet", "fileSizeInBytes": s1, "numWrites": 5}],
    )
    return base


def _add_log(base, name, instant, blobs, file_id="g1"):
    path = os.path.join(base, name)
    with open(path, "wb") as fh:
        for b in blobs:
            fh.write(b)
    _commit(
        base,
        instant,
        "deltacommit",
        [{"fileId": file_id, "path": name, "fileSizeInBytes": os.path.getsize(path), "numWrites": 0}],
    )
    return path


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.collect())


def test_block_codec_roundtrip(spark, tmp_path, mor_base):
    path = os.path.join(str(tmp_path), "t.log.1")
    blobs = [
        avro_data_block(spark, "001", AVRO_SCHEMA, [{"id": 1, "v": "a"}, {"id": 2, "v": None}]),
        parquet_data_block("002", pa.table({"id": pa.array([3], pa.int64()), "v": ["c"]})),
        delete_block(spark, "003", ["1"]),
    ]
    with open(path, "wb") as fh:
        fh.writelines(blobs)
    blocks = read_log_blocks(path)
    assert [b.block_type for b in blocks] == [AVRO_DATA_BLOCK, PARQUET_DATA_BLOCK, 1]
    kind, recs = block_records(spark, blocks[0])
    assert kind == "upsert" and recs == [{"id": 1, "v": "a"}, {"id": 2, "v": None}]
    kind, recs = block_records(spark, blocks[1])
    assert kind == "upsert" and recs == [{"id": 3, "v": "c"}]
    kind, recs = block_records(spark, blocks[2])
    assert kind == "delete" and recs[0]["recordKey"] == "1"

    upserts, deleted = merged_log_records(spark, [path], "id")
    assert set(upserts) == {"2", "3"} and deleted == {"1"}


def test_rollback_discards_target_instant(spark, tmp_path, mor_base):
    path = os.path.join(str(tmp_path), "t.log.2")
    with open(path, "wb") as fh:
        fh.write(avro_data_block(spark, "001", AVRO_SCHEMA, [{"id": 1, "v": "keep"}]))
        fh.write(avro_data_block(spark, "002", AVRO_SCHEMA, [{"id": 2, "v": "drop"}]))
        fh.write(rollback_block("003", "002"))
    blocks = read_log_blocks(path)
    assert len(blocks) == 1 and blocks[0].instant == "001"


def test_torn_tail_keeps_prior_blocks(spark, tmp_path, mor_base):
    path = os.path.join(str(tmp_path), "t.log.3")
    good = avro_data_block(spark, "001", AVRO_SCHEMA, [{"id": 1, "v": "ok"}])
    torn = avro_data_block(spark, "002", AVRO_SCHEMA, [{"id": 2, "v": "lost"}])[:-11]
    with open(path, "wb") as fh:
        fh.write(good)
        fh.write(torn)
    blocks = read_log_blocks(path)
    assert len(blocks) == 1 and blocks[0].instant == "001"


def test_snapshot_read_merges_log_tail(spark, mor_base):
    """Upsert id 2, insert id 10, delete id 0: snapshot reflects all;
    read-optimized stays base-only (the conversion scope)."""
    _add_log(
        mor_base,
        ".g1_001.log.1_0-1-0",
        "20240101000002000",
        [
            avro_data_block(
                spark,
                "20240101000002000",
                AVRO_SCHEMA,
                [{"id": 2, "v": "updated"}, {"id": 10, "v": "new"}],
            ),
            delete_block(spark, "20240101000002000", ["0"]),
        ],
    )
    ro = _rows(read_hudi_as_df(spark, mor_base))
    assert ro == [(i, f"x{i}") for i in range(5)]
    snap = _rows(read_hudi_as_df(spark, mor_base, mode="snapshot"))
    assert snap == [(1, "x1"), (2, "updated"), (3, "x3"), (4, "x4"), (10, "new")]


def test_snapshot_read_log_only_group(spark, mor_base):
    """A slice with no base file yet contributes rows in snapshot mode."""
    _add_log(
        mor_base,
        ".g9_001.log.1_0-1-0",
        "20240101000003000",
        [avro_data_block(spark, "20240101000003000", AVRO_SCHEMA, [{"id": 99, "v": "logonly"}])],
        file_id="g9",
    )
    snap = _rows(read_hudi_as_df(spark, mor_base, mode="snapshot"))
    assert (99, "logonly") in snap
    assert _rows(read_hudi_as_df(spark, mor_base)) == [(i, f"x{i}") for i in range(5)]


def test_later_block_wins_across_log_files(spark, mor_base):
    _add_log(
        mor_base,
        ".g1_001.log.1_0-1-0",
        "20240101000002000",
        [avro_data_block(spark, "20240101000002000", AVRO_SCHEMA, [{"id": 3, "v": "first"}])],
    )
    _add_log(
        mor_base,
        ".g1_001.log.2_0-1-0",
        "20240101000003000",
        [avro_data_block(spark, "20240101000003000", AVRO_SCHEMA, [{"id": 3, "v": "second"}])],
    )
    snap = dict(_rows(read_hudi_as_df(spark, mor_base, mode="snapshot")))
    assert snap[3] == "second"
