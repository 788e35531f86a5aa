"""Hudi record-level index (RLI) metadata partition — r9 stretch, BEYOND
the reference (it consumes only files/col_stats; ref
hudi/HudiConversionTarget.java:267-470 drives the write client that
maintains these partitions in real Hudi).

Gates: (a) the written index maps EVERY data row's key to its live file
through appends and replacements, with disappeared keys tombstoned out;
(b) point lookups land on the correct Java-hashCode shard; (c) shard
writes are executor-side (no driver funnel) and every file group exists
from the first commit so the shard modulus never drifts."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.model.hudi_hash import map_record_key_to_file_group_index
from incubator_xtable_spark.sources.hudi_metadata import (
    HFILE_RECORD_INDEX_SUBDIR,
    lookup_record_key,
    read_record_index,
    record_index_available,
    record_index_num_shards,
)
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.hudi_target import HudiConversionTarget

from .conftest import SF_SMOKE

N_SHARDS = 4


def _sync(spark, d, target=None):
    target = target or HudiConversionTarget(
        spark,
        d,
        table_name="nation",
        metadata_index_format="hfile",
        record_index_field="n_nationkey",
        record_index_shards=N_SHARDS,
    )
    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="nation"), {TableFormat.HUDI: target}
    )
    assert res[TableFormat.HUDI].status == SyncStatusCode.SUCCESS, res[TableFormat.HUDI].error
    return target


@pytest.fixture()
def table_dir(spark, tmp_path):
    d = str(tmp_path / "rli")
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def _truth(spark, d):
    """Ground truth key -> (partition, fileId) from the data files."""
    from incubator_xtable_spark.sources.hudi_source import live_files_rows

    live = {r["path"] for r in live_files_rows(d)}
    df = spark.read.parquet(*[os.path.join(d, p) for p in live]).select(
        F.col("n_nationkey").cast("string").alias("k"),
        F.regexp_replace(F.col("_metadata.file_path"), r"^file:(//)?", "").alias("fp"),
    )
    out = {}
    for r in df.collect():
        rel = os.path.relpath(r["fp"], d)
        out[r["k"]] = (os.path.dirname(rel), os.path.splitext(os.path.basename(rel))[0])
    return out


def _index(spark, d):
    return {
        r["record_key"]: (r["partition_path"], r["file_id"])
        for r in read_record_index(spark, d).collect()
    }


def test_record_index_matches_data_through_commits(spark, table_dir):
    target = _sync(spark, table_dir)
    assert record_index_available(table_dir)
    assert record_index_num_shards(table_dir) == N_SHARDS
    assert _index(spark, table_dir) == _truth(spark, table_dir)

    # append commit: new keys index to the new file
    base = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    base.withColumn("n_nationkey", F.col("n_nationkey") + 100).coalesce(1).write.mode(
        "append"
    ).parquet(table_dir)
    _sync(spark, table_dir, target)
    assert _index(spark, table_dir) == _truth(spark, table_dir)

    # replacing resync that DROPS keys (shrink to nationkey < 10): moved
    # keys re-point to the new file, disappeared keys tombstone out
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").filter(
        F.col("n_nationkey") < 10
    ).coalesce(1).write.mode("overwrite").parquet(table_dir)
    _sync(spark, table_dir, target)
    idx = _index(spark, table_dir)
    assert idx == _truth(spark, table_dir)
    assert len(idx) == 10
    assert "20" not in idx  # replaced-away key is gone, not stale


def test_point_lookup_lands_on_java_hash_shard(spark, table_dir):
    _sync(spark, table_dir)
    truth = _truth(spark, table_dir)
    d = os.path.join(table_dir, HFILE_RECORD_INDEX_SUBDIR)
    for key, (part, fid) in truth.items():
        info = lookup_record_key(table_dir, key)
        assert info is not None, key
        assert info["fileId"] == fid
        assert (info["partitionName"] or ".") == (part or ".")
        assert info["fileIdEncoding"] == 1  # external (non-UUID) file ids
        # the record physically lives in the Java-hashCode shard
        shard = map_record_key_to_file_group_index(key, N_SHARDS)
        from incubator_xtable_spark.model.hudi_metadata_records import (
            merged_metadata_slice_records,
        )
        from incubator_xtable_spark.sources.hudi_metadata import _hfile_partition_state

        slices, _ = _hfile_partition_state(d)
        by_group = {os.path.basename(p).split("_")[0]: (p, logs) for p, logs in slices}
        gp, glogs = by_group[f"record-index-{shard:04d}-0"]
        assert key in dict(merged_metadata_slice_records(gp, glogs))
    assert lookup_record_key(table_dir, "no-such-key") is None


def test_all_shard_groups_exist_from_first_commit(spark, table_dir):
    """25 nation keys over 4 shards could leave a group untouched; every
    group must still exist so the reader's shard modulus is stable."""
    _sync(spark, table_dir)
    d = os.path.join(table_dir, HFILE_RECORD_INDEX_SUBDIR)
    groups = {
        os.path.basename(p).split("_")[0] for p in glob.glob(os.path.join(d, "*.hfile"))
    }
    assert groups == {f"record-index-{i:04d}-0" for i in range(N_SHARDS)}


def test_record_index_requires_hfile_mode(spark, tmp_path):
    with pytest.raises(ValueError, match="metadata_index_format='hfile'"):
        HudiConversionTarget(
            spark, str(tmp_path), record_index_field="n_nationkey"
        )
    # metadata_indexes=False would silently never write the index — refuse
    with pytest.raises(ValueError, match="metadata_indexes=True"):
        HudiConversionTarget(
            spark,
            str(tmp_path),
            metadata_indexes=False,
            metadata_index_format="hfile",
            record_index_field="n_nationkey",
        )


def test_metadata_partitions_flag_advertises_record_index(spark, table_dir):
    from incubator_xtable_spark.sources.hudi_source import read_properties

    _sync(spark, table_dir)
    parts = read_properties(table_dir)["hoodie.table.metadata.partitions"].split(",")
    assert "record_index" in parts and "column_stats" in parts and "files" in parts
