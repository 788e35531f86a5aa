"""Hudi 1.0 secondary-index metadata partition (secondary_index_idx_<f>),
BEYOND the reference (it consumes only files/col_stats; real Hudi's write
client maintains these partitions — ref hudi/HudiConversionTarget.java
metadata-table writes).

Gates: (a) the index holds EXACTLY the data's (secondary value, record
key) mapping set through appends and replacements, with departed
mappings tombstoned via isDeleted payloads; (b) equality lookups pin one
Java-hashCode shard and return the right record keys; (c) the
SecondaryIndexKeyUtils escape/split codec round-trips hostile values
('$' and '\\' in either part); (d) lookups compose with the RLI for file
locations; (e) requiring the record index is enforced."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.model.hudi_metadata_records import (
    construct_secondary_index_key,
    split_secondary_index_key,
)
from incubator_xtable_spark.sources.hudi_metadata import (
    lookup_record_key,
    lookup_secondary_key,
    read_secondary_index,
    secondary_index_available,
)
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.hudi_target import HudiConversionTarget

from .conftest import SF_SMOKE

FIELD = "n_regionkey"


def _sync(spark, d, full=False):
    from incubator_xtable_spark.model.core import SyncMode
    from incubator_xtable_spark.sync.controller import ConversionConfig

    target = HudiConversionTarget(
        spark,
        d,
        table_name="nation",
        metadata_index_format="hfile",
        record_index_field="n_nationkey",
        secondary_index_field=FIELD,
    )
    cfg = ConversionConfig(sync_mode=SyncMode.FULL) if full else None
    res = ConversionController(cfg).sync(
        ParquetConversionSource(spark, d, name="nation"), {TableFormat.HUDI: target}
    )
    assert res[TableFormat.HUDI].status == SyncStatusCode.SUCCESS, res[TableFormat.HUDI].error
    return target


@pytest.fixture()
def table_dir(spark, tmp_path):
    d = str(tmp_path / "si")
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def _truth_pairs(spark, d):
    from incubator_xtable_spark.sources.hudi_source import live_files_rows

    live = {r["path"] for r in live_files_rows(d)}
    df = spark.read.parquet(*[os.path.join(d, p) for p in live]).select(
        F.col(FIELD).cast("string").alias("sec"),
        F.col("n_nationkey").cast("string").alias("rec"),
    )
    return {(r["sec"], r["rec"]) for r in df.collect()}


def _index_pairs(spark, d):
    return {
        (r["secondary_key"], r["record_key"])
        for r in read_secondary_index(spark, d, FIELD).collect()
    }


def test_key_codec_roundtrips_hostile_values():
    cases = [
        ("plain", "rk1"),
        ("has$dollar", "rk$2"),
        ("back\\slash", "rk\\3"),
        ("\\$both$\\", "$\\"),
        ("", "empty-sec-ok"),
    ]
    for sec, rec in cases:
        key = construct_secondary_index_key(sec, rec)
        assert split_secondary_index_key(key) == (sec, rec), key
    # escaped separator never splits: one unescaped '$' total
    key = construct_secondary_index_key("a$b", "c$d")
    assert key.count("$") - key.count("\\$") == 1


def test_index_matches_data_through_commits(spark, table_dir):
    _sync(spark, table_dir)
    assert secondary_index_available(table_dir, FIELD)
    assert _index_pairs(spark, table_dir) == _truth_pairs(spark, table_dir)

    # append commit: new mappings arrive
    extra = (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .withColumn("n_nationkey", F.col("n_nationkey") + 100)
        .limit(7)
    )
    extra.coalesce(1).write.mode("append").parquet(table_dir)
    _sync(spark, table_dir)
    assert _index_pairs(spark, table_dir) == _truth_pairs(spark, table_dir)


def test_lookup_pins_shard_and_composes_with_rli(spark, table_dir):
    _sync(spark, table_dir)
    truth = _truth_pairs(spark, table_dir)
    secs = sorted({s for s, _ in truth})
    for sec in secs:
        expect = sorted(r for s, r in truth if s == sec)
        got = lookup_secondary_key(table_dir, FIELD, sec)
        assert got == expect, f"lookup({sec!r})"
        # compose: every record key resolves a location through the RLI
        for rk in got:
            loc = lookup_record_key(table_dir, rk)
            assert loc is not None and loc.get("fileId")
    assert lookup_secondary_key(table_dir, FIELD, "no-such-value") == []


def test_replacement_tombstones_departed_mappings(spark, tmp_path):
    """Writer-level tombstone semantics: a replacement commit (removed
    files whose mappings depart, bytes still on disk — the metadata-only
    conversion contract) emits isDeleted payloads; a (sec, rec) pair
    re-asserted by an added file the SAME commit stays live."""
    from incubator_xtable_spark.targets.hudi_metadata_index import (
        write_secondary_index_commit,
    )

    base = str(tmp_path / "si_unit")
    os.makedirs(base)
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    nation.filter(F.col("n_nationkey") < 10).coalesce(1).write.parquet(base + "/a")
    nation.filter(F.col("n_nationkey") >= 10).coalesce(1).write.parquet(base + "/b")
    # c re-asserts keys 0..4 with the SAME secondary values and moves
    # keys 5..9 to shifted ones
    nation.filter(F.col("n_nationkey") < 5).unionByName(
        nation.filter((F.col("n_nationkey") >= 5) & (F.col("n_nationkey") < 10)).withColumn(
            FIELD, F.col(FIELD) + 50
        )
    ).coalesce(1).write.parquet(base + "/c")

    def rels(sub):
        return [
            f"{sub}/{f}"
            for f in os.listdir(os.path.join(base, sub))
            if f.endswith(".parquet")
        ]

    write_secondary_index_commit(
        spark, base, "20240101000000000", rels("a") + rels("b"), [],
        "n_nationkey", FIELD,
    )
    # replacement: a leaves, c arrives
    write_secondary_index_commit(
        spark, base, "20240101000001000", rels("c"), rels("a"),
        "n_nationkey", FIELD,
    )
    pairs = {
        (r["secondary_key"], r["record_key"])
        for r in read_secondary_index(spark, base, FIELD).collect()
    }
    truth = {
        (r["sec"], r["rec"])
        for r in spark.read.parquet(base + "/b", base + "/c")
        .select(
            F.col(FIELD).cast("string").alias("sec"),
            F.col("n_nationkey").cast("string").alias("rec"),
        )
        .collect()
    }
    assert pairs == truth
    # departed mappings (keys 5..9 under their ORIGINAL secondary values)
    # are tombstoned out; re-asserted pairs (keys 0..4) survived
    old = {
        (r["sec"], r["rec"])
        for r in spark.read.parquet(base + "/a")
        .filter(F.col("n_nationkey") >= 5)
        .select(
            F.col(FIELD).cast("string").alias("sec"),
            F.col("n_nationkey").cast("string").alias("rec"),
        )
        .collect()
    }
    assert not (old & pairs)


def test_requires_record_index(spark, table_dir):
    with pytest.raises(ValueError, match="requires record_index_field"):
        HudiConversionTarget(
            spark,
            table_dir,
            metadata_index_format="hfile",
            secondary_index_field=FIELD,
        )
    with pytest.raises(ValueError, match="must differ"):
        HudiConversionTarget(
            spark,
            table_dir,
            metadata_index_format="hfile",
            record_index_field=FIELD,
            secondary_index_field=FIELD,
        )
