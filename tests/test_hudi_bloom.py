"""Hudi bloom_filters metadata partition + the Hadoop-format bloom codec
(r9, beyond the reference — it consumes only files/col_stats).

Codec gates: Hadoop Filter header shape, MSB-first bit vector, chained
murmur2 rounds with Java int semantics, serialize/deserialize roundtrip,
membership soundness (no false negatives) and bounded false positives.
End-to-end gates: opt-in target writes one bloom per added file keyed by
the hashed getBloomFilterIndexKey; point lookups answer membership for
every real key; replaced files' blooms tombstone out."""

from __future__ import annotations

import base64
import os
import struct

import pytest
from pyspark.sql import functions as F

from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.model.hudi_bloom import (
    SimpleBloomFilter,
    bloom_bit_indexes,
    bloom_sizing,
    murmur32,
)
from incubator_xtable_spark.sources.hudi_metadata import (
    bloom_filters_available,
    lookup_bloom_filter,
)
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.hudi_target import HudiConversionTarget

from .conftest import SF_SMOKE


def test_murmur32_java_int_semantics():
    # stays in signed-int32 range, deterministic, seed-chained
    for data in (b"", b"a", b"key-001", b"\xff\xfe\xfd", b"x" * 100):
        h = murmur32(data)
        assert -(2**31) <= h < 2**31
        assert murmur32(data) == h
        assert murmur32(data, seed=h) != h or data == b""
    # sign-extended tail: a high-bit tail byte must differ from the
    # zero-extended interpretation (regression pin for the Java variant)
    assert murmur32(b"\x00\x00\x00\x00\xff") != murmur32(b"\x00\x00\x00\x00\x7f")


def test_bit_indexes_chained_and_bounded():
    idx = bloom_bit_indexes(b"key", 5, 1000)
    assert len(idx) == 5 and all(0 <= i < 1000 for i in idx)
    # chaining: each round seeds the next — prefix invariance
    assert bloom_bit_indexes(b"key", 3, 1000) == idx[:3]


def test_sizing_matches_formula():
    bits, nb = bloom_sizing(60000, 1e-9)
    assert bits > 60000 * 40  # ~43 bits/key at 1e-9
    assert 25 <= nb <= 35


def test_serialized_header_is_hadoop_writable_shape():
    bf = SimpleBloomFilter(96, 3)
    bf.add("k1")
    raw = base64.b64decode(bf.serialize_to_string())
    version, nb_hash, hash_type, vector_size = struct.unpack_from(">iibi", raw, 0)
    assert (version, nb_hash, hash_type, vector_size) == (-1, 3, 1, 96)
    assert len(raw) == 13 + 12  # header + ceil(96/8) bit bytes


def test_membership_roundtrip_and_fpr():
    bf = SimpleBloomFilter.for_entries(500, 0.001)
    keys = [f"k{i}" for i in range(500)]
    for k in keys:
        bf.add(k)
    bf2 = SimpleBloomFilter.deserialize_from_string(bf.serialize_to_string())
    assert all(bf2.might_contain(k) for k in keys)  # zero false negatives
    fp = sum(bf2.might_contain(f"absent{i}") for i in range(5000))
    assert fp < 50  # 10x the 0.001 target as a loose statistical bound


def test_corrupt_header_refuses():
    with pytest.raises(ValueError, match="version"):
        SimpleBloomFilter.deserialize_from_string(
            base64.b64encode(struct.pack(">iibi", 7, 3, 1, 96) + b"\0" * 12).decode()
        )
    with pytest.raises(ValueError, match="hash type"):
        SimpleBloomFilter.deserialize_from_string(
            base64.b64encode(struct.pack(">iibi", -1, 3, 0, 96) + b"\0" * 12).decode()
        )


# -- end-to-end through the Hudi target -------------------------------------


def _sync(spark, d, target=None):
    target = target or HudiConversionTarget(
        spark,
        d,
        table_name="nation",
        metadata_index_format="hfile",
        record_index_field="n_nationkey",
        bloom_filters=True,
    )
    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="nation"), {TableFormat.HUDI: target}
    )
    assert res[TableFormat.HUDI].status == SyncStatusCode.SUCCESS, res[TableFormat.HUDI].error
    return target


@pytest.fixture()
def table_dir(spark, tmp_path):
    d = str(tmp_path / "bloom")
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def _file_keys(spark, d):
    """Ground truth: file rel path -> set of record keys in it."""
    from incubator_xtable_spark.sources.hudi_source import live_files_rows

    live = {r["path"] for r in live_files_rows(d)}
    df = spark.read.parquet(*[os.path.join(d, p) for p in live]).select(
        F.col("n_nationkey").cast("string").alias("k"),
        F.regexp_replace(F.col("_metadata.file_path"), r"^file:(//)?", "").alias("fp"),
    )
    out: dict[str, set] = {}
    for r in df.collect():
        out.setdefault(os.path.relpath(r["fp"], d), set()).add(r["k"])
    return out


def test_bloom_partition_answers_membership(spark, table_dir):
    target = _sync(spark, table_dir)
    assert bloom_filters_available(table_dir)
    truth = _file_keys(spark, table_dir)
    all_keys = set().union(*truth.values())
    for rel, keys in truth.items():
        part, fname = os.path.dirname(rel), os.path.basename(rel)
        bf = lookup_bloom_filter(table_dir, part, fname)
        assert bf is not None, rel
        assert all(bf.might_contain(k) for k in keys)  # no false negatives
        # keys of OTHER files mostly answer False (tiny table, fpp 0.001)
        others = all_keys - keys
        assert sum(bf.might_contain(k) for k in others) <= max(1, len(others) // 10)
    assert lookup_bloom_filter(table_dir, "", "no-such.parquet") is None

    # replacing resync: old files' blooms tombstone out, new file covered
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").coalesce(1).write.mode(
        "overwrite"
    ).parquet(table_dir)
    _sync(spark, table_dir, target)
    new_truth = _file_keys(spark, table_dir)
    assert len(new_truth) == 1
    for rel in truth:  # every replaced file's bloom is gone
        if rel in new_truth:
            continue
        assert (
            lookup_bloom_filter(table_dir, os.path.dirname(rel), os.path.basename(rel))
            is None
        )
    (rel,) = new_truth
    bf = lookup_bloom_filter(table_dir, os.path.dirname(rel), os.path.basename(rel))
    assert bf is not None and all(bf.might_contain(k) for k in new_truth[rel])


def test_bloom_requires_key_source(spark, tmp_path):
    with pytest.raises(ValueError, match="requires record_index_field"):
        HudiConversionTarget(
            spark, str(tmp_path), metadata_index_format="hfile", bloom_filters=True
        )
