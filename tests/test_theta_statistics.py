"""Theta-sketch NDV statistics: murmur3 conformance, sketch math, and
the Iceberg Puffin statistics commit.

The hash layer is pinned to the canonical MurmurHash3 x64 128 test
vectors and the DataSketches default-seed hash (0x93CC), because the
whole point of writing `apache-datasketches-theta-v1` blobs is that
OTHER engines can merge/read them — a wrong hash family would produce
valid-looking but non-interoperable sketches.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_xtable_spark.functions.theta_sketch import (
    MAX_THETA,
    ThetaSketch,
    build_column_sketches,
    hash_item,
    murmur3_x64_128,
    seed_hash,
)

from .conftest import SF_SMOKE


# -- hash conformance --------------------------------------------------------


def test_murmur3_canonical_vectors():
    assert murmur3_x64_128(b"", 0) == (0, 0)
    assert murmur3_x64_128(b"hello", 0) == (0xCBD8A7B341BD9B02, 0x5B1E906A48AE1D19)
    assert murmur3_x64_128(b"hello, world", 0) == (0x342FAC623A5EBC8E, 0x4CDCBC079642414D)
    assert murmur3_x64_128(b"The quick brown fox jumps over the lazy dog", 0) == (
        0xE34BBC7BBC071B6C,
        0x7A433CA9C49A9347,
    )
    # seeded
    assert murmur3_x64_128(b"hello", 123) != murmur3_x64_128(b"hello", 0)


def test_datasketches_default_seed_hash():
    assert seed_hash(9001) == 0x93CC


def test_hash_item_is_63_bit():
    for v in ["abc", 42, 3.14, b"\x00\x01", True, -1]:
        h = hash_item(v)
        assert 0 <= h < (1 << 63)


# -- sketch math -------------------------------------------------------------


def test_exact_mode_small_sets():
    s = ThetaSketch.from_items(range(100))
    assert not s.is_estimation and s.estimate() == 100.0
    assert s.theta == MAX_THETA


def test_estimation_mode_accuracy():
    n = 200_000
    s = ThetaSketch.from_items((f"v{i}" for i in range(n)), lg_k=12)
    assert s.is_estimation and len(s.entries) == 4096
    rse = 1 / (4096 ** 0.5)
    assert abs(s.estimate() - n) / n < 4 * rse  # 4-sigma bound


def test_duplicates_do_not_inflate():
    s1 = ThetaSketch.from_items([1, 2, 3] * 1000)
    assert s1.estimate() == 3.0


def test_union_matches_combined_build():
    a = ThetaSketch.from_items(range(0, 60_000), lg_k=10)
    b = ThetaSketch.from_items(range(40_000, 100_000), lg_k=10)
    u = a.union(b)
    n = 100_000
    rse = 1 / (1024 ** 0.5)
    assert abs(u.estimate() - n) / n < 5 * rse
    # union with empty is identity
    assert a.union(ThetaSketch()).entries == a.entries


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(max_size=12),
            # hash_item's int contract is a Spark LONG (8-byte two's complement)
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.binary(max_size=8),
        )
    )
)
def test_serialization_roundtrip(items):
    s = ThetaSketch.from_items(items, lg_k=6)
    assert ThetaSketch.from_bytes(s.to_bytes()) == s


def test_empty_sketch_serialization():
    s = ThetaSketch()
    raw = s.to_bytes()
    assert len(raw) == 8  # one preamble long
    rt = ThetaSketch.from_bytes(raw)
    assert rt.entries == () and rt.estimate() == 0.0


def test_seed_mismatch_rejected():
    s = ThetaSketch.from_items([1, 2, 3])
    with pytest.raises(ValueError, match="seed hash"):
        ThetaSketch.from_bytes(s.to_bytes(), seed=1234)


def test_single_item_compact_format_decodes():
    """DataSketches' single-item compact theta sketch uses preLongs=1
    WITHOUT the EMPTY flag and one hash at bytes 8-16; treating every
    preLongs==1 blob as empty would silently decode it as NDV 0."""
    import struct

    from incubator_xtable_spark.functions.theta_sketch import (
        _FAMILY_COMPACT,
        _FLAG_COMPACT,
        _FLAG_ORDERED,
        _FLAG_READ_ONLY,
        _SERIAL_VERSION,
        hash_item,
        seed_hash,
    )

    h = hash_item(42)
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    blob = struct.pack(
        "<BBBBBBH", 1, _SERIAL_VERSION, _FAMILY_COMPACT, 0, 0, flags, seed_hash()
    ) + struct.pack("<q", h)
    s = ThetaSketch.from_bytes(blob)
    assert s.entries == (h,) and s.estimate() == 1.0
    # truncated single-item blob is an error, not an empty sketch
    with pytest.raises(ValueError, match="single-item"):
        ThetaSketch.from_bytes(blob[:8])


# -- distributed build -------------------------------------------------------


def test_build_column_sketches_matches_exact_counts(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    sketches = build_column_sketches(
        spark, df, columns=["c_custkey", "c_mktsegment", "c_nationkey"]
    )
    exact = {
        c: df.select(c).filter(df[c].isNotNull()).distinct().count()
        for c in sketches
    }
    for c, sk in sketches.items():
        # sf0.001 counts are far below k -> exact mode, equality holds
        assert sk.estimate() == float(exact[c]), c


def test_build_column_sketches_single_scan_all_columns(spark):
    """A wide table pays ONE data scan for all columns (plus the two
    bounded tree-merge shuffles), never a distinct-shuffle per column —
    and int columns must hash as longs end-to-end."""
    df = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    sketches = build_column_sketches(spark, df, columns=cols)
    assert set(sketches) == set(cols)
    exact = df.select("c_nationkey").distinct().count()
    assert sketches["c_nationkey"].estimate() == float(exact)


def test_vectorized_hash8_matches_hash_item():
    """The numpy murmur3 batch kernel must be elementwise identical to
    the scalar hash_item for every 8-byte convention (int, float —
    incl. -0.0 canonicalization, NaN, infinities — bool, date): a
    single-bit divergence would write interoperable-LOOKING but wrong
    Puffin sketches."""
    import datetime
    import struct

    import numpy as np

    from incubator_xtable_spark.functions.theta_sketch import _hash8_theta_vec

    rng = np.random.default_rng(7)
    ints = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, size=500, dtype=np.int64),
            np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64),
        ]
    )
    got = _hash8_theta_vec(ints.view(np.uint64)).view(np.int64)
    for v, h in zip(ints.tolist(), got.tolist()):
        assert h == hash_item(v), v

    floats = np.array(
        [0.0, -0.0, 1.5, -2.25, 3.14159, np.nan, np.inf, -np.inf, 1e-308, 1e308],
        dtype=np.float64,
    )
    canon = floats + 0.0  # mirrors hash_item's -0.0 canonicalization
    got_f = _hash8_theta_vec(canon.view(np.uint64)).view(np.int64)
    for v, h in zip(floats.tolist(), got_f.tolist()):
        assert h == hash_item(float(v)), v

    bools = np.array([0, 1], dtype=np.uint64)
    got_b = _hash8_theta_vec(bools).view(np.int64)
    assert got_b[0] == hash_item(False) and got_b[1] == hash_item(True)

    days = np.array([0, 10, -365, 20000], dtype=np.int64)
    got_d = _hash8_theta_vec(days.view(np.uint64)).view(np.int64)
    epoch = datetime.date(1970, 1, 1)
    for d, h in zip(days.tolist(), got_d.tolist()):
        assert h == hash_item(epoch + datetime.timedelta(days=d)), d
    # sanity: the int convention really is the 8 LE bytes of the long
    assert struct.pack("<q", -5) == np.int64(-5).tobytes()


def test_sketch_tree_merge_is_layout_invariant_and_payload_bounded(spark):
    """The executor-side tree merge must produce sketches bit-identical
    to a single-node build in ESTIMATION mode (NDV >> k, so theta —
    the (k+1)-th smallest hash — has to survive every merge level), for
    any input partition layout; and the driver-facing row stream stays
    <= (k+1) x columns however many partitions feed it."""
    from pyspark.sql import Row

    from incubator_xtable_spark.functions.theta_sketch import sketch_hashes_df

    lg_k = 4  # k=16 so 3000 distinct values are deep into estimation mode
    rows = [Row(i=i, s=f"doc-{i}", f=i * 0.5) for i in range(3000)]
    expected = {
        "i": ThetaSketch.from_items(range(3000), lg_k=lg_k),
        "s": ThetaSketch.from_items((f"doc-{i}" for i in range(3000)), lg_k=lg_k),
        "f": ThetaSketch.from_items((i * 0.5 for i in range(3000)), lg_k=lg_k),
    }
    for nparts in (1, 7, 64):
        df = spark.createDataFrame(rows).repartition(nparts)
        sketches = build_column_sketches(spark, df, columns=["i", "s", "f"], lg_k=lg_k)
        for c in expected:
            assert sketches[c].entries == expected[c].entries, (c, nparts)
            assert sketches[c].theta == expected[c].theta, (c, nparts)
            assert sketches[c].is_estimation
    # driver payload: one <= k+1 set per column, independent of layout
    df64 = spark.createDataFrame(rows).repartition(64)
    n = sketch_hashes_df(spark, df64, ["i", "s", "f"], lg_k=lg_k).count()
    assert n <= ((1 << lg_k) + 1) * 3, n


# -- Iceberg statistics commit ----------------------------------------------


def _converted_iceberg(spark, tmp_path):
    from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    base = str(tmp_path / "ice")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").coalesce(1).write.parquet(base)
    res = ConversionController().sync(
        ParquetConversionSource(spark, base, name="nation"),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="nation")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    return base


def test_write_and_read_ndv_statistics(spark, tmp_path):
    from incubator_xtable_spark.model.puffin import read_puffin_footer
    from incubator_xtable_spark.sources.iceberg_source import IcebergConversionSource
    from incubator_xtable_spark.targets.iceberg_statistics import (
        read_ndv_statistics,
        write_ndv_statistics,
    )
    from incubator_xtable_spark.targets.iceberg_target import read_table_metadata

    base = _converted_iceberg(spark, tmp_path)
    stats_path = write_ndv_statistics(spark, base, columns=["n_nationkey", "n_regionkey"])
    assert os.path.exists(stats_path)

    # metadata.json carries the spec statistics entry
    meta = read_table_metadata(base)
    entries = meta["statistics"]
    assert len(entries) == 1
    e = entries[0]
    assert e["snapshot-id"] == meta["current-snapshot-id"]
    assert e["statistics-path"] == stats_path
    assert e["file-size-in-bytes"] == os.path.getsize(stats_path)
    blob_types = {b["type"] for b in e["blob-metadata"]}
    assert blob_types == {"apache-datasketches-theta-v1"}
    # blobs name their columns by ICEBERG FIELD ID
    table = IcebergConversionSource(spark, base).get_current_table()
    fids = {
        (f.metadata or {}).get("xtable.fieldId")
        for f in table.read_schema.fields
        if f.name in ("n_nationkey", "n_regionkey")
    }
    assert {b["fields"][0] for b in e["blob-metadata"]} == fids

    # puffin footer parses independently
    footer = read_puffin_footer(stats_path)
    assert len(footer["blobs"]) == 2

    # read back via our own decoder: exact NDV at this scale
    stats = read_ndv_statistics(base)
    ndv_by_fid = {k: v["ndv"] for k, v in stats.items()}
    assert set(ndv_by_fid.values()) == {25, 5}  # 25 nations, 5 regions

    # the table is still readable after the statistics commit
    from incubator_xtable_spark.sources.iceberg_source import read_iceberg_as_df

    assert read_iceberg_as_df(spark, base).count() == 25


def test_statistics_replaced_per_snapshot(spark, tmp_path):
    from incubator_xtable_spark.targets.iceberg_statistics import write_ndv_statistics
    from incubator_xtable_spark.targets.iceberg_target import read_table_metadata

    base = _converted_iceberg(spark, tmp_path)
    write_ndv_statistics(spark, base, columns=["n_nationkey"])
    write_ndv_statistics(spark, base, columns=["n_nationkey", "n_name"])
    meta = read_table_metadata(base)
    assert len(meta["statistics"]) == 1  # same snapshot: replaced, not stacked
    assert len(meta["statistics"][0]["blob-metadata"]) == 2


def test_numpy_scalars_hash_like_python_values():
    """Arrow batches hand numpy scalars to the executor pass; they must
    hash identically to the Python values (np.int64 is NOT an int and
    would otherwise fall through to a non-interoperable branch)."""
    import datetime

    import numpy as np
    import pytest

    assert hash_item(np.int64(5)) == hash_item(5)
    assert hash_item(np.float64(1.5)) == hash_item(1.5)
    assert hash_item(np.bool_(True)) == hash_item(True)
    assert hash_item(np.str_("ab")) == hash_item("ab")
    assert hash_item(datetime.date(1970, 1, 11)) == hash_item(10)
    with pytest.raises(TypeError, match="unhashable sketch item"):
        hash_item(object())


def test_retention_respects_refs_and_drops_expired_statistics(spark, tmp_path):
    """A tag PINS its snapshot against count-based expiry (the spec rule
    — refs age out by their own policy, not snapshot count); once the
    tag is dropped, expiry removes the snapshot along with its
    statistics entry and puffin file."""
    import json

    from pyspark.sql import functions as F

    from incubator_xtable_spark.sync.retention import iceberg_expire_snapshots
    from incubator_xtable_spark.targets.iceberg_statistics import write_ndv_statistics
    from incubator_xtable_spark.targets.iceberg_target import (
        current_metadata_version,
        metadata_dir,
        read_table_metadata,
    )

    base = _converted_iceberg(spark, tmp_path)
    stats_path = write_ndv_statistics(spark, base, columns=["n_nationkey"])
    meta = read_table_metadata(base)
    first_sid = meta["current-snapshot-id"]
    meta.setdefault("refs", {})["old-tag"] = {"snapshot-id": first_sid, "type": "tag"}
    with open(
        os.path.join(metadata_dir(base), f"v{current_metadata_version(base)}.metadata.json"),
        "w",
    ) as fh:
        json.dump(meta, fh)
    from incubator_xtable_spark.model.core import TableFormat
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").withColumn(
        "n_nationkey", F.col("n_nationkey") + 100
    ).coalesce(1).write.mode("append").parquet(base)
    ConversionController().sync(
        ParquetConversionSource(spark, base, name="nation"),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="nation")},
    )

    # the tag pins the first snapshot: nothing expires, stats survive
    assert iceberg_expire_snapshots(base, keep_last=1) == []
    meta2 = read_table_metadata(base)
    assert any(s["snapshot-id"] == first_sid for s in meta2["snapshots"])
    assert os.path.exists(stats_path)
    assert "old-tag" in meta2["refs"]

    # drop the tag -> the snapshot, its statistics entry and its puffin go
    del meta2["refs"]["old-tag"]
    with open(
        os.path.join(metadata_dir(base), f"v{current_metadata_version(base)}.metadata.json"),
        "w",
    ) as fh:
        json.dump(meta2, fh)
    expired = iceberg_expire_snapshots(base, keep_last=1)
    assert first_sid in {s for s in expired}
    meta3 = read_table_metadata(base)
    assert meta3.get("statistics", []) == []
    assert not os.path.exists(stats_path)
    assert "main" in (meta3.get("refs") or {})


def test_update_ndv_statistics_incremental_union_equals_full(spark, tmp_path):
    """Incremental stats maintenance (r12): on a pure append, sketching
    only the ADDED files and unioning with the prior sketches must be
    BIT-IDENTICAL to a full rebuild (KMV k-min sets are union-
    distributive) — the O(delta) stats posture at 100 TB. Rewrites and
    already-covered snapshots take the full/noop paths."""
    import glob
    import time

    from pyspark.sql import functions as F

    from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.sync.retention import iceberg_rewrite_data_files
    from incubator_xtable_spark.targets.iceberg_statistics import (
        read_ndv_statistics,
        update_ndv_statistics,
        write_ndv_statistics,
    )
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    base = str(tmp_path / "ice_incr_stats")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").coalesce(1).write.parquet(base)

    def _sync():
        res = ConversionController().sync(
            ParquetConversionSource(spark, base, name="nation"),
            {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="nation")},
        )
        assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS

    _sync()
    write_ndv_statistics(spark, base, columns=["n_nationkey", "n_name", "n_regionkey"])

    # append 25 shifted rows as 2 new files, re-sync
    pre = set(glob.glob(os.path.join(base, "*.parquet")))
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .withColumn("n_nationkey", F.col("n_nationkey") + 100)
        .withColumn("n_name", F.concat(F.col("n_name"), F.lit("_B")))
        .repartition(2)
        .write.mode("append")
        .parquet(base)
    )
    future = time.time() + 10
    for p in set(glob.glob(os.path.join(base, "*.parquet"))) - pre:
        os.utime(p, (future, future))
    _sync()

    path, info = update_ndv_statistics(spark, base)
    assert info["mode"] == "incremental" and info["scanned_files"] == 2
    incr = read_ndv_statistics(base)
    assert {v["ndv"] for v in incr.values()} == {50, 50, 5}  # keys/names doubled

    # full rebuild of the SAME snapshot replaces the entry: bit-identical
    write_ndv_statistics(spark, base, columns=["n_nationkey", "n_name", "n_regionkey"])
    full = read_ndv_statistics(base)
    assert set(full) == set(incr)
    for k in full:
        assert full[k]["sketch"] == incr[k]["sketch"], k

    # covered snapshot -> noop
    _, info2 = update_ndv_statistics(spark, base)
    assert info2["mode"] == "noop"

    # a rewrite is not an append: falls back to the full path
    out = iceberg_rewrite_data_files(
        spark, base, target_file_bytes=128 * 1024 * 1024, min_file_bytes=64 * 1024 * 1024
    )
    assert out["snapshot_id"] is not None
    _, info3 = update_ndv_statistics(spark, base)
    assert info3["mode"] == "full"
    assert {v["ndv"] for v in read_ndv_statistics(base).values()} == {50, 50, 5}
