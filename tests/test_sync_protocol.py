"""Unit tests for the sync protocol pieces the reference calls its
subtlest logic: bookmark serialization, FULL/INCREMENTAL decision,
most-out-of-sync backlog alignment, pending-commit applicability, and
per-target failure isolation (model/CommitsBacklog.java:29-69,
conversion/ConversionController.java:254-387, spi/sync/TableFormatSync.java:99-151).

Pure-Python fakes — no Spark needed, mirroring the reference's mocked
TestTableFormatSync/TestConversionController style.
"""

from __future__ import annotations

import datetime
import decimal

import pytest

from pyspark.sql import types as T

from incubator_xtable_spark.model.core import (
    CommitsBacklog,
    InternalSnapshot,
    InternalTable,
    SyncMode,
    SyncStatusCode,
    TableChange,
    TableFormat,
)
from incubator_xtable_spark.model.stat_codec import (
    decode_stat,
    encode_stat,
    from_delta_stats_json,
    to_delta_stats_json,
)
from incubator_xtable_spark.model.schema_meta import (
    FIELD_ID,
    assign_field_ids,
    field_id,
    find_field_by_path,
)
from incubator_xtable_spark.model.sync_metadata import TableSyncMetadata
from incubator_xtable_spark.sync.controller import (
    ConversionConfig,
    ConversionController,
    _commit_applies,
    _earliest_instant,
)


def _table() -> InternalTable:
    return InternalTable(
        name="t",
        table_format=TableFormat.PARQUET,
        base_path="/tmp/t",
        read_schema=T.StructType([T.StructField("id", T.LongType(), False)]),
    )


class FakeSource:
    def __init__(self, commits: list[str], safe_from: str = "0") -> None:
        self.commits = commits
        self.safe_from = safe_from
        self.change_requests: list[str] = []

    def is_incremental_sync_safe_from(self, instant: str) -> bool:
        return int(instant) >= int(self.safe_from)

    def get_current_snapshot(self) -> InternalSnapshot:
        return InternalSnapshot(table=_table(), version=self.commits[-1], files=None)

    def get_commits_backlog(self, instants) -> CommitsBacklog:
        new = {c for c in self.commits if int(c) > int(instants.last_sync_instant)}
        pending_done = {p for p in instants.pending_commits if p in self.commits}
        return CommitsBacklog(commits_to_process=sorted(new | pending_done, key=int))

    def get_table_change_for_commit(self, commit: str) -> TableChange:
        self.change_requests.append(commit)
        return TableChange(table=_table(), commit_id=commit, files_added=None, files_removed=None)


class FakeTarget:
    def __init__(self, bookmark: TableSyncMetadata | None = None, fail_on: str | None = None):
        self.bookmark = bookmark
        self.fail_on = fail_on
        self.synced_commits: list[str] = []
        self.snapshot_syncs = 0

    def get_table_metadata(self):
        return self.bookmark

    def begin_sync(self, table):
        self._staged = None

    def sync_metadata(self, metadata):
        self._staged = metadata

    def sync_schema(self, schema):
        pass

    def sync_partition_spec(self, cols):
        pass

    def sync_files_for_snapshot(self, files):
        self.snapshot_syncs += 1

    def sync_files_for_diff(self, change):
        if self.fail_on is not None and change.commit_id == self.fail_on:
            raise RuntimeError(f"boom at {change.commit_id}")
        self._commit = change.commit_id

    def complete_sync(self):
        if self._staged is not None:
            self.bookmark = self._staged
        if getattr(self, "_commit", None) is not None:
            self.synced_commits.append(self._commit)
            self._commit = None


# ---------------------------------------------------------------------------


def test_bookmark_json_roundtrip():
    bm = TableSyncMetadata(
        last_instant_synced="42",
        instants_to_consider_for_next_sync=["40", "41"],
        source_table_format="PARQUET",
        source_identifier="src-1",
    )
    assert TableSyncMetadata.from_json(bm.to_json()) == bm


def test_no_bookmark_forces_full():
    source = FakeSource(["1", "2"])
    target = FakeTarget(bookmark=None)
    res = ConversionController().sync(source, {TableFormat.DELTA: target})
    assert res[TableFormat.DELTA].mode == SyncMode.FULL
    assert target.snapshot_syncs == 1


def test_unsafe_history_falls_back_to_full():
    # source can only replay from instant 5; target bookmark at 3
    source = FakeSource(["6", "7"], safe_from="5")
    target = FakeTarget(bookmark=TableSyncMetadata(last_instant_synced="3"))
    res = ConversionController().sync(source, {TableFormat.DELTA: target})
    assert res[TableFormat.DELTA].mode == SyncMode.FULL
    assert target.snapshot_syncs == 1


def test_incremental_replays_only_new_commits():
    source = FakeSource(["1", "2", "3", "4"])
    target = FakeTarget(bookmark=TableSyncMetadata(last_instant_synced="2"))
    res = ConversionController().sync(source, {TableFormat.DELTA: target})
    assert res[TableFormat.DELTA].mode == SyncMode.INCREMENTAL
    assert target.synced_commits == ["3", "4"]
    assert target.bookmark.last_instant_synced == "4"


def test_most_out_of_sync_alignment():
    """One backlog serves both targets; the fresher target skips commits
    it already has (ConversionController.java:354-387)."""
    source = FakeSource(["1", "2", "3", "4"])
    behind = FakeTarget(bookmark=TableSyncMetadata(last_instant_synced="1"))
    ahead = FakeTarget(bookmark=TableSyncMetadata(last_instant_synced="3"))
    ConversionController().sync(source, {TableFormat.DELTA: behind, TableFormat.ICEBERG: ahead})
    assert behind.synced_commits == ["2", "3", "4"]
    assert ahead.synced_commits == ["4"]
    # the change for each commit is extracted exactly once (lazy, shared)
    assert source.change_requests == ["2", "3", "4"]


def test_pending_instant_reconsidered():
    """A previously in-flight commit OLDER than the bookmark is replayed
    when it completes (CommitsBacklog pending-instant dance)."""
    source = FakeSource(["2", "5"])
    target = FakeTarget(
        bookmark=TableSyncMetadata(
            last_instant_synced="4", instants_to_consider_for_next_sync=["2"]
        )
    )
    ConversionController().sync(source, {TableFormat.DELTA: target})
    # commit 2 applies (was pending) AND commit 5 applies (new)
    assert target.synced_commits == ["2", "5"]


def test_failed_target_stops_but_others_continue():
    source = FakeSource(["1", "2", "3"])
    ok = FakeTarget(bookmark=TableSyncMetadata(last_instant_synced="0"))
    bad = FakeTarget(bookmark=TableSyncMetadata(last_instant_synced="0"), fail_on="2")
    res = ConversionController().sync(source, {TableFormat.DELTA: ok, TableFormat.ICEBERG: bad})
    assert res[TableFormat.DELTA].status == SyncStatusCode.SUCCESS
    assert ok.synced_commits == ["1", "2", "3"]
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.ERROR
    assert bad.synced_commits == ["1"]  # stopped at the failure
    # bookmark not advanced past the last good commit
    assert bad.bookmark.last_instant_synced == "1"


def test_earliest_instant_includes_pending():
    bm = TableSyncMetadata(last_instant_synced="9", instants_to_consider_for_next_sync=["4", "7"])
    assert _earliest_instant(bm) == "4"


def test_commit_applicability():
    bm = TableSyncMetadata(last_instant_synced="5", instants_to_consider_for_next_sync=["3"])
    assert _commit_applies("6", bm)
    assert _commit_applies("3", bm)  # pending
    assert not _commit_applies("4", bm)  # older, not pending
    assert not _commit_applies("5", bm)  # already synced


def test_forced_full_mode():
    source = FakeSource(["1", "2"])
    target = FakeTarget(bookmark=TableSyncMetadata(last_instant_synced="1"))
    cfg = ConversionConfig(sync_mode=SyncMode.FULL)
    res = ConversionController(cfg).sync(source, {TableFormat.DELTA: target})
    assert res[TableFormat.DELTA].mode == SyncMode.FULL


# ---------------------------------------------------------------------------
# stat codec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "value,dtype",
    [
        (42, T.LongType()),
        (-7, T.IntegerType()),
        (3.5, T.DoubleType()),
        (float("nan"), T.DoubleType()),
        (float("inf"), T.DoubleType()),
        (float("-inf"), T.DoubleType()),
        ("abc", T.StringType()),
        (True, T.BooleanType()),
        (datetime.datetime(2024, 1, 2, 3, 4, 5, 678901), T.TimestampType()),
        (datetime.date(2024, 5, 6), T.DateType()),
        (b"\x01\x02", T.BinaryType()),
    ],
)
def test_stat_codec_roundtrip(value, dtype):
    out = decode_stat(encode_stat(value, dtype), dtype)
    if isinstance(value, float) and value != value:
        assert out != out  # NaN
    else:
        assert out == value


def test_delta_stats_json_roundtrip():
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    col_stats = {
        "a": {"min_json": "1", "max_json": "9", "null_count": 0},
        "b": {"min_json": '"x"', "max_json": '"z"', "null_count": 2},
    }
    raw = to_delta_stats_json(10, col_stats, schema)
    n, back = from_delta_stats_json(raw)
    assert n == 10
    assert back["a"]["min_json"] == "1"
    assert back["b"]["max_json"] == '"z"'
    assert back["b"]["null_count"] == 2


# ---------------------------------------------------------------------------
# schema metadata conventions
# ---------------------------------------------------------------------------


def test_assign_field_ids_nested_and_stable():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "nested",
                T.StructType([T.StructField("inner", T.StringType())]),
            ),
        ]
    )
    with_ids = assign_field_ids(schema)
    # pre-order: id=1, nested=2, nested.inner=3
    assert [field_id(f) for f in with_ids.fields] == [1, 2]
    inner = find_field_by_path(with_ids, "nested.inner")
    assert inner is not None and inner.metadata[FIELD_ID] == 3
    # re-assign is a no-op for already-assigned ids
    again = assign_field_ids(with_ids)
    assert [field_id(f) for f in again.fields] == [field_id(f) for f in with_ids.fields]


def test_find_field_by_path_missing():
    schema = T.StructType([T.StructField("a", T.LongType())])
    assert find_field_by_path(schema, "a.b") is None
    assert find_field_by_path(schema, "zzz") is None


# ---------------------------------------------------------------------------
# iceberg binary single-value serialization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "value,dtype",
    [
        (42, T.IntegerType()),
        (-1, T.IntegerType()),
        (2**40, T.LongType()),
        (3.25, T.FloatType()),
        (-2.5e10, T.DoubleType()),
        (True, T.BooleanType()),
        ("héllo", T.StringType()),
        (b"\x00\xff", T.BinaryType()),
        (datetime.date(2024, 2, 29), T.DateType()),
        (datetime.datetime(2024, 1, 2, 3, 4, 5, 678901), T.TimestampNTZType()),
        (decimal.Decimal("123.45"), T.DecimalType(10, 2)),
        (decimal.Decimal("-0.01"), T.DecimalType(10, 2)),
    ],
)
def test_iceberg_value_codec_roundtrip(value, dtype):
    from incubator_xtable_spark.model.iceberg_values import (
        from_iceberg_bytes,
        to_iceberg_bytes,
    )

    raw = to_iceberg_bytes(value, dtype)
    assert isinstance(raw, bytes)
    assert from_iceberg_bytes(raw, dtype) == value


def test_iceberg_value_codec_endianness():
    """Spec: little-endian numerics, big-endian unscaled decimals."""
    from incubator_xtable_spark.model.iceberg_values import to_iceberg_bytes

    assert to_iceberg_bytes(1, T.IntegerType()) == b"\x01\x00\x00\x00"
    assert to_iceberg_bytes(1, T.LongType()) == b"\x01" + b"\x00" * 7
    assert to_iceberg_bytes(decimal.Decimal("1.00"), T.DecimalType(5, 2)) == b"\x64"
