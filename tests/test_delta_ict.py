"""Delta In-Commit Timestamps (PROTOCOL.md "In-Commit Timestamps",
writer table feature `inCommitTimestamp`) — write path, monotonicity,
mid-table enablement properties, ICT-driven timestamp time travel, and
red-proven conformance checks.

Reference behavior anchor: the reference's Delta target leaves commit
timestamps to log-file mtime (TestDeltaSync relies on getVersionFromInstant
only); ICT is a Delta-spec feature beyond the reference that makes
timestamp time travel deterministic under file copies/backfills.
"""

from __future__ import annotations

import json
import os

import pytest

from incubator_xtable_spark.model.conformance import check_delta_conformance
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.delta_source import (
    commit_timestamps,
    read_delta_as_df,
    version_at_timestamp,
)
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget

from .conftest import SF_SMOKE


@pytest.fixture()
def source_dir(spark, tmp_path):
    d = str(tmp_path / "ict_src")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.parquet(d)
    return d


def _commit_lines(base: str, version: int) -> list[dict]:
    fp = os.path.join(base, "_delta_log", f"{version:020d}.json")
    with open(fp, encoding="utf-8") as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def _append_rows(spark, source_dir: str, shift: int) -> None:
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{SF_SMOKE}/region.parquet")
        .withColumn("r_regionkey", F.col("r_regionkey") + shift)
        .coalesce(1)
        .write.mode("append")
        .parquet(source_dir)
    )


def _sync(spark, source_dir: str, **target_kw):
    source = ParquetConversionSource(spark, source_dir, name="region")
    target = DeltaConversionTarget(spark, source_dir, **target_kw)
    res = ConversionController().sync(source, {TableFormat.DELTA: target})
    assert res[TableFormat.DELTA].status == SyncStatusCode.SUCCESS, (
        res[TableFormat.DELTA].error
    )
    return res


def test_ict_from_creation(spark, source_dir):
    _sync(spark, source_dir, in_commit_timestamps=True)
    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, in_commit_timestamps=True)

    icts = []
    for v in (0, 1):
        lines = _commit_lines(source_dir, v)
        # spec: commitInfo must be the FIRST action and carry the ICT
        assert next(iter(lines[0])) == "commitInfo", v
        icts.append(lines[0]["commitInfo"]["inCommitTimestamp"])
    assert icts[1] > icts[0]

    proto = next(l["protocol"] for l in _commit_lines(source_dir, 0) if "protocol" in l)
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    # writer-only feature: reader version stays legacy, and a legacy-reader
    # protocol must NOT carry a readerFeatures field
    assert proto["minReaderVersion"] < 3
    assert "readerFeatures" not in proto

    meta = next(l["metaData"] for l in _commit_lines(source_dir, 0) if "metaData" in l)
    cfg = meta["configuration"]
    assert cfg["delta.enableInCommitTimestamps"] == "true"
    # enabled from creation: no enablement provenance props
    assert "delta.inCommitTimestampEnablementVersion" not in cfg

    report = check_delta_conformance(spark, source_dir)
    assert not [f for f in report.issues if f.code.startswith("DELTA_ICT")], (
        report.issues
    )


def test_ict_mid_table_enablement(spark, source_dir):
    _sync(spark, source_dir)  # version 0 without ICT
    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, in_commit_timestamps=True)  # version 1 enables

    v0 = _commit_lines(source_dir, 0)
    assert "inCommitTimestamp" not in v0[0].get("commitInfo", {})
    v1 = _commit_lines(source_dir, 1)
    assert next(iter(v1[0])) == "commitInfo"
    ict1 = v1[0]["commitInfo"]["inCommitTimestamp"]

    meta = next(l["metaData"] for l in v1 if "metaData" in l)
    cfg = meta["configuration"]
    assert cfg["delta.enableInCommitTimestamps"] == "true"
    assert cfg["delta.inCommitTimestampEnablementVersion"] == "1"
    assert cfg["delta.inCommitTimestampEnablementTimestamp"] == str(ict1)
    proto = next(l["protocol"] for l in v1 if "protocol" in l)
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]

    # a third sync WITHOUT the flag must keep the feature on (no demotion)
    # and carry the enablement markers forward in the rebuilt metaData
    _append_rows(spark, source_dir, 200)
    _sync(spark, source_dir)
    v2 = _commit_lines(source_dir, 2)
    assert v2[0]["commitInfo"]["inCommitTimestamp"] > ict1
    meta2 = next(l["metaData"] for l in v2 if "metaData" in l)
    assert meta2["configuration"]["delta.inCommitTimestampEnablementVersion"] == "1"

    report = check_delta_conformance(spark, source_dir)
    assert not [f for f in report.issues if f.code.startswith("DELTA_ICT")], (
        report.issues
    )


def test_ict_strictly_monotonic_within_one_millisecond(spark, source_dir, monkeypatch):
    _sync(spark, source_dir, in_commit_timestamps=True)
    ict0 = _commit_lines(source_dir, 0)[0]["commitInfo"]["inCommitTimestamp"]

    # freeze the target's wall clock AT the previous commit's millisecond:
    # the next ICT must still advance (spec: strictly monotonically
    # increasing), landing at prev + 1
    import incubator_xtable_spark.targets.delta_target as dt

    monkeypatch.setattr(dt.time, "time", lambda: ict0 / 1000.0)
    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, in_commit_timestamps=True)
    ict1 = _commit_lines(source_dir, 1)[0]["commitInfo"]["inCommitTimestamp"]
    assert ict1 == ict0 + 1


def test_timestamp_time_travel_prefers_ict_over_mtime(spark, source_dir):
    _sync(spark, source_dir, in_commit_timestamps=True)
    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, in_commit_timestamps=True)

    stamps = dict(commit_timestamps(source_dir))
    assert stamps[1] > stamps[0]

    # sabotage the file mtimes REVERSED (a copy/restore can do this):
    # ICT must keep the timeline authoritative
    log = os.path.join(source_dir, "_delta_log")
    os.utime(os.path.join(log, f"{0:020d}.json"), (2_000_000_000, 2_000_000_000))
    os.utime(os.path.join(log, f"{1:020d}.json"), (1_000_000_000, 1_000_000_000))
    assert dict(commit_timestamps(source_dir)) == stamps

    assert version_at_timestamp(source_dir, stamps[0]) == 0
    assert version_at_timestamp(source_dir, stamps[1] - 1) == 0
    assert version_at_timestamp(source_dir, stamps[1]) == 1

    asof = read_delta_as_df(spark, source_dir, as_of_timestamp_ms=stamps[0])
    v0 = read_delta_as_df(spark, source_dir, version=0)
    assert sorted(map(tuple, asof.collect())) == sorted(map(tuple, v0.collect()))

    with pytest.raises(ValueError, match="predates the earliest"):
        version_at_timestamp(source_dir, stamps[0] - 1)
    with pytest.raises(ValueError, match="not both"):
        read_delta_as_df(spark, source_dir, version=1, as_of_timestamp_ms=stamps[1])


def test_ict_conformance_red(spark, source_dir):
    _sync(spark, source_dir, in_commit_timestamps=True)
    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, in_commit_timestamps=True)
    log = os.path.join(source_dir, "_delta_log")

    def rewrite(version: int, mutate) -> list[str]:
        fp = os.path.join(log, f"{version:020d}.json")
        with open(fp, encoding="utf-8") as fh:
            original = fh.readlines()
        lines = [json.loads(ln) for ln in original]
        mutate(lines)
        with open(fp, "w", encoding="utf-8") as fh:
            fh.writelines(json.dumps(l) + "\n" for l in lines)
        return original

    def restore(version: int, original: list[str]) -> None:
        with open(os.path.join(log, f"{version:020d}.json"), "w", encoding="utf-8") as fh:
            fh.writelines(original)

    def codes():
        return {f.code for f in check_delta_conformance(spark, source_dir).issues}

    # (a) ICT stripped from a commit
    orig = rewrite(1, lambda ls: ls[0]["commitInfo"].pop("inCommitTimestamp"))
    assert "DELTA_ICT_MISSING" in codes()
    restore(1, orig)

    # (b) monotonicity broken
    def lower(ls):
        ls[0]["commitInfo"]["inCommitTimestamp"] = 1

    orig = rewrite(1, lower)
    assert "DELTA_ICT_NOT_MONOTONIC" in codes()
    restore(1, orig)

    # (c) writer feature not declared
    def strip_feat(ls):
        for l in ls:
            if "protocol" in l:
                l["protocol"]["writerFeatures"] = [
                    f for f in l["protocol"]["writerFeatures"] if f != "inCommitTimestamp"
                ]

    orig = rewrite(0, strip_feat)
    assert "DELTA_ICT_PROTOCOL" in codes()
    restore(0, orig)

    assert not [c for c in codes() if c.startswith("DELTA_ICT")]


def test_pre_ict_future_mtime_cannot_inflate_post_ict_timestamps(spark, source_dir):
    """ADVICE r10: after ICT enablement the ICT is the SOLE timestamp
    authority — a pre-enablement commit file whose mtime drifted into
    the future (copy/backfill, exactly the drift ICT neutralizes) must
    not inflate post-enablement effective timestamps through the
    running-max mtime adjustment."""
    _sync(spark, source_dir)  # v0: no ICT (mtime era)
    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, in_commit_timestamps=True)  # v1: ICT era begins

    stamps = dict(commit_timestamps(source_dir))
    log = os.path.join(source_dir, "_delta_log")
    ict_v1 = stamps[1]

    # sabotage: v0's mtime jumps ~30 years into the future
    far_future = 2_000_000_000  # seconds -> year 2033
    os.utime(os.path.join(log, f"{0:020d}.json"), (far_future, far_future))

    after = dict(commit_timestamps(source_dir))
    # v0 (pre-ICT era) legitimately reflects its adjusted mtime...
    assert after[0] == far_future * 1000
    # ...but v1's effective timestamp stays its ICT, NOT the running max
    assert after[1] == ict_v1
    # and timestamp time travel keeps resolving v1 by its ICT (the eras
    # search independently: the drifted pre-ICT prefix can neither
    # shadow the ICT suffix nor eject it as "before the earliest commit")
    assert version_at_timestamp(source_dir, ict_v1) == 1
    assert version_at_timestamp(source_dir, ict_v1 + 10_000) == 1
    # below the ICT era only the (drifted) mtime prefix remains: nothing
    # there claims a timestamp this old, so the reader refuses
    with pytest.raises(ValueError, match="predates the earliest"):
        version_at_timestamp(source_dir, ict_v1 - 1)
