"""hudi_clean (sync/retention.py): KEEP_LATEST_COMMITS cleaning with
the conversion-engine ownership rule — engine-created rewrite artifacts
(clustered-*.parquet) that left every retained view are deleted,
EXTERNAL source files are only reported, savepoints pin their views,
and a real requested->inflight->completed ``.clean`` instant lands in
the table's timeline layout."""

from __future__ import annotations

import glob
import json
import os
import time

import pytest

from pyspark.sql import functions as F

from incubator_xtable_spark.model.conformance import check_hudi_conformance
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.hudi_source import read_hudi_as_df
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.sync.retention import (
    hudi_clean,
    hudi_cluster_small_files,
    hudi_create_savepoint,
    hudi_delete_savepoint,
)
from incubator_xtable_spark.targets.hudi_target import (
    HudiConversionTarget,
    list_completed_instants,
    timeline_dir,
)

from .conftest import SF_SMOKE


def _sync(spark, d, **tgt_kw):
    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="nation"),
        {TableFormat.HUDI: HudiConversionTarget(spark, d, table_name="nation", **tgt_kw)},
    )
    assert res[TableFormat.HUDI].status == SyncStatusCode.SUCCESS


def _staged_two_generations(spark, tmp_path, **tgt_kw):
    """4-file table -> cluster (clustered-A) -> 2 appended files ->
    cluster again (clustered-B supersedes A + appends)."""
    d = str(tmp_path / "hudi_clean")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").repartition(4).write.parquet(d)
    _sync(spark, d, **tgt_kw)
    out1 = hudi_cluster_small_files(spark, d, target_file_bytes=64 * 1024 * 1024)
    assert out1["instant"] is not None and len(out1["added"]) == 1
    clustered_a = out1["added"][0]

    pre = set(glob.glob(os.path.join(d, "*.parquet")))
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .withColumn("n_nationkey", F.col("n_nationkey") + 100)
        .repartition(2)
        .write.mode("append")
        .parquet(d)
    )
    future = time.time() + 10
    for p in set(glob.glob(os.path.join(d, "*.parquet"))) - pre:
        os.utime(p, (future, future))
    _sync(spark, d, **tgt_kw)
    out2 = hudi_cluster_small_files(spark, d, target_file_bytes=64 * 1024 * 1024)
    assert out2["instant"] is not None
    assert clustered_a in out2["removed"]
    return d, out1, out2


def _keys(df):
    return sorted(r["n_nationkey"] for r in df.select("n_nationkey").collect())


def test_clean_deletes_engine_artifacts_only(spark, tmp_path):
    d, out1, out2 = _staged_two_generations(spark, tmp_path)
    clustered_a = out1["added"][0]
    before = _keys(read_hudi_as_df(spark, d))
    assert len(before) == 50

    res = hudi_clean(spark, d, keep_last=1)
    assert res["instant"] is not None
    # the superseded clustering output is gone; external files survive
    assert res["deleted"] == [clustered_a]
    assert not os.path.exists(os.path.join(d, clustered_a))
    assert res["skipped_external"]
    for rel in res["skipped_external"]:
        assert os.path.exists(os.path.join(d, rel)), rel
        assert "clustered-" not in os.path.basename(rel)
    # head reads unaffected; pre-boundary time travel now refuses
    assert _keys(read_hudi_as_df(spark, d)) == before
    with pytest.raises(Exception, match="clustered-|PATH_NOT_FOUND|does not exist"):
        read_hudi_as_df(spark, d, as_of_instant=out1["instant"]).collect()

    # the .clean instant completed with the engine's JSON payload
    tdir = timeline_dir(d)
    completed = [f for f in os.listdir(tdir) if f.endswith(".clean")]
    assert len(completed) == 1
    with open(os.path.join(tdir, completed[0]), encoding="utf-8") as fh:
        meta = json.load(fh)
    assert meta["policy"] == "KEEP_LATEST_COMMITS"
    assert meta["earliestCommitToRetain"] == res["earliest_retained"]
    assert meta["filesDeleted"] == [clustered_a]
    assert os.path.exists(os.path.join(tdir, f"{res['instant']}.clean.requested"))
    assert os.path.exists(os.path.join(tdir, f"{res['instant']}.clean.inflight"))
    # timeline replay + conformance ignore/pass the clean action
    assert all(a != "clean" for _, a in list_completed_instants(d))
    report = check_hudi_conformance(d)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_savepoint_pins_view_against_clean(spark, tmp_path):
    d, out1, _out2 = _staged_two_generations(spark, tmp_path)
    clustered_a = out1["added"][0]
    hudi_create_savepoint(d, out1["instant"], comment="pin clustering #1")

    res = hudi_clean(spark, d, keep_last=1)
    # the savepointed view still references clustered-A: it must survive
    assert clustered_a not in res["deleted"]
    assert os.path.exists(os.path.join(d, clustered_a))
    before = _keys(read_hudi_as_df(spark, d, as_of_instant=out1["instant"]))
    assert len(before) == 25  # the pinned view still reads

    # drop the pin -> the next clean reclaims it
    hudi_delete_savepoint(d, out1["instant"])
    res2 = hudi_clean(spark, d, keep_last=1)
    assert clustered_a in res2["deleted"]
    assert not os.path.exists(os.path.join(d, clustered_a))


def test_clean_noop_within_retention(spark, tmp_path):
    d = str(tmp_path / "hudi_noop")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").coalesce(1).write.parquet(d)
    _sync(spark, d)
    res = hudi_clean(spark, d, keep_last=10)
    assert res == {
        "instant": None,
        "earliest_retained": None,
        "deleted": [],
        "skipped_external": [],
    }
    assert not [f for f in os.listdir(timeline_dir(d)) if ".clean" in f]


def test_clean_on_v8_timeline(spark, tmp_path):
    d, out1, _out2 = _staged_two_generations(spark, tmp_path, table_version=8)
    res = hudi_clean(spark, d, keep_last=1)
    assert res["deleted"] == [out1["added"][0]]
    tdir = os.path.join(d, ".hoodie", "timeline")
    completed = [f for f in os.listdir(tdir) if f.endswith(".clean")]
    assert len(completed) == 1
    # v8 completed naming embeds the completion instant
    stem = completed[0][: -len(".clean")]
    req, sep, comp = stem.partition("_")
    assert sep and req.isdigit() and comp.isdigit() and comp >= req
    report = check_hudi_conformance(d)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_rollback_pending_removes_torn_markers_only(spark, tmp_path):
    """hudi_rollback_pending (r12): torn requested/inflight markers roll
    back (removed + recorded in a completed .rollback instant); a
    COMPLETED instant's lifecycle markers and instants at/after the
    ``before`` guard stay untouched; idempotent when nothing is torn."""
    from incubator_xtable_spark.sync.retention import hudi_rollback_pending

    d = str(tmp_path / "hudi_rb")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").coalesce(1).write.parquet(d)
    _sync(spark, d)
    tdir = timeline_dir(d)
    completed_markers = {
        f for f in os.listdir(tdir) if f.endswith((".requested", ".inflight"))
    }
    assert completed_markers  # the real commit's own lifecycle markers

    # plant two torn instants (crashed writers) around the guard
    for torn, action in (("19990101000000111", "commit"), ("29990101000000222", "replacecommit")):
        open(os.path.join(tdir, f"{torn}.{action}.requested"), "w").close()
        inflight = "inflight" if action == "commit" else f"{action}.inflight"
        open(os.path.join(tdir, f"{torn}.{inflight}"), "w").close()

    res = hudi_rollback_pending(d, before="29990101000000222")
    assert res["rolled_back"] == ["19990101000000111"]
    assert not [f for f in os.listdir(tdir) if f.startswith("19990101000000111.")]
    # the guarded instant and the completed commit's markers survive
    assert [f for f in os.listdir(tdir) if f.startswith("29990101000000222.")]
    assert completed_markers <= set(os.listdir(tdir))
    rb = [f for f in os.listdir(tdir) if f.endswith(".rollback")]
    assert len(rb) == 1
    with open(os.path.join(tdir, rb[0]), encoding="utf-8") as fh:
        meta = json.load(fh)
    assert meta["instantsRollback"] == ["19990101000000111"]
    assert meta["totalFilesDeleted"] == 0

    # a COMPLETED table service's lifecycle markers are NOT torn: run a
    # real clean (leaves <i>.clean.requested/.inflight beside the
    # completed .clean), then verify rollback leaves them alone instead
    # of deleting a finished clean's record (ADVICE r12 high)
    for _ in range(2):  # push the table past keep_last=1
        (
            spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
        _sync(spark, d)
    from incubator_xtable_spark.sync.retention import hudi_cluster_small_files

    out = hudi_cluster_small_files(spark, d, target_file_bytes=64 * 1024 * 1024)
    assert out["instant"] is not None
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .coalesce(1)
        .write.mode("append")
        .parquet(d)
    )
    _sync(spark, d)
    out2 = hudi_cluster_small_files(spark, d, target_file_bytes=64 * 1024 * 1024)
    assert out2["instant"] is not None
    clean_res = hudi_clean(spark, d, keep_last=1)
    assert clean_res["instant"] is not None
    clean_markers = {
        f"{clean_res['instant']}.clean.requested",
        f"{clean_res['instant']}.clean.inflight",
    }
    assert clean_markers <= set(os.listdir(tdir))

    # second pass takes the remaining torn instant; third is a no-op
    res2 = hudi_rollback_pending(d)
    assert res2["rolled_back"] == ["29990101000000222"]
    # the completed clean's lifecycle markers and payload survived
    assert clean_markers <= set(os.listdir(tdir))
    assert [f for f in os.listdir(tdir) if f.endswith(".clean")]
    for f in os.listdir(tdir):
        if f.endswith(".rollback"):
            with open(os.path.join(tdir, f), encoding="utf-8") as fh:
                assert clean_res["instant"] not in json.load(fh)["instantsRollback"]
    assert hudi_rollback_pending(d) == {"instant": None, "rolled_back": []}
    # table still reads and conforms; replay ignores rollback actions
    # (the clean-then-rollback staging appended nation 3 more times)
    assert len(_keys(read_hudi_as_df(spark, d))) == 100
    assert all(a != "rollback" for _, a in list_completed_instants(d))
    report = check_hudi_conformance(d)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_file_liveness_intervals_match_per_instant_replay(spark, tmp_path):
    """The single-replay interval resolver (r13) must agree with
    live_files_rows at EVERY completed instant — including through
    clustering supersession and MOR-style lifecycles — since hudi_clean
    now derives all retained views from it."""
    from incubator_xtable_spark.sources.hudi_source import (
        file_liveness_intervals,
        live_files_rows,
    )

    d, _out1, _out2 = _staged_two_generations(spark, tmp_path)
    intervals = file_liveness_intervals(d)
    for instant, _a in list_completed_instants(d):
        expect = set()
        for r in live_files_rows(d, instant, include_log_only=True):
            if r.get("path"):
                expect.add(r["path"])
            for lf in r.get("log_files") or []:
                expect.add(lf if isinstance(lf, str) else lf.get("path"))
        got = {
            p
            for p, a, rm in intervals
            if a <= instant and (rm is None or instant < rm)
        }
        assert got == expect, (instant, got ^ expect)
