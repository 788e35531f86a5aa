"""Iceberg write-audit-publish (WAP) over spec `refs`: staged branch
commits (IcebergConversionTarget(branch=...)), main isolation, and the
fast-forward publish step (ancestry-checked, audit-hook aborted).

Reference anchor: the reference's Iceberg target always advances main
(IcebergConversionTarget.java commits via Transaction); branch staging +
fast-forward publish is the spec-refs workflow (Iceberg's
fast_forward / WAP pattern) layered on the r5 refs machinery.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from incubator_xtable_spark.model.conformance import check_iceberg_conformance
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.iceberg_source import read_iceberg_as_df
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.iceberg_target import (
    IcebergConversionTarget,
    publish_branch,
    read_table_metadata,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def source_dir(spark, tmp_path):
    d = str(tmp_path / "wap_src")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.parquet(d)
    return d


def _sync(spark, source_dir: str, branch: str = "main"):
    source = ParquetConversionSource(spark, source_dir, name="region")
    target = IcebergConversionTarget(spark, source_dir, branch=branch)
    res = ConversionController().sync(source, {TableFormat.ICEBERG: target})
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS, (
        res[TableFormat.ICEBERG].error
    )


def _append_rows(spark, source_dir: str, shift: int) -> None:
    (
        spark.read.parquet(f"{SF_SMOKE}/region.parquet")
        .withColumn("r_regionkey", F.col("r_regionkey") + shift)
        .coalesce(1)
        .write.mode("append")
        .parquet(source_dir)
    )


def test_wap_stage_audit_publish(spark, source_dir):
    _sync(spark, source_dir)  # main @ 5 rows
    assert read_iceberg_as_df(spark, source_dir).count() == 5

    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, branch="audit")  # staged: 10 rows on audit

    # main readers are isolated from the staged state
    assert read_iceberg_as_df(spark, source_dir).count() == 5
    assert read_iceberg_as_df(spark, source_dir, ref="audit").count() == 10
    meta = read_table_metadata(source_dir)
    assert meta["refs"]["main"]["snapshot-id"] == meta["current-snapshot-id"]
    audit_sid = meta["refs"]["audit"]["snapshot-id"]
    assert audit_sid != meta["current-snapshot-id"]
    # the staged snapshot's parent is main's head (forked, not orphaned)
    staged = next(s for s in meta["snapshots"] if s["snapshot-id"] == audit_sid)
    assert staged["parent-snapshot-id"] == meta["current-snapshot-id"]
    report = check_iceberg_conformance(spark, source_dir)
    assert report.passed, report.issues

    # audit hook aborts: nothing changes
    with pytest.raises(RuntimeError, match="audit failed"):
        publish_branch(
            source_dir,
            "audit",
            validate=lambda: (_ for _ in ()).throw(RuntimeError("audit failed")),
        )
    assert read_iceberg_as_df(spark, source_dir).count() == 5

    # publish: main fast-forwards, staged ref dropped
    sid = publish_branch(source_dir, "audit", drop_branch=True)
    assert sid == audit_sid
    assert read_iceberg_as_df(spark, source_dir).count() == 10
    meta2 = read_table_metadata(source_dir)
    assert meta2["current-snapshot-id"] == audit_sid
    assert meta2["refs"]["main"]["snapshot-id"] == audit_sid
    assert "audit" not in meta2["refs"]
    # snapshot-log gained exactly the publish entry
    assert [e["snapshot-id"] for e in meta2["snapshot-log"]][-1] == audit_sid
    report = check_iceberg_conformance(spark, source_dir)
    assert report.passed, report.issues


def test_wap_branch_only_table_then_first_publish(spark, source_dir):
    """Every commit staged from creation: no main head (current -1) until
    the first publish creates it."""
    _sync(spark, source_dir, branch="staging")
    meta = read_table_metadata(source_dir)
    assert meta["current-snapshot-id"] == -1
    assert "main" not in meta["refs"]
    assert meta["snapshot-log"] == []
    assert read_iceberg_as_df(spark, source_dir, ref="staging").count() == 5
    report = check_iceberg_conformance(spark, source_dir)
    assert report.passed, report.issues

    publish_branch(source_dir, "staging")
    assert read_iceberg_as_df(spark, source_dir).count() == 5
    meta2 = read_table_metadata(source_dir)
    assert meta2["refs"]["main"]["snapshot-id"] == meta2["current-snapshot-id"]
    # a second staged sync on the SAME branch advances its own lineage
    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, branch="staging")
    meta3 = read_table_metadata(source_dir)
    s2 = meta3["refs"]["staging"]["snapshot-id"]
    staged = next(s for s in meta3["snapshots"] if s["snapshot-id"] == s2)
    assert staged["parent-snapshot-id"] == meta2["current-snapshot-id"]
    # the staged snapshot carries BOTH commits' files (carry-forward must
    # key on the branch head, not main — r10 self-review regression)
    assert read_iceberg_as_df(spark, source_dir, ref="staging").count() == 10
    assert read_iceberg_as_df(spark, source_dir).count() == 5
    # a third staged sync stacks on the second without a publish between
    _append_rows(spark, source_dir, 200)
    _sync(spark, source_dir, branch="staging")
    assert read_iceberg_as_df(spark, source_dir, ref="staging").count() == 15
    publish_branch(source_dir, "staging")
    assert read_iceberg_as_df(spark, source_dir).count() == 15


def test_wap_publish_refuses_non_fast_forward(spark, source_dir):
    _sync(spark, source_dir)
    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir, branch="audit")

    # fabricate a diverged main: a head that is NOT on the audit branch's
    # ancestry (clone of the original snapshot under a new id)
    from incubator_xtable_spark.targets.iceberg_target import (
        current_metadata_version,
        metadata_dir,
    )

    v = current_metadata_version(source_dir)
    path = os.path.join(metadata_dir(source_dir), f"v{v}.metadata.json")
    with open(path, encoding="utf-8") as fh:
        meta = json.load(fh)
    base = meta["snapshots"][0]
    fake = dict(base, **{"snapshot-id": 999_999_999})
    meta["snapshots"].append(fake)
    meta["current-snapshot-id"] = fake["snapshot-id"]
    meta["refs"]["main"] = {"snapshot-id": fake["snapshot-id"], "type": "branch"}
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)

    with pytest.raises(ValueError, match="not an ancestor"):
        publish_branch(source_dir, "audit")

    # tags cannot be published from
    meta["refs"]["pin"] = {"snapshot-id": base["snapshot-id"], "type": "tag"}
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="not a branch"):
        publish_branch(source_dir, "pin")


def test_create_and_remove_refs(spark, source_dir):
    """Tag-what-shipped: create_ref pins a tag after publish, branches can
    move, type flips and main removal refuse, remove_ref drops."""
    from incubator_xtable_spark.targets.iceberg_target import create_ref, remove_ref

    _sync(spark, source_dir)
    meta = read_table_metadata(source_dir)
    s1 = meta["current-snapshot-id"]

    sid = create_ref(source_dir, "release-1")  # tag at main head
    assert sid == s1
    meta = read_table_metadata(source_dir)
    assert meta["refs"]["release-1"] == {"snapshot-id": s1, "type": "tag"}
    assert read_iceberg_as_df(spark, source_dir, ref="release-1").count() == 5

    _append_rows(spark, source_dir, 100)
    _sync(spark, source_dir)
    s2 = read_table_metadata(source_dir)["current-snapshot-id"]
    assert s2 != s1
    # the tag still pins the OLD state after main advanced
    assert read_iceberg_as_df(spark, source_dir, ref="release-1").count() == 5

    # a branch ref with an age limit
    create_ref(source_dir, "dev", ref_type="branch", max_ref_age_ms=1000)
    assert read_table_metadata(source_dir)["refs"]["dev"]["max-ref-age-ms"] == 1000

    with pytest.raises(ValueError, match="refusing to change its type"):
        create_ref(source_dir, "release-1", ref_type="branch")
    with pytest.raises(ValueError, match="main must remain a branch"):
        create_ref(source_dir, "main", ref_type="tag")
    with pytest.raises(ValueError, match="not in table"):
        create_ref(source_dir, "bogus", snapshot_id=123456)
    with pytest.raises(ValueError, match="main"):
        remove_ref(source_dir, "main")

    remove_ref(source_dir, "release-1")
    assert "release-1" not in read_table_metadata(source_dir)["refs"]
    from incubator_xtable_spark.model.conformance import check_iceberg_conformance

    report = check_iceberg_conformance(spark, source_dir)
    assert report.passed, report.issues
