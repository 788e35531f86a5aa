"""delta_restore (data back to an old version in one dataChange=true
commit, current metadata kept, CDF reports the churn) and Hudi
savepoints (archival pinning — the Iceberg-tag analog)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from incubator_xtable_spark.model.conformance import check_delta_conformance
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.delta_source import (
    list_log_versions,
    read_delta_as_df,
    read_delta_cdf,
)
from incubator_xtable_spark.sources.hudi_source import read_hudi_as_df
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.sync.retention import (
    delta_restore,
    hudi_archive_timeline,
    hudi_create_savepoint,
    hudi_delete_savepoint,
    hudi_list_savepoints,
)
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget
from incubator_xtable_spark.targets.hudi_target import (
    HudiConversionTarget,
    list_completed_instants,
)

from .conftest import SF_SMOKE


def _sync(spark, d, fmt, tgt):
    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="nation"), {fmt: tgt}
    )
    assert res[fmt].status == SyncStatusCode.SUCCESS, res[fmt].error


def _keys(df):
    return sorted(r["n_nationkey"] for r in df.select("n_nationkey").collect())


def test_delta_restore_round_trip(spark, tmp_path):
    d = str(tmp_path / "restore")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").repartition(2).write.parquet(d)
    _sync(spark, d, TableFormat.DELTA, DeltaConversionTarget(spark, d))
    v0 = max(list_log_versions(d))
    before = _keys(read_delta_as_df(spark, d))

    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .withColumn("n_nationkey", F.col("n_nationkey") + 100)
        .coalesce(1)
        .write.mode("append")
        .parquet(d)
    )
    _sync(spark, d, TableFormat.DELTA, DeltaConversionTarget(spark, d))
    assert len(_keys(read_delta_as_df(spark, d))) == 50

    out = delta_restore(spark, d, v0)
    assert out["version"] == max(list_log_versions(d))
    assert out["removed"] and not out["readded"]
    assert _keys(read_delta_as_df(spark, d)) == before
    # restore IS row churn: CDF shows the appended rows as deletes
    cdf = read_delta_cdf(spark, d, out["version"])
    kinds = {r["_change_type"] for r in cdf.select("_change_type").collect()}
    assert kinds == {"delete"} and cdf.count() == 25
    report = check_delta_conformance(spark, d)
    assert report.passed, [(i.code, i.detail) for i in report.issues]

    # restoring FORWARD refuses; vacuum-broken restores refuse loudly
    with pytest.raises(ValueError, match="not before head"):
        delta_restore(spark, d, out["version"])


def test_delta_restore_refuses_after_vacuum(spark, tmp_path):
    import json
    import time

    d = str(tmp_path / "restore_vac")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").coalesce(1).write.parquet(d)
    _sync(spark, d, TableFormat.DELTA, DeltaConversionTarget(spark, d))
    v0 = max(list_log_versions(d))
    old_file = next(
        f for f in os.listdir(d) if f.endswith(".parquet") and f.startswith("part-")
    )
    # hand-written DELETE commit dropping the file, then physically unlink
    # it (the post-vacuum condition)
    with open(os.path.join(d, "_delta_log", f"{v0 + 1:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "commitInfo": {
                        "timestamp": int(time.time() * 1000),
                        "operation": "DELETE",
                    }
                }
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "remove": {
                        "path": old_file,
                        "deletionTimestamp": int(time.time() * 1000),
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    os.unlink(os.path.join(d, old_file))
    assert _keys(read_delta_as_df(spark, d)) == []
    # v0's file is physically gone: restore must refuse, not half-commit
    with pytest.raises(ValueError, match="vacuumed"):
        delta_restore(spark, d, v0)
    assert max(list_log_versions(d)) == v0 + 1  # nothing was written


def test_hudi_savepoint_pins_archival(spark, tmp_path):
    d = str(tmp_path / "sp")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").repartition(2).write.parquet(d)
    _sync(spark, d, TableFormat.HUDI, HudiConversionTarget(spark, d, table_name="nation"))
    for shift in (100, 200, 300):
        (
            spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
            .withColumn("n_nationkey", F.col("n_nationkey") + shift)
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
        _sync(spark, d, TableFormat.HUDI, HudiConversionTarget(spark, d, table_name="nation"))
    instants = [i for i, _ in list_completed_instants(d)]
    assert len(instants) == 4
    pinned = instants[1]
    hudi_create_savepoint(d, pinned, comment="keep for audit")
    assert hudi_list_savepoints(d) == [pinned]

    archived = hudi_archive_timeline(d, keep_last=1)
    # the savepointed instant stayed; the other old instants archived
    remaining = [i for i, _ in list_completed_instants(d)]
    assert pinned in remaining
    assert instants[0] in archived and instants[2] in archived
    # time travel to the pinned instant still resolves from the ACTIVE
    # timeline
    got = _keys(read_hudi_as_df(spark, d, as_of_instant=pinned))
    assert got == list(range(25)) + list(range(100, 125))

    # dropping the savepoint unpins it for the next archival pass
    hudi_delete_savepoint(d, pinned)
    assert hudi_list_savepoints(d) == []
    archived2 = hudi_archive_timeline(d, keep_last=1)
    assert pinned in archived2

    # savepointing a non-existent instant refuses
    with pytest.raises(ValueError, match="not a completed instant"):
        hudi_create_savepoint(d, "19990101000000000")
