"""iceberg_remove_orphan_files (sync/retention.py): the delta_vacuum
analog — after snapshot expiry, unreferenced manifests and superseded
engine rewrite outputs are reclaimed; external source files are only
reported (ownership rule); the age guard protects in-flight commits."""

from __future__ import annotations

import os

from incubator_xtable_spark.model.conformance import check_iceberg_conformance
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
from incubator_xtable_spark.sources.iceberg_source import read_iceberg_as_df
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.sync.retention import (
    iceberg_expire_snapshots,
    iceberg_remove_orphan_files,
    iceberg_rewrite_data_files,
)

from .conftest import SF_SMOKE


def _sync(spark, d):
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    res = ConversionController().sync(
        ParquetConversionSource(spark, d, name="nation"),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, d, table_name="nation")},
    )
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS


def _keys(df):
    return sorted(r["n_nationkey"] for r in df.select("n_nationkey").collect())


def test_orphan_removal_after_expiry(spark, tmp_path):
    d = str(tmp_path / "ice_orphans")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").repartition(3).write.parquet(d)
    _sync(spark, d)
    out = iceberg_rewrite_data_files(spark, d, target_file_bytes=64 * 1024 * 1024)
    assert out["instant" if "instant" in out else "added"]  # rewrite happened
    before = _keys(read_iceberg_as_df(spark, d))

    # nothing is orphaned while every snapshot is retained
    res0 = iceberg_remove_orphan_files(spark, d)
    assert res0["orphans"] == [] and res0["deleted"] is False

    expired = iceberg_expire_snapshots(d, keep_last=1)
    assert expired
    res1 = iceberg_remove_orphan_files(spark, d)  # dry run
    # expired snapshots' manifests linger under metadata/ -> orphans
    assert any(p.endswith(".avro") for p in res1["orphans"]), res1["orphans"]
    # the REPLACED original source files are external: reported, kept
    assert res1["skipped_external"], res1
    for rel in res1["orphans"] + res1["skipped_external"]:
        assert os.path.exists(os.path.join(d, rel)), rel  # dry run touched nothing

    # age guard: everything here is seconds old -> filtered out entirely
    res_age = iceberg_remove_orphan_files(spark, d, older_than_ms=3 * 24 * 3600 * 1000)
    assert res_age["orphans"] == [] and res_age["skipped_external"] == []

    res2 = iceberg_remove_orphan_files(spark, d, dry_run=False)
    assert res2["orphans"] == res1["orphans"] and res2["deleted"] is True
    for rel in res2["orphans"]:
        assert not os.path.exists(os.path.join(d, rel)), rel
    for rel in res2["skipped_external"]:
        assert os.path.exists(os.path.join(d, rel)), rel

    # head read parity + conformance after the reclaim
    assert _keys(read_iceberg_as_df(spark, d)) == before
    report = check_iceberg_conformance(spark, d)
    assert report.passed, [(i.code, i.detail) for i in report.issues]


def test_cli_orphans_defaults_to_age_guard(spark, tmp_path, capsys):
    """ADVICE r12: `maintenance orphans --no-dry-run` must default to a
    3-day age filter (real Iceberg's in-flight-commit guard) — a run
    racing a live commit must not delete a just-written manifest.
    --older-than-ms 0 reaches the unguarded path explicitly."""
    import json

    from incubator_xtable_spark.run_sync import run_maintenance

    d = str(tmp_path / "ice_cli_orphans")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").repartition(3).write.parquet(d)
    _sync(spark, d)
    iceberg_rewrite_data_files(spark, d, target_file_bytes=64 * 1024 * 1024)
    iceberg_expire_snapshots(d, keep_last=1)

    # default: the seconds-old orphans are age-filtered -> nothing deleted
    run_maintenance(["orphans", "--path", d, "--no-dry-run"])
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["orphans"] == []

    # explicit 0 disables the guard and reclaims them
    run_maintenance(["orphans", "--path", d, "--no-dry-run", "--older-than-ms", "0"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert any(p.endswith(".avro") for p in out2["orphans"]), out2
    for rel in out2["orphans"]:
        assert not os.path.exists(os.path.join(d, rel)), rel


def test_superseded_rewrite_output_is_reclaimed(spark, tmp_path):
    d = str(tmp_path / "ice_orphans2")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").repartition(3).write.parquet(d)
    _sync(spark, d)
    # generation 1: split into TWO small rewritten files...
    live = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    total = sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    out1 = iceberg_rewrite_data_files(
        spark, d, target_file_bytes=max(1, total // 2), min_file_bytes=64 * 1024 * 1024
    )
    gen1 = [p for p in out1["added"] if "rewritten-" in p]
    assert len(gen1) >= 2
    # ...generation 2 merges them into one (they are small candidates now)
    out2 = iceberg_rewrite_data_files(spark, d, target_file_bytes=64 * 1024 * 1024)
    removed_names = {os.path.basename(r) for r in out2["removed"]}
    assert {os.path.basename(p) for p in gen1} <= removed_names, (gen1, out2)

    iceberg_expire_snapshots(d, keep_last=1)
    res = iceberg_remove_orphan_files(spark, d, dry_run=False)
    # the superseded ENGINE-created rewrite outputs are physically gone
    reclaimed = {os.path.basename(p) for p in res["orphans"] if "rewritten-" in p}
    assert {os.path.basename(p) for p in gen1} <= reclaimed, res
    for p in gen1:
        assert not os.path.exists(p)
    assert len(_keys(read_iceberg_as_df(spark, d))) == 25
    assert live.count() == 25  # the original source table is untouched
