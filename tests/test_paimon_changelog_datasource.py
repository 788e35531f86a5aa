"""`spark.readStream.format("paimon_changelog")`
(streaming/paimon_changelog_datasource.py): sequential snapshot offsets,
pure-python snapshot/manifest planning (read-only PaimonConversionSource
with spark=None), executor-side pyarrow reads of changelog/_VALUE_KIND
files. Differentials against read_paimon_changelog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from incubator_xtable_spark.sources.paimon_source import read_paimon_changelog
from incubator_xtable_spark.streaming.paimon_changelog_datasource import (
    PaimonChangelogDataSource,
)

from .paimon_testtable import PaimonTestTable
from .test_paimon_depth import FIELDS, _mkrows


def _register(spark):
    try:
        spark.dataSource.register(PaimonChangelogDataSource)
    except Exception:
        pass


def _drain(spark, base, cp, name, starting=None):
    reader = spark.readStream.format("paimon_changelog").option("path", base)
    if starting is not None:
        reader = reader.option("startingSnapshot", str(starting))
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"select * from {name}")


def test_stream_equals_batch_changelog(spark, tmp_path):
    """PK table: append + explicit changelog commit; the stream replays
    both snapshots value-identical to the batch read."""
    t = PaimonTestTable(
        spark, str(tmp_path / "cl"), FIELDS, partition_keys=["level"], primary_keys=["id"]
    ).create()
    sid1, _ = t.append(_mkrows(0, 3), level=0)
    sid2 = t.commit_with_changelog(
        [],
        [
            ("+I", {"id": 9, "name": "n-9", "level": "INFO"}),
            ("-U", {"id": 1, "name": "n-1", "level": "INFO"}),
            ("+U", {"id": 1, "name": "updated-1", "level": "INFO"}),
            ("-D", {"id": 0, "name": "n-0", "level": "INFO"}),
        ],
    )
    # snapshot 1 is a PK delta without changelog -> start after it, like
    # a consumer that bootstrapped from the snapshot view
    _register(spark)
    got = _drain(spark, t.base, str(tmp_path / "cp"), "pm_cl_eq", starting=sid1)
    rows = sorted(
        (r["id"], r["name"], r["_change_type"], r["_commit_snapshot_id"])
        for r in got.collect()
    )
    want = sorted(
        (r["id"], r["name"], r["_change_type"], sid2)
        for r in read_paimon_changelog(spark, t.base, sid2).collect()
    )
    assert rows == want and len(rows) == 4


def test_append_only_streams_inserts(spark, tmp_path):
    t = PaimonTestTable(spark, str(tmp_path / "ap"), FIELDS, partition_keys=["level"]).create()
    t.append(_mkrows(0, 4))
    t.append(_mkrows(4, 3))
    _register(spark)
    got = _drain(spark, t.base, str(tmp_path / "cp"), "pm_cl_ap")
    rows = sorted((r["id"], r["_change_type"], r["_commit_snapshot_id"]) for r in got.collect())
    assert [i for i, _, _ in rows] == list(range(7))
    assert {c for _, c, _ in rows} == {"insert"}
    assert len({s for _, _, s in rows}) == 2


def test_pk_delta_without_producer_refuses(spark, tmp_path):
    t = PaimonTestTable(
        spark, str(tmp_path / "pk"), FIELDS, partition_keys=["level"], primary_keys=["id"]
    ).create()
    t.append(_mkrows(0, 3), level=0)
    _register(spark)
    q = (
        spark.readStream.format("paimon_changelog")
        .option("path", t.base)
        .load()
        .writeStream.format("memory")
        .queryName("pm_cl_refuse")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="changelog"):
        q.awaitTermination(300)
        raise RuntimeError(str(q.exception()))
