"""CLI (RunSync parity) + catalog sync tests."""

from __future__ import annotations

import json
import subprocess
import sys

from pyspark.sql import functions as F

from incubator_xtable_spark.catalog.sync_client import (
    CatalogTableIdentifier,
    SparkCatalogSyncClient,
    sync_table_to_catalog,
)
from incubator_xtable_spark.run_sync import _parse_mini_yaml, parse_partition_spec
from incubator_xtable_spark.model.core import PartitionTransformType

from .conftest import SF_SMOKE


def test_mini_yaml_parses_reference_shape():
    cfg = _parse_mini_yaml(
        """
sourceFormat: PARQUET
targetFormats:
  - DELTA
datasets:
  - tableBasePath: /data/t1
    tableName: t1
  - tableBasePath: /data/t2
    tableName: t2
    partitionSpec: ts:DAY:yyyy-MM-dd
"""
    )
    assert cfg["sourceFormat"] == "PARQUET"
    assert cfg["targetFormats"] == ["DELTA"]
    assert cfg["datasets"][1]["partitionSpec"] == "ts:DAY:yyyy-MM-dd"


def test_partition_spec_parser():
    fields = parse_partition_spec("level:VALUE,ts:DAY:yyyy-MM-dd")
    assert fields[0].source_field == "level"
    assert fields[0].transform == PartitionTransformType.VALUE
    assert fields[1].transform == PartitionTransformType.DAY
    assert fields[1].date_format == "yyyy-MM-dd"


def test_run_sync_cli_end_to_end(spark, tmp_path):
    table_dir = tmp_path / "cli_table"
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .repartition(2)
        .write.mode("overwrite")
        .parquet(str(table_dir))
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""
sourceFormat: PARQUET
targetFormats:
  - DELTA
datasets:
  - tableBasePath: {table_dir}
    tableName: nation_cli
"""
    )
    proc = subprocess.run(
        [sys.executable, "-m", "incubator_xtable_spark.run_sync", "--config", str(cfg)],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines and lines[0]["status"] == "SUCCESS" and lines[0]["target"] == "DELTA"

    # the produced delta log is readable back
    from incubator_xtable_spark.sources.delta_source import read_delta_as_df

    assert read_delta_as_df(spark, str(table_dir)).count() == 25


def test_catalog_sync_parquet_and_delta(spark, tmp_path):
    table_dir = str(tmp_path / "cat_table")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.parquet(table_dir)

    client = SparkCatalogSyncClient(spark)
    ident = CatalogTableIdentifier(database="default", table="region_cat")
    sync_table_to_catalog(client, ident, table_dir, "PARQUET")
    assert client.get_table(ident) is not None
    assert spark.table("default.region_cat").count() == 5
    # re-sync path (refresh)
    sync_table_to_catalog(client, ident, table_dir, "PARQUET")
    assert spark.table("default.region_cat").count() == 5
    client.drop_table(ident)
    assert client.get_table(ident) is None

    # delta-format registration via log-replay view
    from incubator_xtable_spark.model.core import TableFormat
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget

    ConversionController().sync(
        ParquetConversionSource(spark, table_dir),
        {TableFormat.DELTA: DeltaConversionTarget(spark, table_dir)},
    )
    ident2 = CatalogTableIdentifier(database="default", table="region_delta")
    sync_table_to_catalog(client, ident2, table_dir, "DELTA")
    assert spark.table("region_delta").count() == 5
