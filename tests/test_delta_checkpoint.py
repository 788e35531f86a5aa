"""Delta checkpoint tests: spec checkpoint parquet + _last_checkpoint
pointer, read equivalence through/around checkpoints, time travel below
the checkpoint version."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from incubator_xtable_spark.model.core import TableFormat
from incubator_xtable_spark.sources.delta_source import (
    list_log_versions,
    live_files_df,
    read_delta_as_df,
    read_last_checkpoint,
)
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionController
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget

from .conftest import SF_SMOKE


def test_checkpoint_written_and_read(spark, tmp_path):
    d = str(tmp_path / "cp_table")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.parquet(d)
    source = ParquetConversionSource(spark, d, name="region")
    target = DeltaConversionTarget(spark, d, checkpoint_interval=3)
    controller = ConversionController()
    controller.sync(source, {TableFormat.DELTA: target})

    base = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    # drive 5 more commits (versions 1..5); checkpoint lands at v3
    for i in range(5):
        base.withColumn("r_regionkey", F.col("r_regionkey") + 100 + i).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        controller.sync(source, {TableFormat.DELTA: target})

    versions = list_log_versions(d)
    assert max(versions) == 5
    cp = read_last_checkpoint(d)
    assert cp is not None and cp["version"] == 3
    assert os.path.exists(os.path.join(d, "_delta_log", f"{3:020d}.checkpoint.parquet"))

    # reads through the checkpoint path match raw parquet
    a = sorted(map(tuple, spark.read.parquet(d).collect()))
    b = sorted(map(tuple, read_delta_as_df(spark, d).collect()))
    assert a == b and len(a) == 30

    # live file count at head = 6 files
    assert live_files_df(spark, d).count() == 6

    # time travel BELOW the checkpoint still replays JSON correctly
    assert read_delta_as_df(spark, d, version=1).count() == 10
    assert read_delta_as_df(spark, d, version=3).count() == 20

    # checkpoint parquet holds metaData + protocol + live adds at v3
    cp_df = spark.read.parquet(os.path.join(d, "_delta_log", f"{3:020d}.checkpoint.parquet"))
    kinds = cp_df.select(
        F.col("add.path").isNotNull().alias("is_add"),
        F.col("metaData.schemaString").isNotNull().alias("is_meta"),
        F.col("protocol.minReaderVersion").isNotNull().alias("is_proto"),
    ).collect()
    assert sum(1 for r in kinds if r["is_add"]) == 4  # live files at v3
    assert sum(1 for r in kinds if r["is_meta"]) == 1
    assert sum(1 for r in kinds if r["is_proto"]) == 1
    assert cp["size"] == len(kinds)
