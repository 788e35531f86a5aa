"""SparkSession factory tuned for the harness (local[N]) but configured the
way we'd configure a 1000-executor cluster job: AQE on, sensible shuffle
parallelism, Arrow transfers on, UTC session time.

On a real cluster only ``master`` and memory sizing change; everything else
here is scale-neutral.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "incubator_xtable_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # PySpark 4's per-DataFrame-call origin capture walks the Python
        # stack and makes an extra py4j round trip on EVERY API call —
        # measured ~20% of a cold metadata sync. Results are unaffected
        # (error messages just lose user call-site lines). Static conf, so
        # it only applies to sessions this factory builds.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    return builder.getOrCreate()
