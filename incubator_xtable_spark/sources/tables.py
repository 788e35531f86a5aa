"""Loaders for the harness parquet tables (see TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def _pin_session_confs(spark: SparkSession) -> None:
    # Pinned unconditionally for every table load (not just events): a
    # vanilla harness session that never touches events must still run
    # tz-sensitive queries (date_trunc, windows) against the same UTC
    # wall clock the DuckDB oracle sees.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    _pin_session_confs(spark)
    if name == "events":
        # The events table's ts column has shipped in two flavors across
        # testdata generations: TIMESTAMP(NANOS) (Spark rejects without
        # nanosAsLong; floor-truncate to micros exactly like DuckDB) and
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) (arrives as
        # TIMESTAMP_NTZ). Normalize both to TIMESTAMP_LTZ under a pinned
        # UTC session so unix_micros/date_trunc/windows are deterministic
        # and bit-match the DuckDB oracle's naive-timestamp view.
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # wall-clock == UTC instant under the pinned session tz.
            # Explicit TimestampType (LTZ): a bare cast("timestamp")
            # resolves via spark.sql.timestampType and becomes a no-op
            # if a harness session set that conf to TIMESTAMP_NTZ.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every harness table as a temp view (mirrors the DuckDB
    oracle environment, where the same names are pre-registered views)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
