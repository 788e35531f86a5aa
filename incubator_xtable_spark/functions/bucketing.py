"""Bucketed co-located joins: pre-shuffle fact tables once so repeated
joins on the same key skip their shuffle entirely.

This is the 100 TB pattern the prompt calls out: a fact table joined on
the same key by many queries should be written bucketed (CLUSTERED BY) so
every subsequent join reads co-located buckets instead of re-shuffling
600 TB of intermediate. On local[] the same API works against the
session warehouse.

Spark-first: `DataFrameWriter.bucketBy` + `spark.table` reads preserve the
bucketing metadata; Catalyst elides the Exchange on the bucketed side(s)
when bucket specs line up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """True iff joining the two bucketed tables on their bucket key plans
    NO shuffle exchange on either side (broadcast side excluded)."""
    import io
    from contextlib import redirect_stdout

    df = spark.table(left_table).join(spark.table(right_table), on)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Exchange hashpartitioning = a shuffle; BroadcastExchange is fine
    return "Exchange hashpartitioning" not in plan
