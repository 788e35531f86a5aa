"""AQE skew-join resilience (VERDICT r8 #5): the TPC-H test data is
uniform, so this plants a pathologically skewed join key — one customer
owning ~50% of all orders — and proves both halves of the 100x posture:

(a) PLAN: with AQE skew-join handling on (thresholds forced low enough
    to trigger at test scale), the executed sort-merge join reports the
    hot partition split (``skew=true`` in the adaptive plan) — i.e. the
    engine's declarative plans stay eligible for Spark's runtime skew
    mitigation (no manual salting needed for join-side skew);
(b) CORRECTNESS: the skewed aggregate still matches DuckDB bit-for-bit
    on the same parquet bytes (decimal money math, per plans/common.py
    cross-engine rules).

The skew rule is DETERMINISTIC (o_orderkey % 2 -> customer 1), so both
engines see identical data — no rand() partition-layout dependence.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .conftest import SF_CORRECTNESS, register_duck_views


def _skewed_orders(spark, out_dir: str) -> str:
    orders = spark.read.parquet(f"{SF_CORRECTNESS}/orders.parquet")
    skewed = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1).cast("long")).otherwise(
            F.col("o_custkey")
        ),
    )
    # 16 output files = 16 map tasks: AQE splits a skewed reduce
    # partition at MAP-OUTPUT granularity, so a single-mapper input is
    # unsplittable no matter how hot the key
    skewed.repartition(16, F.col("o_orderkey")).write.mode("overwrite").parquet(out_dir)
    return out_dir


def test_skewed_join_under_aqe_matches_oracle(spark, duck, tmp_path):
    skew_dir = _skewed_orders(spark, str(tmp_path / "orders_skewed"))

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # test-scale thresholds: sf0.01 partitions are tiny, so force the
        # skew detector to see the hot partition (prod defaults: factor 5,
        # 256 MB threshold — the same mechanism, higher bar)
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # force a shuffle join — a broadcast would hide the skew path
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # the aggregate after the join adds a required distribution; this
        # permits the extra shuffle the skew split then needs
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        customer = spark.read.parquet(f"{SF_CORRECTNESS}/customer.parquet")
        orders = spark.read.parquet(skew_dir)
        res = (
            customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(38,2)")).alias("total_price"),
            )
            .orderBy("c_mktsegment")
        )
        rows = res.collect()
        plan = res._jdf.queryExecution().executedPlan().toString()
        # the hot partition was actually split by AQE's skew handling
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    register_duck_views(duck, SF_CORRECTNESS)
    duck.execute(
        f"CREATE OR REPLACE VIEW orders_skewed AS SELECT * FROM read_parquet('{os.path.join(skew_dir, '*.parquet')}')"
    )
    oracle = duck.execute(
        """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               sum(CAST(o_totalprice AS DECIMAL(38,2))) AS total_price
        FROM customer JOIN orders_skewed ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    ).fetchall()
    got = [(r["c_mktsegment"], r["n_orders"], r["total_price"]) for r in rows]
    assert got == oracle

    # the planted skew is real: customer 1 owns ~half of all orders
    hot = spark.read.parquet(skew_dir).filter(F.col("o_custkey") == 1).count()
    total = spark.read.parquet(skew_dir).count()
    assert hot >= total * 0.45


def test_salted_join_matches_plain_and_spreads_hot_key(spark, tmp_path):
    """Explicit salting (functions/skew.salted_join) for the case AQE
    can't split — a hot key concentrated in few mappers: (a) result
    equals the plain join exactly (inner + left, incl. unmatched left
    rows); (b) the hot key's rows physically land in > 1 shuffle
    partition of the salted plan while the plain plan puts them in one."""
    from incubator_xtable_spark.functions.skew import salted_join

    d = _skewed_orders(spark, str(tmp_path / "salt_orders"))
    orders = spark.read.parquet(d)
    cust = (
        spark.read.parquet(f"{SF_CORRECTNESS}/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = orders.join(cust, "o_custkey").select("o_orderkey", "o_custkey", "c_name")
        salted = salted_join(orders, cust, "o_custkey").select(
            "o_orderkey", "o_custkey", "c_name"
        )
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

        # left join keeps unmatched big-side rows exactly once
        half = cust.filter(F.col("o_custkey") % 2 == 0)
        plain_l = orders.join(half, "o_custkey", "left").select(
            "o_orderkey", "o_custkey", "c_name"
        )
        salted_l = salted_join(orders, half, "o_custkey", how="left").select(
            "o_orderkey", "o_custkey", "c_name"
        )
        assert sorted(
            map(tuple, plain_l.collect())
        ) == sorted(map(tuple, salted_l.collect()))

        # spread: the hot key's rows carry many distinct salt values, so
        # the (key, salt) exchange distributes them across that many
        # reduce partitions — versus exactly 1 partition for the plain
        # key exchange. (Partition ids of the tiny filtered JOIN output
        # are not probeable directly: AQE re-coalesces them.)
        salt_expr = F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in orders.columns])), F.lit(8)
        )
        n_salts_hot = (
            orders.filter(F.col("o_custkey") == 1)
            .select(salt_expr.alias("s"))
            .distinct()
            .count()
        )
        assert n_salts_hot > 1, "hot key did not spread across salt values"
        n_plain_parts = (
            orders.repartition("o_custkey")
            .filter(F.col("o_custkey") == 1)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert n_plain_parts == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(orders, cust, "o_custkey", how="full")
