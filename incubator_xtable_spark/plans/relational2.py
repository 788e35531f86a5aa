"""Second relational batch: cube/grouping-sets, correlated scalar
subqueries, lag/lead + first/last window frames, range join, conditional
aggregation, string/date scalar functions, union-all dedup.

Same cross-engine determinism rules as plans/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.plans.common import money, money_out, revenue, t
from incubator_xtable_spark.plans.registry import register

# ---------------------------------------------------------------------------
# cube
# ---------------------------------------------------------------------------

CUBE_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  count(*) AS n_lines,
  sum(l_quantity) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register(
    "cube_lineitem_status",
    oracle=CUBE_ORACLE,
    category="relational",
    description="CUBE over two dimensions",
    graded=False,
)
def cube_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"), F.sum("l_quantity").alias("sum_qty")
    )


# ---------------------------------------------------------------------------
# grouping sets (explicit)
# ---------------------------------------------------------------------------

GSETS_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "grouping_sets_orders",
    oracle=GSETS_ORACLE,
    category="relational",
    description="explicit GROUPING SETS",
    # r14: rotated out of the graded window for text_bpe_encode
    # (rollup_acctbal keeps the grouping-sets/rollup family graded);
    # still oracle-gated via the parity suite + bench
    graded=False,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# correlated scalar subquery (customers above their nation's average balance)
# ---------------------------------------------------------------------------

CORR_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
  FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
"""


@register(
    "correlated_above_avg_balance",
    oracle=CORR_ORACLE,
    category="relational",
    description="correlated scalar subquery (decorrelated to join by Catalyst)",
)
def correlated_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    avg_by_nation = cust.groupBy("c_nationkey").agg(
        (F.sum(money(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(avg_by_nation), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# lag/lead + first/last value frames
# ---------------------------------------------------------------------------

LAGLEAD_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  lag(o_orderkey) OVER w AS prev_orderkey,
  lead(o_orderkey) OVER w AS next_orderkey,
  first_value(o_orderkey) OVER w AS first_orderkey,
  CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
FROM orders
WHERE o_custkey < 30
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register(
    "window_lag_lead_gaps",
    oracle=LAGLEAD_ORACLE,
    category="relational",
    description="lag/lead/first_value + inter-order gaps",
    graded=False,  # r12: rotated out (window_topn_per_nation keeps the family graded)
)
def window_lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag("o_orderdate").over(w).cast("date")
        ).cast("int").alias("gap_days"),
    )


# ---------------------------------------------------------------------------
# range join: events against value-range buckets
# ---------------------------------------------------------------------------

RANGE_ORACLE = """
WITH buckets(bucket_name, lo, hi) AS (
  VALUES ('low', CAST(0.0 AS DOUBLE), CAST(50.0 AS DOUBLE)),
         ('mid', CAST(50.0 AS DOUBLE), CAST(150.0 AS DOUBLE)),
         ('high', CAST(150.0 AS DOUBLE), CAST(1e9 AS DOUBLE))
)
SELECT bucket_name, count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
FROM events JOIN buckets ON value >= lo AND value < hi
GROUP BY bucket_name
"""


@register(
    "range_join_value_buckets",
    oracle=RANGE_ORACLE,
    category="relational",
    description="inequality (range) join against a literal bucket table",
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e9)],
        "bucket_name STRING, lo DOUBLE, hi DOUBLE",
    )
    joined = ev.join(
        F.broadcast(buckets), (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("bucket_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_out(F.sum(F.col("value").cast("decimal(18,6)")), 6).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# conditional aggregation (FILTER / CASE pivot-style)
# ---------------------------------------------------------------------------

CONDAGG_ORACLE = """
SELECT
  n_name,
  count(*) FILTER (WHERE c_acctbal >= 0) AS n_positive,
  count(*) FILTER (WHERE c_acctbal < 0) AS n_negative,
  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) FILTER (WHERE c_mktsegment = 'BUILDING') AS DECIMAL(38,2)) AS DOUBLE) AS building_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register(
    "conditional_agg_balances",
    oracle=CONDAGG_ORACLE,
    category="relational",
    description="FILTER-clause conditional aggregation",
    graded=False,
)
def conditional_agg_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return joined.groupBy("n_name").agg(
        F.count(F.when(F.col("c_acctbal") >= 0, 1)).alias("n_positive"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        money_out(
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", money(F.col("c_acctbal")))), 2
        ).alias("building_balance"),
    )


# ---------------------------------------------------------------------------
# string + date scalar functions
# ---------------------------------------------------------------------------

SCALARS_ORACLE = """
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  CAST(length(p_name) AS INTEGER) AS name_len,
  substring(p_brand, 7) AS brand_num,
  concat(p_type, '/', p_brand) AS type_brand,
  replace(p_name, ' ', '_') AS name_snake,
  CAST(contains(p_name, 'widget') AS BOOLEAN) AS is_widget
FROM part
WHERE p_partkey < 500
"""


@register(
    "scalar_string_functions",
    oracle=SCALARS_ORACLE,
    category="relational",
    description="string scalar function battery",
    # rotated to the ungraded tier in r13 to free a graded slot for
    # meta_dv_relay (VERDICT r12 #1); scalar_date_functions keeps the
    # scalar shape family graded, and this entry stays oracle-gated via
    # the pytest parity suite + the per-round bench
    graded=False,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.expr("substring(p_brand, 7)").alias("brand_num"),
        F.concat(F.col("p_type"), F.lit("/"), F.col("p_brand")).alias("type_brand"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.contains(F.col("p_name"), F.lit("widget")).alias("is_widget"),
    )


DATES_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INTEGER) AS y,
  CAST(quarter(o_orderdate) AS INTEGER) AS q,
  CAST(month(o_orderdate) AS INTEGER) AS m,
  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,  -- DuckDB Sun=0; Spark Sun=1
  count(*) AS n_orders,
  min(CAST(o_orderdate AS DATE)) AS first_date,
  max(CAST(o_orderdate AS DATE)) AS last_date
FROM orders
GROUP BY y, q, m, dow
"""


@register(
    "scalar_date_functions",
    oracle=DATES_ORACLE,
    category="relational",
    description="date-part extraction battery",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.month("o_orderdate").cast("int").alias("m"),
        (F.dayofweek("o_orderdate")).cast("int").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
    )


# ---------------------------------------------------------------------------
# union all + dedup across snapshots
# ---------------------------------------------------------------------------

UNION_ORACLE = """
SELECT c_custkey, count(*) AS appearances
FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
)
GROUP BY c_custkey
"""


@register(
    "union_all_appearances",
    oracle=UNION_ORACLE,
    category="relational",
    description="UNION ALL + re-aggregation",
    graded=False,
)
def union_all_appearances(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    b = orders.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("c_custkey"))
    return a.unionAll(b).groupBy("c_custkey").agg(F.count(F.lit(1)).alias("appearances"))
