"""Fourth relational batch: Q15/Q17/Q19/Q22 shapes, hopping windows,
dense_rank, median-free threshold logic.

Same cross-engine determinism rules as plans/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.plans.common import money, money_out, revenue, t
from incubator_xtable_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q15-ish: top revenue supplier(s) (max over an aggregated view)
# ---------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue_view AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue_view ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue_view)
ORDER BY s_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=Q15_ORACLE,
    category="relational",
    description="TPC-H Q15-style max-over-view with scalar subquery",
    graded=False,  # r12: rotated out of the driver window for flagship ops
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(revenue(F.col("l_extendedprice"), F.col("l_discount")))
            .cast("decimal(38,4)")
            .alias("total_revenue")
        )
        # lazily localCheckpointed (r15, guide §2.2): both the scalar max
        # and the supplier join consume this supplier-cardinality frame —
        # unmaterialized, Catalyst evaluates the lineitem scan + revenue
        # agg twice (see plans/r15/q15_top_supplier_before.txt)
        .localCheckpoint(eager=False)
    )
    # broadcast the 1-row max instead of a driver collect (in-plan scalar)
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    supp = t(spark, sf_dir, "supplier")
    return (
        supp.join(rev, supp.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q17-ish: small-quantity orders below 20% of the part's average quantity
# ---------------------------------------------------------------------------

Q17_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey AS pk,
         CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS small_order_value,
  count(*) AS n_small_lines
FROM lineitem JOIN part_avg ON l_partkey = pk
WHERE l_quantity < 0.2 * avg_qty
"""


@register(
    "q17_small_quantity_value",
    oracle=Q17_ORACLE,
    category="relational",
    description="TPC-H Q17-style per-key average threshold",
    graded=False,
)
def q17_small_quantity_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum("l_quantity").cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            money_out(F.sum(money(F.col("l_extendedprice"))), 2).alias("small_order_value"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q19-ish: disjunctive multi-predicate join (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

Q19_ORACLE = """
SELECT
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'PROMO' AND l_quantity >= 40)
"""


@register(
    "q19_disjunctive_predicates",
    oracle=Q19_ORACLE,
    category="relational",
    description="TPC-H Q19-style OR-of-ANDs join predicates",
    graded=False,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(5, 20) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 40))
    )
    return joined.filter(cond).agg(
        money_out(F.sum(revenue(F.col("l_extendedprice"), F.col("l_discount"))), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q22-ish: customers with above-average balance and no orders, by prefix
# ---------------------------------------------------------------------------

# Every customer in the testdata has orders, so TPC-H's literal "no
# orders" arm returned 0 rows on both engines (vacuous green). Q22's
# intent is "well-funded customers we are NOT actively selling to" — keep
# that by anti-joining on recent orders only (~285 qualifying customers).
Q22_CUTOFF = "2001-01-01"

Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT
  substring(c_name, 10, 1) AS cntrycode,
  count(*) AS numcust,
  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= DATE '{Q22_CUTOFF}'
  )
GROUP BY cntrycode
"""


@register(
    "q22_global_sales_opportunity",
    oracle=Q22_ORACLE,
    category="relational",
    description="TPC-H Q22-style anti-join + global-average scalar subquery",
    graded=False,  # r12: rotated out of the driver window for flagship ops
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("date")
    )
    # broadcast the 1-row global average instead of a driver collect
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(money(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .drop("a")
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_out(F.sum(money(F.col("c_acctbal"))), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# hopping (sliding) windows via interval explosion
# ---------------------------------------------------------------------------

HOPPING_ORACLE = """
WITH hours AS (
  SELECT event_id, user_id, value,
         date_trunc('hour', ts) - INTERVAL (h) HOUR AS window_start
  FROM events, range(0, 2) r(h)
)
SELECT window_start, count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
FROM hours
WHERE window_start >= TIMESTAMP '2024-01-10 00:00:00'
  AND window_start < TIMESTAMP '2024-01-12 00:00:00'
GROUP BY window_start
"""


@register(
    "events_hopping_windows",
    oracle=HOPPING_ORACLE,
    category="events",
    description="2h sliding windows hopping every 1h (event explosion)",
    graded=False,  # r12: rotated out (events_tumbling_hourly keeps the family graded)
)
def events_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # each event belongs to 2 overlapping 2h-wide hourly-hopping windows
    exploded = ev.select(
        "event_id",
        "user_id",
        "value",
        F.explode(
            F.array(
                F.date_trunc("hour", F.col("ts")),
                F.date_trunc("hour", F.col("ts")) - F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("window_start"),
    )
    return (
        exploded.filter(
            (F.col("window_start") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("window_start") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
        )
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_out(F.sum(F.col("value").cast("decimal(18,6)")), 6).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# dense_rank + ntile
# ---------------------------------------------------------------------------

DENSERANK_ORACLE = """
SELECT
  o_orderpriority,
  o_orderkey,
  CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INTEGER) AS price_rank,
  CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS quartile
FROM orders
WHERE o_orderkey < 2000
"""


@register(
    "window_dense_rank_ntile",
    oracle=DENSERANK_ORACLE,
    category="relational",
    description="dense_rank + ntile window functions",
    graded=False,
)
def window_dense_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w_rank = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    w_tile = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.dense_rank().over(w_rank).cast("int").alias("price_rank"),
        F.ntile(4).over(w_tile).cast("int").alias("quartile"),
    )
