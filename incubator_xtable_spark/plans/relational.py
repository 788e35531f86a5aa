"""Relational operator coverage (SURVEY.md §2.4 checklist): scans,
projection, filter, joins (inner/semi/anti/broadcast), aggregation,
distinct, sort/limit/top-k, set ops, window functions, rollup.

Each query is a TPC-H-shaped workload over the harness star schema, written
DataFrame-first so Catalyst handles pushdown/pruning/join selection; the
paired DuckDB oracle is the driver's correctness gate.

Reference parity notes: the reference's only row-level "queries" are its
differential test reads (ITConversionController.java:948-1026); the
relational surface here is what its delegated engine (Spark) must provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.plans.common import money, money_out, one_minus, one_plus, revenue, t
from incubator_xtable_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q01 — full-scan aggregation (pricing summary). Flagship query.
# ---------------------------------------------------------------------------

Q01_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  sum(l_quantity) AS sum_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2)) * CAST(CAST(1.0 AS DOUBLE) + l_tax AS DECIMAL(3,2))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
  CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "q01_pricing_summary",
    oracle=Q01_ORACLE,
    category="relational",
    description="TPC-H Q1-style scan+agg; exact decimal money math",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = revenue(F.col("l_extendedprice"), F.col("l_discount"))
    charge = disc_price * one_plus(F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        money_out(F.sum(money(F.col("l_extendedprice"))), 2).alias("sum_base_price"),
        money_out(F.sum(disc_price), 4).alias("sum_disc_price"),
        money_out(F.sum(charge), 6).alias("sum_charge"),
        (F.sum("l_quantity").cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(money(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(8,2)")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q03 — join + agg + deterministic top-k
# ---------------------------------------------------------------------------

Q03_ORACLE = """
SELECT
  l_orderkey,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register(
    "q03_shipping_priority",
    oracle=Q03_ORACLE,
    category="relational",
    description="TPC-H Q3-style 3-way join, broadcast dim, top-10",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale note (skew): the lineitem⋈orders shuffle join keys on
    o_orderkey/l_orderkey — uniform in TPC-H, but a hot key (one customer
    owning half the orders) stays safe because the plan is a plain
    declarative SMJ, eligible for AQE's runtime skew split
    (spark.sql.adaptive.skewJoin); tests/test_skew_join.py plants exactly
    that skew and proves the split fires (skew=true) with the result
    still hash-matching DuckDB. No manual salting needed for join-side
    skew at 100x."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_out(F.sum(revenue(F.col("l_extendedprice"), F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q05 — 6-way join through region/nation with co-located nation keys
# ---------------------------------------------------------------------------

Q05_ORACLE = """
SELECT
  n_name,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register(
    "q05_local_supplier_volume",
    oracle=Q05_ORACLE,
    category="relational",
    description="TPC-H Q5-style multi-join with region filter",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        money_out(F.sum(revenue(F.col("l_extendedprice"), F.col("l_discount"))), 4).alias("revenue")
    )


# ---------------------------------------------------------------------------
# q06 — predicate-pushdown filter + scalar agg
# ---------------------------------------------------------------------------

Q06_ORACLE = """
SELECT
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register(
    "q06_forecast_revenue",
    oracle=Q06_ORACLE,
    category="relational",
    description="TPC-H Q6-style selective filter + scalar aggregate",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_out(
            F.sum(money(F.col("l_extendedprice")) * F.col("l_discount").cast("decimal(4,2)")), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q07 — nation-pair volume by year (join + derived grouping column)
# ---------------------------------------------------------------------------

Q07_ORACLE = """
SELECT
  sn.n_name AS supp_nation,
  cn.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INTEGER) AS l_year,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2') AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY supp_nation, cust_nation, l_year
"""


@register(
    "q07_volume_shipping",
    oracle=Q07_ORACLE,
    category="relational",
    description="TPC-H Q7-style nation-pair flows, self-joined dim",
    graded=False,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(money_out(F.sum(revenue(F.col("l_extendedprice"), F.col("l_discount"))), 4).alias("revenue"))


# ---------------------------------------------------------------------------
# q09 — product-line profit by nation/year with LIKE filter
# ---------------------------------------------------------------------------

Q09_ORACLE = """
SELECT
  n_name AS nation,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS DOUBLE) AS profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""


@register(
    "q09_product_profit",
    oracle=Q09_ORACLE,
    category="relational",
    description="TPC-H Q9-style profit rollup with LIKE pushdown",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(money_out(F.sum(revenue(F.col("l_extendedprice"), F.col("l_discount"))), 4).alias("profit"))


# ---------------------------------------------------------------------------
# q10 — returned items: top 20 customers by lost revenue
# ---------------------------------------------------------------------------

Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
  c_acctbal,
  n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "q10_returned_items",
    oracle=Q10_ORACLE,
    category="relational",
    description="TPC-H Q10-style returned-item report, top-20",
    graded=False,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_out(F.sum(revenue(F.col("l_extendedprice"), F.col("l_discount"))), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q18 — large orders (agg-filter via HAVING + join back)
# ---------------------------------------------------------------------------

Q18_ORACLE = """
SELECT
  c_name,
  c_custkey,
  o_orderkey,
  o_orderdate,
  o_totalprice,
  sum(l_quantity) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > 300
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register(
    "q18_large_orders",
    oracle=Q18_ORACLE,
    category="relational",
    description="TPC-H Q18-style HAVING filter on aggregated quantity",
    graded=False,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    grouped = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return grouped.orderBy(F.desc("o_totalprice"), "o_orderkey").limit(100)


# ---------------------------------------------------------------------------
# semi / anti joins
# ---------------------------------------------------------------------------

SEMI_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_discount >= 0.08
)
GROUP BY o_orderpriority
"""


@register(
    "semi_join_discounted",
    oracle=SEMI_ORACLE,
    category="relational",
    description="EXISTS as left-semi join (FilesDiff-style membership)",
)
def semi_join_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    hot = t(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.08)
    return (
        orders.join(hot, orders.o_orderkey == hot.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# Every customer has at least one order in the testdata, so the plain
# "no orders ever" predicate is vacuous (0 rows on both engines — proved
# nothing). Scope it to "lapsed" customers with no RECENT order instead:
# ~255 of 1,500 customers at sf0.01, so the anti-join visibly fires.
ANTI_CUTOFF = "2000-06-01"

ANTI_ORACLE = f"""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= DATE '{ANTI_CUTOFF}'
)
GROUP BY c_mktsegment
"""


@register(
    "anti_join_no_orders",
    oracle=ANTI_ORACLE,
    category="relational",
    description="NOT EXISTS as left-anti join (FilesDiff.java:67-85 analog)",
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(ANTI_CUTOFF).cast("date")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# distinct aggregation
# ---------------------------------------------------------------------------

DISTINCT_ORACLE = """
SELECT
  s_name,
  count(DISTINCT l_partkey) AS n_parts,
  count(DISTINCT l_orderkey) AS n_orders,
  count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


@register(
    "distinct_parts_per_supplier",
    oracle=DISTINCT_ORACLE,
    category="relational",
    description="multi count-distinct (dedup rollup per key)",
    # r14: rotated out of the graded window for events_anomaly_hours
    # (dedup_exact_summary keeps the distinct/dedup family graded);
    # still oracle-gated via the parity suite + bench
    graded=False,
)
def distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# rollup (hierarchical aggregation)
# ---------------------------------------------------------------------------

ROLLUP_ORACLE = """
SELECT
  r_name,
  n_name,
  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_acctbal,
  count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register(
    "rollup_acctbal",
    oracle=ROLLUP_ORACLE,
    category="relational",
    description="ROLLUP over region/nation hierarchy",
)
def rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return joined.rollup("r_name", "n_name").agg(
        money_out(F.sum(money(F.col("c_acctbal"))), 2).alias("total_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

TOPN_ORACLE = """
SELECT c_custkey, c_name, n_name, c_acctbal, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT c_custkey, c_name, n_name, c_acctbal,
         row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rn <= 3
"""


@register(
    "window_topn_per_nation",
    oracle=TOPN_ORACLE,
    category="relational",
    description="row_number top-N per group (dedup/top-k pattern)",
)
def window_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "rn")
    )


RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS running_spend,
  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
FROM orders
WHERE o_custkey < 50
"""


@register(
    "window_running_spend",
    oracle=RUNNING_ORACLE,
    category="relational",
    description="running sum + sequence number per customer",
    graded=False,  # r12: rotated out (window_topn_per_nation keeps the family graded)
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        money_out(
            F.sum(money(F.col("o_totalprice"))).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            2,
        ).alias("running_spend"),
        F.row_number().over(w).cast("int").alias("order_seq"),
    )


LATEST_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
"""


@register(
    "latest_order_per_customer",
    oracle=LATEST_ORACLE,
    category="relational",
    description="latest-record-per-key (commit-at-instant resolution pattern)",
    graded=False,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

SETOPS_ORACLE = """
SELECT c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  INTERSECT
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
)
"""


@register(
    "setops_repeat_customers",
    oracle=SETOPS_ORACLE,
    category="relational",
    description="INTERSECT of two snapshots of the same table",
    # rotated to the ungraded tier in r13 to free a graded slot for
    # meta_cdf_insert_derivation (VERDICT r12 #1); union_all_appearances
    # and meta_files_diff (EXCEPT) keep set ops graded, and this entry
    # stays oracle-gated via the pytest parity suite + the bench
    graded=False,
)
def setops_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    recent = orders.filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    early = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return recent.intersect(early)
