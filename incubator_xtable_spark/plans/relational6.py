"""Sixth relational batch (r6): the remaining TPC-H query SHAPES the
registry had not yet gated — Q4/Q8/Q12/Q13/Q21 adapted to the testdata's
reduced column set (no commitdate/receiptdate/shipmode/comment columns;
the join topology, operator mix and determinism discipline are the
point, not the literal predicates).

All entries are pytest-tier (graded=False): the driver's graded window
is capped at 50 curated entries; these are differential-tested by
tests/test_oracle_parity.py and timed by bench.py.

Operator coverage added here:
- q04: NON-EQUI semi join (EXISTS with an inequality across tables) —
  the correlated-predicate membership shape.
- q08: two-level market-share ratio across a 6-table snowflake with a
  conditional numerator (nation share of regional revenue per year).
- q12: conditional CASE counts over a date-bounded join (priority
  class split per line status).
- q13: LEFT OUTER join distribution — customers with ZERO orders must
  survive into the histogram (the outer-join-then-re-aggregate shape).
- q21: chained EXISTS + NOT-EXISTS with inequalities (multi-supplier
  order blame analysis).

Cross-engine determinism: same rules as plans/common.py — decimal-cast
money, single final DECIMAL->DOUBLE snap, int/int ratios, tie-broken
orderings, identical aliases both sides.

Scale notes: every join keys on the natural join columns (shuffle on
orderkey/custkey/suppkey); dimensions (nation/region/part/supplier)
broadcast; the q21 exists/not-exists chain is two semi/anti joins on
l_orderkey — no correlated per-row subquery execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.plans.common import money, money_out, revenue, t
from incubator_xtable_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q04-style: priority counts of orders with a LATE lineitem (non-equi EXISTS)
# ---------------------------------------------------------------------------

Q04_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q04_order_priority",
    oracle=Q04_ORACLE,
    category="relational",
    description="TPC-H Q4-style EXISTS with cross-table inequality (late lines)",
    graded=False,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q08-style: national market share of regional revenue per year
# ---------------------------------------------------------------------------

Q08_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))
        ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DOUBLE)
    AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


@register(
    "q08_market_share",
    oracle=Q08_ORACLE,
    category="relational",
    description="TPC-H Q8-style national market share over a 6-table snowflake",
    graded=False,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    rev = revenue(F.col("l_extendedprice"), F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("n2.n_name") == "NATION_3", rev).otherwise(
                        F.lit(0).cast("decimal(15,4)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q12-style: priority class split per line status over a date window
# ---------------------------------------------------------------------------

Q12_ORACLE = """
SELECT
  l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "q12_priority_class_split",
    oracle=Q12_ORACLE,
    category="relational",
    description="TPC-H Q12-style CASE-split counts over a date-bounded join",
    graded=False,
)
def q12_priority_class_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q13-style: customer order-count distribution (LEFT OUTER histogram)
# ---------------------------------------------------------------------------

Q13_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register(
    "q13_customer_distribution",
    oracle=Q13_ORACLE,
    category="relational",
    description="TPC-H Q13-style left-outer count distribution (zero-order customers kept)",
    graded=False,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q21-style: suppliers blamed for the latest line in multi-supplier orders
# ---------------------------------------------------------------------------

Q21_ORACLE = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register(
    "q21_suppliers_kept_waiting",
    oracle=Q21_ORACLE,
    category="relational",
    description="TPC-H Q21-style chained EXISTS / NOT-EXISTS with inequalities",
    graded=False,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = li.select(
        F.col("l_orderkey").alias("k3"), F.col("l_shipdate").alias("d3")
    ).alias("l3")
    blamed = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("k2"))
            & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("k3"))
            & (F.col("d3") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    return (
        blamed.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# RFM-style customer segmentation (fixed-rule, exact arithmetic)
# ---------------------------------------------------------------------------

RFM_ORACLE = """
WITH anchor AS (SELECT max(o_orderdate) AS latest FROM orders),
per_cust AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), (SELECT latest FROM anchor)) AS recency_days,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS monetary
  FROM orders GROUP BY o_custkey
),
classed AS (
  SELECT CASE WHEN recency_days <= 180 THEN 'active'
              WHEN recency_days <= 540 THEN 'warm'
              ELSE 'cold' END AS recency_class,
         CASE WHEN n_orders >= 20 THEN 'frequent'
              WHEN n_orders >= 10 THEN 'regular'
              ELSE 'occasional' END AS frequency_class,
         monetary
  FROM per_cust
)
SELECT recency_class, frequency_class,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(CAST(sum(monetary) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
FROM classed
GROUP BY recency_class, frequency_class
"""


@register(
    "customer_rfm_segments",
    oracle=RFM_ORACLE,
    category="relational",
    description="RFM-style customer segmentation (fixed integer rules)",
    graded=False,  # driver window pinned at 50; oracle-gated via pytest parity
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary customer segmentation with FIXED
    integer thresholds — deliberately not quantile-based: fixed rules
    are exact cross-engine AND scale-right (quantile cutoffs would need
    either an unpartitioned ntile window — a single-task funnel — or
    interpolated percentiles whose float math differs in final ulps
    between engines; at 100 TB the production pattern is approximate
    cutoffs broadcast from a sample, which is not oracle-exact, so the
    gate uses the rule-based variant). One groupBy(custkey), a
    broadcast scalar anchor date, one tiny class rollup; decimal money
    throughout."""
    o = t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("latest"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff(F.col("latest"), F.col("last_order")))
    )
    classed = per_cust.select(
        F.when(F.col("recency_days") <= 180, "active")
        .when(F.col("recency_days") <= 540, "warm")
        .otherwise("cold")
        .alias("recency_class"),
        F.when(F.col("n_orders") >= 20, "frequent")
        .when(F.col("n_orders") >= 10, "regular")
        .otherwise("occasional")
        .alias("frequency_class"),
        "monetary",
    )
    return classed.groupBy("recency_class", "frequency_class").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_out(F.sum("monetary").cast("decimal(38,2)"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# market-basket co-occurrence over a bounded top-K part set
# ---------------------------------------------------------------------------

BASKET_ORACLE = """
WITH cust_part AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
top_parts AS (
  SELECT part FROM (
    SELECT part, count(*) AS n FROM cust_part GROUP BY part
    ORDER BY n DESC, part LIMIT 50
  )
),
bounded AS (
  SELECT cp.cust, cp.part FROM cust_part cp
  JOIN top_parts tp ON cp.part = tp.part
)
SELECT a.part AS part_a, b.part AS part_b,
       CAST(count(*) AS BIGINT) AS n_customers
FROM bounded a JOIN bounded b ON a.cust = b.cust AND a.part < b.part
GROUP BY part_a, part_b
ORDER BY n_customers DESC, part_a, part_b
LIMIT 10
"""


@register(
    "part_pair_affinity",
    oracle=BASKET_ORACLE,
    category="relational",
    description="market-basket part co-occurrence over a bounded top-50 set",
    graded=False,  # driver window pinned at 50; oracle-gated via pytest parity
)
def part_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence — which parts the same customers buy
    together — with the self-join BOUNDED to the top-50 parts by
    customer reach (fully tie-broken), so the pair space is at most
    K^2/2 regardless of corpus size: the standard way this shape stays
    sane at 100 TB (the unbounded all-parts self-join is quadratic in
    the catalog). The top-part set broadcasts against the
    (customer, part) stream; counts are exact integers; the final
    top-10 is fully tie-broken."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # materialize the joined+distinct stream once, pre-partitioned by the
    # self-join key: top_parts and BOTH self-join sides read it (3 full
    # evaluations of the join+distinct otherwise — r14 plan audit), and
    # the cust partitioning makes the pair self-join exchange-free
    cust_part = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
        .repartition("cust")
        .localCheckpoint(eager=False)
    )
    top_parts = (
        cust_part.groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "part")
        .limit(50)
        .select("part")
    )
    bounded = cust_part.join(F.broadcast(top_parts), "part")
    a = bounded.select(F.col("cust"), F.col("part").alias("part_a"))
    b = bounded.select(F.col("cust"), F.col("part").alias("part_b"))
    return (
        a.join(b, "cust")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), "part_a", "part_b")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# shipping-delay distribution (exact integer histogram)
# ---------------------------------------------------------------------------

DELAY_ORACLE = """
SELECT
  CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INTEGER) AS delay_days,
  CAST(count(*) AS BIGINT) AS n_lineitems,
  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate
GROUP BY delay_days
"""


@register(
    "lineitem_delay_histogram",
    oracle=DELAY_ORACLE,
    category="relational",
    description="order-to-ship fulfillment histogram (exact integer day buckets)",
    graded=False,  # driver window pinned at 50; oracle-gated via pytest parity
)
def lineitem_delay_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of order-to-ship fulfillment times in whole days
    (this testdata's reduced lineitem carries l_shipdate only, so the
    lateness base is the order date): exact integer date arithmetic end
    to end, one orderkey join + one groupBy on a bounded key space
    (delays are small integers — no skew, tiny result at any SF; the
    orders side broadcasts or co-shuffles on the same key as q04/q12)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            .cast("int")
            .alias("delay_days"),
            "l_suppkey",
        )
        .groupBy("delay_days")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


# ---------------------------------------------------------------------------
# revenue concentration deciles (r12)
# ---------------------------------------------------------------------------

PARETO_ORACLE = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s
  FROM orders GROUP BY o_custkey
), d AS (
  SELECT o_custkey, s, ntile(10) OVER (ORDER BY s DESC, o_custkey) AS decile
  FROM spend
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(CAST(sum(s) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM d GROUP BY decile
"""


@register(
    "orders_pareto_share",
    oracle=PARETO_ORACLE,
    category="relational",
    description="revenue concentration by customer decile (Pareto curve)",
    graded=False,
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/concentration analysis: customers ranked by exact-decimal
    total spend (ties broken by key), split into ntile(10) deciles,
    per-decile customer count and revenue — the '20% of customers drive
    X% of revenue' curve.

    Scale: the fact-table shuffle is ONE per-customer aggregation; the
    global ntile window then runs over the AGGREGATED |customers| rows
    only. A global ORDER BY window is single-partition by nature — fine
    at |customers| scale; at billions of customers the documented
    alternative is approx-percentile cutoffs joined back (same output
    contract, no total order)."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(money(F.col("o_totalprice"))).alias("s"))
    )
    w = W.orderBy(F.desc("s"), F.asc("o_custkey"))
    d = spend.withColumn("decile", F.ntile(10).over(w))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_out(F.sum("s")).alias("revenue"),
    )
