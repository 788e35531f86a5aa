"""Third relational batch: arg_max/min_by, sorted array aggregation,
regexp tokenization (BPE-ish), scalar-subquery thresholds, nested semi
joins, NOT IN, conditional revenue share.

Same cross-engine determinism rules as plans/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.plans.common import money, money_out, revenue, t
from incubator_xtable_spark.plans.registry import register

# ---------------------------------------------------------------------------
# arg_max / min_by
# ---------------------------------------------------------------------------

ARGMAX_ORACLE = """
SELECT
  user_id,
  arg_max(event_id, CAST(round(value * 100) AS BIGINT) * 10000000 + event_id) AS best_event_id,
  max(value) AS best_value,
  arg_min(event_id, CAST(round(value * 100) AS BIGINT) * 10000000 + event_id) AS worst_event_id,
  min(value) AS worst_value
FROM events
GROUP BY user_id
"""


@register(
    "argmax_events_per_user",
    oracle=ARGMAX_ORACLE,
    category="relational",
    description="arg_max/arg_min (max_by/min_by) aggregation",
)
def argmax_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # values have 2 decimals -> ties happen; an exact integer composite
    # (value-cents, event_id) key makes the arg choice deterministic in
    # both engines (DuckDB's arg_max rejects struct keys)
    key = F.round(F.col("value") * 100).cast("long") * 10000000 + F.col("event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", key).alias("best_event_id"),
        F.max("value").alias("best_value"),
        F.min_by("event_id", key).alias("worst_event_id"),
        F.min("value").alias("worst_value"),
    )


# ---------------------------------------------------------------------------
# sorted array aggregation
# ---------------------------------------------------------------------------

ARRAYAGG_ORACLE = """
SELECT
  o_custkey,
  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
  count(*) AS n_orders
FROM orders
WHERE o_custkey < 20
GROUP BY o_custkey
"""


@register(
    "array_agg_orders",
    oracle=ARRAYAGG_ORACLE,
    category="relational",
    description="collect_list + sort_array (deterministic array agg)",
)
def array_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Emitted as a comma-joined string: a raw array column crashes the
    # driver's pandas canonicalizer (unhashable list in sort_values).
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias("orderkeys"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# regexp tokenization (BPE-ish word/punct splitter) over documents
# ---------------------------------------------------------------------------

REGEXP_TOKENS_ORACLE = r"""
SELECT
  doc_id,
  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_word_tokens,
  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS INTEGER) AS n_unique_words,
  CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS INTEGER) AS n_long_tokens,
  regexp_extract(text, '^([a-z]+)', 1) AS first_token
FROM documents
WHERE doc_id < 300
"""


@register(
    "text_regexp_tokenize",
    oracle=REGEXP_TOKENS_ORACLE,
    category="text",
    description="regex tokenizer (BPE-ish token counting)",
    graded=False,
)
def text_regexp_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    # Spark's regexp_extract_all extracts a capture GROUP (idx defaults to
    # 1), DuckDB's default is the full match — wrap the Spark pattern
    words = F.regexp_extract_all(F.col("text"), F.lit("([a-z]+)"), 1)
    longs = F.regexp_extract_all(F.col("text"), F.lit("([a-z]{5,})"), 1)
    return docs.select(
        "doc_id",
        F.size(words).cast("int").alias("n_word_tokens"),
        F.size(F.array_distinct(words)).cast("int").alias("n_unique_words"),
        F.size(longs).cast("int").alias("n_long_tokens"),
        F.regexp_extract(F.col("text"), "^([a-z]+)", 1).alias("first_token"),
    )


# ---------------------------------------------------------------------------
# q11-ish: groups whose share exceeds a global-threshold scalar subquery
# ---------------------------------------------------------------------------

Q11_ORACLE = """
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS supp_value
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, CAST(supp_value AS DOUBLE) AS supp_value
FROM per_supp
WHERE supp_value > (
  SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 0.0015 AS DECIMAL(38,6))
  FROM lineitem
)
"""


@register(
    "q11_important_suppliers",
    oracle=Q11_ORACLE,
    category="relational",
    description="TPC-H Q11-style global-threshold scalar subquery",
    graded=False,  # r12: rotated out of the driver window for flagship ops
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(money(F.col("l_extendedprice"))).cast("decimal(38,2)").alias("supp_value")
    )
    # scalar "subquery" stays in-plan: broadcast the 1-row aggregate
    # instead of a driver collect (one job, no synchronous round-trip)
    threshold = li.agg(
        (F.sum(money(F.col("l_extendedprice"))) * F.lit("0.0015").cast("decimal(6,4)"))
        .cast("decimal(38,6)")
        .alias("thr")
    )
    return (
        per_supp.crossJoin(F.broadcast(threshold))
        .filter(F.col("supp_value") > F.col("thr"))
        .select("l_suppkey", F.col("supp_value").cast("double").alias("supp_value"))
    )


# ---------------------------------------------------------------------------
# q14-ish: promo revenue share (conditional aggregation ratio)
# ---------------------------------------------------------------------------

Q14_ORACLE = """
SELECT
  CAST(100.0 AS DOUBLE) * CAST(sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))
        ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(3,2))) AS DOUBLE)
    AS promo_revenue_pct,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register(
    "q14_promo_share",
    oracle=Q14_ORACLE,
    category="relational",
    description="TPC-H Q14-style conditional revenue share",
    graded=False,  # r12: rotated out of the driver window for flagship ops
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = revenue(F.col("l_extendedprice"), F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(15,4)"))).cast(
                "double"
            )
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q16-ish: NOT IN + multi-distinct
# ---------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_size
"""


@register(
    "q16_supplier_counts",
    oracle=Q16_ORACLE,
    category="relational",
    description="TPC-H Q16-style NOT IN filter + count distinct per group",
    graded=False,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(
        (~F.col("p_brand").isin("Brand#1", "Brand#2"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q20-ish: nested semi joins (suppliers shipping widgets heavily)
# ---------------------------------------------------------------------------

Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 100
)
ORDER BY s_suppkey
"""


@register(
    "q20_widget_suppliers",
    oracle=Q20_ORACLE,
    category="relational",
    description="TPC-H Q20-style nested IN subqueries with HAVING",
    graded=False,
)
def q20_widget_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select("p_partkey")
    li = t(spark, sf_dir, "lineitem")
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supp = t(spark, sf_dir, "supplier")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q2-ish: min-cost match per group (correlated min subquery as join)
# ---------------------------------------------------------------------------

Q02_ORACLE = """
WITH supp_part AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT sp.l_partkey, sp.l_suppkey, CAST(sp.total_cost AS DOUBLE) AS total_cost
FROM supp_part sp
JOIN (
  SELECT l_partkey, min(total_cost) AS min_cost
  FROM supp_part GROUP BY l_partkey
) m ON sp.l_partkey = m.l_partkey AND sp.total_cost = m.min_cost
WHERE sp.l_partkey < 200
"""


@register(
    "q02_min_cost_supplier",
    oracle=Q02_ORACLE,
    category="relational",
    description="TPC-H Q2-style per-group minimum matching",
    graded=False,  # r12: rotated out of the driver window for flagship ops
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(money(F.col("l_extendedprice"))).cast("decimal(38,2)").alias("total_cost")
    )
    m = sp.groupBy("l_partkey").agg(F.min("total_cost").alias("min_cost")).select(
        F.col("l_partkey").alias("m_partkey"), "min_cost"
    )
    return (
        sp.join(m, (sp.l_partkey == F.col("m_partkey")) & (sp.total_cost == F.col("min_cost")))
        .select("l_partkey", "l_suppkey", F.col("total_cost").cast("double").alias("total_cost"))
        .filter(F.col("l_partkey") < 200)
    )
