"""TPC-H shapes Q6/Q9/Q11/Q17/Q20 adapted to the trimmed fixture schema.

The fixture lineitem carries no commitdate/receiptdate/shipmode and
there is no partsupp table (TESTDATA.md), so the classic queries that
need those are re-targeted onto the columns that exist: retailprice
stands in for supplycost (Q9/Q11) and shipped-quantity share stands in
for availqty (Q20).  The join/aggregation/subquery SHAPES — which is
what exercises the planner — are preserved.

Reference analogue: the reference has no multi-table queries at all
(single air-quality table, my_data_pipeline.py:50-115); like multijoin.py
this is the SURVEY.md §2.3 growth surface.

Scale posture: lineitem shuffles once per aggregation key; part and
supplier joins stay broadcast-eligible at bench scale and degrade to
shuffle joins under AQE beyond the threshold; single-row scalar
subqueries (Q11 total, Q17 per-part average) become broadcast joins,
never driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import dsum, sql_dsum


def _ts(s: str):
    return F.lit(s + " 00:00:00").cast("timestamp")


# --------------------------------------------------------------------------
# Q6: forecast revenue change — pure scan-side filter + single agg.  The
# whole query is one parquet scan with every predicate pushed down; at
# 100 TB this is the canonical "filters must reach the row-group reader"
# query (verify: PushedFilters in .explain).
# --------------------------------------------------------------------------


@register(
    "forecast_revenue_change",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < CAST(24 AS DOUBLE)
""",
    tags=("agg", "tpch", "pushdown"),
    doc="Q6 shape: what-if revenue from discount band — all predicates pushed to the scan.",
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and order year.  supplycost doesn't
# exist in the fixture; 0.8 × retailprice is the cost proxy.  The shape —
# 5-way join, LIKE filter on part, two-level group — is the point.
# --------------------------------------------------------------------------


@register(
    "product_type_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       {sql_dsum('(l_extendedprice * (1 - l_discount)) - (l_quantity * p_retailprice * 0.8)')} AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
""",
    tags=("join", "tpch", "agg"),
    doc="Q9 shape: profit (retailprice cost proxy) by supplier nation × order year.",
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) - (
        F.col("l_quantity") * F.col("p_retailprice") * 0.8
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit).alias("profit"))
    )


# --------------------------------------------------------------------------
# Q11: important stock — per-part value for one nation's suppliers,
# HAVING value above a fraction of the nation's total.  The scalar total
# becomes a broadcast cross join (never a driver collect), the classic
# Spark rewrite of TPC-H's uncorrelated scalar subquery.
# --------------------------------------------------------------------------


@register(
    "important_stock_value",
    oracle=f"""
WITH v AS (
  SELECT l_partkey, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, value
FROM v
-- each value is an exact 6dp decimal carried in a double, so the re-cast is
-- lossless and the total is order-independent (ADVICE r4: a raw double SUM
-- could flip parts sitting within 1 ulp of the share gate)
WHERE value > (SELECT {sql_dsum('value')} * 0.001 FROM v)
""",
    tags=("join", "tpch", "subquery", "having"),
    doc="Q11 shape: per-part value share gate via broadcast scalar total.",
)
def important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    )
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(dsum("rev").alias("value"))
    )
    # decimal-exact total (see oracle comment): dsum, not a raw double sum
    total = v.agg((dsum("value") * 0.001).alias("_thresh"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_thresh"))
        .select("l_partkey", "value")
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated per-part average
# rewritten as an aggregate + re-join (Spark's standard decorrelation;
# Catalyst does the same to the SQL form).  Both sides share one scan of
# the brand-filtered lineitem.
# --------------------------------------------------------------------------


@register(
    "small_quantity_order_revenue",
    oracle=f"""
WITH pl AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#3'
),
a AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_gate FROM pl GROUP BY l_partkey
)
SELECT CAST({sql_dsum('l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
FROM pl JOIN a USING (l_partkey)
WHERE l_quantity < qty_gate
""",
    tags=("join", "tpch", "subquery", "agg"),
    doc="Q17 shape: revenue from orders below 20% of the part's average quantity.",
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    pl = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    # quantities are integer-valued doubles: the double sum is exact below
    # 2^53, so AVG is deterministic across engines without the decimal dance.
    gates = pl.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("qty_gate"))
    return (
        pl.join(gates, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_gate"))
        .agg((dsum("l_extendedprice") / 7.0).cast("double").alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q20: suppliers holding an excess share of a part's 1996 shipments —
# availqty doesn't exist, so "excess" is >30% of the part's total shipped
# quantity.  The per-part total is a window over the (part, supplier)
# aggregate: one shuffle on l_partkey serves both levels.
# --------------------------------------------------------------------------


@register(
    "excess_share_suppliers",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
sh AS (
  SELECT l_partkey, l_suppkey, qty,
         CAST(SUM(CAST(qty AS DECIMAL(38,6)))
              OVER (PARTITION BY l_partkey) AS DOUBLE) AS part_total
  FROM ps
)
SELECT DISTINCT s_name
FROM sh JOIN supplier ON s_suppkey = l_suppkey
WHERE qty > 0.3 * part_total
""",
    tags=("join", "tpch", "window", "semi"),
    doc="Q20 shape: suppliers with >30% share of a part's shipped quantity.",
)
def excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    # Both the group sum and the window sum feed the 0.3× threshold below:
    # raw double accumulation is order-dependent, so a near-boundary share
    # could flip between engines.  Decimal sums (l_quantity is 2dp) make
    # qty/part_total bit-identical; the threshold compare is then the same
    # IEEE op-sequence on identical inputs in both engines.
    ps = li.groupBy("l_partkey", "l_suppkey").agg(dsum("l_quantity").alias("qty"))
    sh = ps.withColumn(
        "part_total",
        F.sum(F.col("qty").cast("decimal(38,6)"))
        .over(Window.partitionBy("l_partkey"))
        .cast("double"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sh.filter(F.col("qty") > 0.3 * F.col("part_total"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name")
        .distinct()
    )


# --------------------------------------------------------------------------
# Q21 shape — suppliers who kept orders waiting: the hardest planner
# shape in TPC-H (correlated EXISTS + NOT EXISTS over the same table).
# Adapted: "late" := shipped > 90 days after the order date (fixture
# has no commitdate/receiptdate).  The Spark plan uses the per-order
# AGGREGATE rewrite — one groupBy over the order's lineitems computes
# (distinct suppliers, distinct late suppliers) and the two correlated
# subqueries become predicates on those counts.  One shuffle on
# l_orderkey instead of two self-joins; the oracle runs the textbook
# EXISTS/NOT-EXISTS form, proving the rewrite.
# --------------------------------------------------------------------------


@register(
    "waiting_suppliers",
    oracle="""
WITH l1 AS (
  SELECT l_orderkey, l_suppkey, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
    tags=("tpch", "join", "subquery", "agg"),
    doc=(
        "Q21 shape: sole-late-supplier detection on multi-supplier "
        "finished orders.  Spark side: per-order aggregate rewrite of "
        "the EXISTS/NOT-EXISTS pair; oracle side: the textbook "
        "correlated form."
    ),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias(
            "late"
        ),
    )
    # Per-order supplier profile: the EXISTS ("some other supplier") and
    # NOT EXISTS ("no other supplier late") collapse into two distinct
    # counts.  A late row qualifies iff its order has >= 2 suppliers and
    # exactly one late supplier (necessarily this row's).
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    qualifying = (
        l.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qualifying.join(F.broadcast(s), qualifying.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Q2 shape — cheapest supplier per part (argmin-per-group with a
# deterministic tie-break).  Adapted: no partsupp/supplycost in the
# fixture, so observed min unit price from lineitem stands in.  The
# classic correlated scalar-MIN subquery becomes a window argmin over
# the (part, supplier) aggregate — one shuffle on partkey.
# --------------------------------------------------------------------------


@register(
    "cheapest_supplier_per_part",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY unit_cost, l_suppkey) AS rn
  FROM cost
)
SELECT p_partkey, p_name, s_name,
       CAST(FLOOR(unit_cost * 10000) AS BIGINT) AS unit_cost_e4
FROM ranked
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE rn = 1 AND p_size <= 15
""",
    tags=("tpch", "join", "window"),
    doc=(
        "Q2 shape: per-part argmin supplier by observed min unit price "
        "(window row_number over the (part,supp) aggregate; supplier-key "
        "tie-break)."
    ),
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_cost"), F.asc("l_suppkey")
    )
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 15)
        .select("p_partkey", "p_name")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.floor(F.col("unit_cost") * 10000).cast("bigint").alias("unit_cost_e4"),
        )
    )
