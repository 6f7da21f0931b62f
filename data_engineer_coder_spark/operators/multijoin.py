"""Multi-way join suite — the TPC-H join-planning shapes (Q5/Q7/Q8/Q10/
Q13/Q15/Q19) the reference's single-table feed would grow into at
warehouse scale.

Scale posture shared by all of these: the big sides (lineitem, orders)
shuffle on their join keys exactly once per join; nation/region are
broadcast explicitly; customer/supplier are left to Catalyst + AQE
(broadcast at bench scale, shuffle-hash beyond the threshold at 100 TB —
the plan degrades gracefully because nothing here *requires* a small
side).  Date-range filters sit directly on the scan columns so they push
down to parquet, and every money aggregate uses the exact-decimal
helpers so the driver's value hash is bit-identical vs DuckDB.

Reference analogue: the reference joins nothing (single air-quality
table, my_data_pipeline.py:50-115); this module is the §2.3 growth
surface mandated by SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import dsum, sql_dsum

# NOTE: must stay lazy — building a Column at module import requires an
# active SparkContext, and the registry imports this module before the
# caller necessarily has one.
def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


def _ts(s: str):
    return F.lit(s + " 00:00:00").cast("timestamp")


# --------------------------------------------------------------------------
# Q5 shape: revenue by nation for one region, customer and supplier
# co-national.  Five joins; lineitem⋈orders is the only big-big pair.
# --------------------------------------------------------------------------


@register(
    "regional_supplier_volume",
    oracle=f"""
SELECT n_name, {sql_dsum(_SQL_REV)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    tags=("join", "tpch"),
    doc="Q5 shape: regional revenue, customer and supplier in the same nation.",
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev().alias("rev")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum("rev").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q7 shape: bilateral shipping volume between two nations by ship year.
# The disjunctive nation-pair predicate lands on broadcast dims, so the
# big fact join is untouched.
# --------------------------------------------------------------------------


@register(
    "bilateral_shipping_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       {sql_dsum(_SQL_REV)} AS revenue
FROM supplier
JOIN lineitem  ON s_suppkey = l_suppkey
JOIN orders    ON o_orderkey = l_orderkey
JOIN customer  ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
""",
    tags=("join", "tpch"),
    doc="Q7 shape: two-nation trade volume by year, disjunctive dim predicate.",
)
def bilateral_shipping_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", _rev().alias("rev"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(nat.withColumnRenamed("n_name", "supp_nation"))
    n2 = F.broadcast(
        nat.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
            "n_nationkey", "c_nkey"
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum("rev").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 shape: one nation's market share inside a region's PROMO-part market,
# by order year.  Conditional share-of-total over an exact decimal sum —
# the same single-division determinism contract as promo_revenue_share.
# --------------------------------------------------------------------------


@register(
    "market_share_by_year",
    oracle=f"""
WITH all_nations AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         {_SQL_REV} AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem  ON p_partkey = l_partkey
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       {sql_dsum("CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END")}
         / {sql_dsum("volume")} AS mkt_share
FROM all_nations
GROUP BY o_year
""",
    tags=("join", "tpch"),
    doc="Q8 shape: supplier-nation market share within a regional part market.",
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", _rev().alias("volume")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation")
    n1 = F.broadcast(nat.select("n_nationkey", "n_regionkey"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = F.broadcast(
        nat.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    all_nations = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == n1.n_nationkey)
        .join(r, n1.n_regionkey == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            "volume",
            "nation",
        )
    )
    target = F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0))
    return all_nations.groupBy("o_year").agg(
        (dsum(target) / dsum("volume")).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q10 shape: top customers by revenue lost to returned items in a quarter.
# Deterministic top-20: revenue desc with c_custkey tiebreak →
# TakeOrderedAndProject, never a global sort.
# --------------------------------------------------------------------------


@register(
    "returned_item_losses",
    oracle=f"""
SELECT c_custkey, c_name, n_name, {sql_dsum(_SQL_REV)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "tpch", "topk"),
    doc="Q10 shape: returned-item revenue loss per customer, top 20.",
)
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-10-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev().alias("rev"))
    )
    n = F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum("rev").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 shape: customer distribution by order count.  The priority filter
# lives in the JOIN condition (not WHERE) so customers with zero matching
# orders survive the left join — the classic outer-join-filter distinction.
# --------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    tags=("join", "tpch"),
    doc="Q13 shape: histogram of per-customer order counts, filter inside the outer join.",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 shape: supplier(s) with the maximum quarterly revenue.  The max is an
# exact decimal-sum double, so cross-engine equality against it is safe;
# it reaches the filter as a broadcast scalar, not a single-task sort.
# --------------------------------------------------------------------------


@register(
    "top_supplier_revenue",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum(_SQL_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
    tags=("join", "tpch", "subquery"),
    doc="Q15 shape: top supplier by quarterly revenue via scalar-max subquery.",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .select("l_suppkey", _rev().alias("rev"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum("rev").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_max"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q19 shape: revenue under an OR-of-ANDs predicate spanning both join
# sides.  The shared l_partkey = p_partkey conjunct stays an equi-join;
# only the residual disjunction is a post-join filter.
# --------------------------------------------------------------------------

_Q19_SQL = """(
     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
)"""


@register(
    "disjunctive_predicate_revenue",
    oracle=f"""
SELECT {sql_dsum(_SQL_REV)} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_SQL}
""",
    tags=("join", "tpch"),
    doc="Q19 shape: OR-of-ANDs residual predicate over an equi-join.",
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _rev().alias("rev")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    def band(brand: str, s0: int, s1: int, q0: int, q1: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s0, s1)
            & F.col("l_quantity").between(q0, q1)
        )

    cond = (
        band("Brand#1", 1, 15, 1, 20)
        | band("Brand#2", 10, 30, 10, 35)
        | band("Brand#3", 20, 50, 20, 50)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum("rev").alias("revenue"), F.count("*").alias("n_items"))
    )


# --------------------------------------------------------------------------
# Ratio-to-report: each nation's share of its region's revenue.  The
# share window runs over the ~25-row (region, nation) AGGREGATE, so
# partitioning by region is cosmetic at fixture scale but exactly right
# at 100 TB: the heavy work is the one lineitem shuffle into the agg;
# the window never touches fact rows.
# --------------------------------------------------------------------------


@register(
    "revenue_share_within_region",
    oracle=f"""
WITH a AS (
  SELECT r_name, n_name, {sql_dsum(_SQL_REV)} AS revenue
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name, revenue,
       ROUND(revenue / CAST(SUM(CAST(revenue AS DECIMAL(38,6)))
                            OVER (PARTITION BY r_name) AS DOUBLE), 6) AS region_share
FROM a
""",
    tags=("join", "window", "ratio"),
    doc="Ratio-to-report: nation revenue share within region (window over the aggregate).",
)
def revenue_share_within_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select("l_suppkey", _rev().alias("rev"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    a = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum("rev").alias("revenue"))
    )
    # The denominator is a window sum over DOUBLEs: accumulation order is
    # engine-dependent, so a last-ULP wobble could flip the ROUND at a
    # 5e-7 boundary.  Decimal-cast the window sum on both sides (revenue
    # is decimal-rooted ≤6dp, so the cast is lossless) — the ADVICE r4/r5
    # float-determinism pattern applied to window aggregates.
    w = Window.partitionBy("r_name")
    denom = F.sum(F.col("revenue").cast("decimal(38,6)")).over(w).cast("double")
    return a.select(
        "r_name",
        "n_name",
        "revenue",
        F.round(F.col("revenue") / denom, 6).alias("region_share"),
    )
