"""Scans, projections, filters, derived columns, casts (SURVEY.md §2.2).

The reference does all of this imperatively: nested-field traversal and
manual projection in a per-row Python loop
(``/root/reference/dags/my_data_pipeline.py:64-73``), dtype→SQL casts at
the sink (``:101-103``).  Here each is a declarative DataFrame transform
Catalyst can push into the Parquet scan — ``.explain`` on every query in
this module shows ``PushedFilters`` and a pruned ``ReadSchema``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import davg, day_str, dsum, sql_davg, sql_dsum

# --------------------------------------------------------------------------
# Flagship (SURVEY.md §7 phase 0): scan→filter→derive→group→agg→sort.
# TPC-H Q1 shape — the Spark re-expression of the reference's core product
# (per-key daily avg/max/min + summary stats, my_data_pipeline.py:67-75,:212).
#
# Scale notes: filter + projection push into the parquet scan; the group-by
# is a partial (map-side) HashAggregate → 2-key exchange → final aggregate,
# so the shuffle carries only |groups|×partitions rows; the final sort is
# over a handful of groups.  This plan is 100 TB-shaped as-is.
# --------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')}                                        AS sum_qty,
  {sql_dsum('l_extendedprice')}                                   AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}  AS sum_charge,
  {sql_davg('l_quantity')}                                        AS avg_qty,
  {sql_davg('l_extendedprice')}                                   AS avg_price,
  {sql_davg('l_discount')}                                        AS avg_disc,
  COUNT(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "pricing_summary",
    oracle=_Q1_ORACLE,
    tags=("flagship", "scan", "agg", "sort"),
    doc="TPC-H Q1-shape pricing summary: the flagship scan→agg→sort query.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# P3: projection + rename (my_data_pipeline.py:67-73 selects {day,avg,max,min}
# and emits prefixed column names).
# --------------------------------------------------------------------------


@register(
    "project_rename",
    oracle="""
SELECT o_orderkey AS order_id,
       o_orderstatus AS status,
       o_totalprice AS total_price
FROM orders
""",
    tags=("projection",),
    doc="P3: column projection + rename; Catalyst prunes the scan to 3 columns.",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# P5: comparison / BETWEEN / IN / LIKE predicates, pushed to the scan.
# --------------------------------------------------------------------------


@register(
    "filter_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice AS price, l_returnflag
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
  AND l_returnflag IN ('A', 'N')
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
""",
    tags=("filter",),
    doc="P5: conjunction of range/membership predicates — all pushed to Parquet.",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "N")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        "l_returnflag",
    )


@register(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%a%' OR p_name LIKE 'b%'
""",
    tags=("filter", "string"),
    doc="P5: LIKE predicates (prefix + infix) on part.",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").like("%a%") | F.col("p_name").like("b%")).select(
        "p_partkey", "p_name", "p_type"
    )


# --------------------------------------------------------------------------
# P4/F1: derived scalar column.  Exact parity with Python str.capitalize()
# (my_data_pipeline.py:69 `city.capitalize()`): uppercase first char of the
# whole string, lowercase the rest — NOT initcap (SURVEY.md §2.8 F1 note).
# --------------------------------------------------------------------------


@register(
    "derive_capitalize",
    oracle="""
SELECT c_custkey,
       UPPER(SUBSTRING(c_name, 1, 1)) || LOWER(SUBSTRING(c_name, 2)) AS name_cap,
       c_mktsegment
FROM customer
""",
    tags=("projection", "string"),
    doc="P4: derived scalar column replicating Python str.capitalize() semantics.",
)
def derive_capitalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    cap = F.concat(
        F.upper(F.substring(F.col("c_name"), 1, 1)),
        F.lower(F.expr("substring(c_name, 2)")),
    )
    return c.select("c_custkey", cap.alias("name_cap"), "c_mktsegment")


# --------------------------------------------------------------------------
# P6: type casts (the reference's dtype→SQL map, my_data_pipeline.py:101-103).
# --------------------------------------------------------------------------


@register(
    "cast_types",
    oracle="""
SELECT l_orderkey,
       CAST(l_quantity AS BIGINT) AS qty_int,
       CAST(l_linenumber AS DOUBLE) AS line_dbl,
       strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
       l_quantity > 25 AS is_bulk
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
    tags=("cast",),
    doc="P6: int/double/date/bool casts mirroring the reference's type map.",
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        day_str(F.col("l_shipdate").cast("date")).alias("ship_day"),
        (F.col("l_quantity") > 25).alias("is_bulk"),
    )


# --------------------------------------------------------------------------
# P1/P2: nested-field extraction + existence predicate over JSON
# (my_data_pipeline.py:64-65 traverses data['forecast']['daily'][c];
# fixture carrier is events.props JSON strings, TESTDATA).
# --------------------------------------------------------------------------


@register(
    "json_extract_filter",
    oracle="""
SELECT event_id,
       user_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
  AND CAST(json_extract(props, '$.k') AS INTEGER) > 50
""",
    tags=("json", "filter"),
    doc="P1+P2: nested JSON field extraction with null-safe existence filter.",
)
def json_extract_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull() & (F.col("k") > 50))
        .select("event_id", "user_id", "k")
    )


# --------------------------------------------------------------------------
# Regression: empty-result schema stability (SURVEY.md §7 watch list #7 —
# the reference yields a zero-column frame for a missing group,
# my_data_pipeline.py:64,75; Spark must keep the declared schema).
# --------------------------------------------------------------------------


@register(
    "empty_result_schema",
    oracle="""
SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_quantity < -1
GROUP BY l_orderkey
""",
    tags=("filter", "regression"),
    doc="Empty filter result keeps declared schema (zero rows, stable columns).",
)
def empty_result_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") < -1)
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
    )


# --------------------------------------------------------------------------
# A2-adjacent daily rollup: the reference's core product is a per-(day,
# country) avg/max/min table per contaminant (my_data_pipeline.py:67-75);
# computed here from raw events instead of consuming API-precomputed values.
# --------------------------------------------------------------------------


@register(
    "daily_event_stats",
    oracle=f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       event_type,
       {sql_davg('value')} AS daily_avg,
       MAX(value) AS daily_max,
       MIN(value) AS daily_min,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
""",
    tags=("agg", "events"),
    doc="A2: grouped avg/max/min per (day, key) computed from raw events.",
)
def daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(day_str("ts").alias("day"), F.col("event_type"))
        .agg(
            davg("value").alias("daily_avg"),
            F.max("value").alias("daily_max"),
            F.min("value").alias("daily_min"),
            F.count("*").alias("n"),
        )
    )
