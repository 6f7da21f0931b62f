"""Composite analytic shapes over the events stream — the queries a
user of the daily-feed reference would grow into (funnel, cohort-style
distinct grouping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register

# --------------------------------------------------------------------------
# Funnel: users whose first signup precedes their first purchase, with
# time-to-convert.  One shuffle on user_id; conditional-min aggregates.
# --------------------------------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
  FROM events
  GROUP BY user_id
)
SELECT user_id,
       strftime(first_signup, '%Y-%m-%d %H:%M:%S') AS first_signup_s,
       strftime(first_purchase, '%Y-%m-%d %H:%M:%S') AS first_purchase_s,
       n_purchases,
       first_signup IS NOT NULL AND first_purchase > first_signup AS converted,
       CASE WHEN first_signup IS NOT NULL AND first_purchase > first_signup
            THEN epoch_us(first_purchase) - epoch_us(first_signup) END AS us_to_convert
FROM f
""",
    tags=("agg", "funnel", "events"),
    doc="Funnel: first-signup→first-purchase conversion with time-to-convert (µs).",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    first_signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    first_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    f = ev.groupBy("user_id").agg(
        first_signup.alias("first_signup"),
        first_purchase.alias("first_purchase"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    converted = F.col("first_signup").isNotNull() & (
        F.col("first_purchase") > F.col("first_signup")
    )
    us = F.expr("unix_micros(first_purchase) - unix_micros(first_signup)")
    return f.select(
        "user_id",
        F.date_format("first_signup", "yyyy-MM-dd HH:mm:ss").alias("first_signup_s"),
        F.date_format("first_purchase", "yyyy-MM-dd HH:mm:ss").alias("first_purchase_s"),
        "n_purchases",
        converted.alias("converted"),
        F.when(converted, us).alias("us_to_convert"),
    )


# --------------------------------------------------------------------------
# TPC-H Q16 shape: supplier-count per (brand, type, size) bucket —
# grouped COUNT(DISTINCT) with an anti-condition.
# --------------------------------------------------------------------------


@register(
    "parts_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p_brand, p_type, p_size
""",
    tags=("join", "agg", "distinct"),
    doc="Q16 shape: grouped distinct-supplier counts over filtered parts.",
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Sessionized conversion: window-ordered event sequences per user —
# did a purchase happen within the same 30-min session as a signup?
# --------------------------------------------------------------------------


@register(
    "session_sequence",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM marked
)
SELECT user_id, sess AS session_no,
       COUNT(*) AS n_events,
       MAX(CASE WHEN event_type = 'signup' THEN TRUE ELSE FALSE END) AS has_signup,
       MAX(CASE WHEN event_type = 'purchase' THEN TRUE ELSE FALSE END) AS has_purchase
FROM numbered
GROUP BY user_id, sess
""",
    tags=("window", "session", "events"),
    doc="Sessionized sequences: per-session signup/purchase co-occurrence flags.",
)
def session_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    numbered = ev.withColumn("sess", F.sum(is_new).over(run))
    return numbered.groupBy("user_id", F.col("sess").alias("session_no")).agg(
        F.count("*").alias("n_events"),
        F.max(F.col("event_type") == "signup").alias("has_signup"),
        F.max(F.col("event_type") == "purchase").alias("has_purchase"),
    )
