"""Window functions W1–W4 (SURVEY.md §2.5).

Nothing in the reference is windowed — but its daily feed
(``/root/reference/dags/airflow_dag.py:27``) makes day-over-day deltas
(lag) and running aggregates the natural extension queries.

Determinism rules used throughout:
- every window ORDER BY carries a unique tiebreaker key, so frame
  contents are identical in both engines;
- windowed SUM/AVG go through DECIMAL so segment-tree vs incremental
  accumulation order cannot produce ULP drift.

Scale notes: a window = one shuffle on partitionBy keys + per-partition
sort.  Partition keys here (user_id, custkey, nationkey) are
high-cardinality, so no single task ever sees unbounded state — except
the deliberate global-window quantile query in aggregates.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import DEC, ts_str

# --------------------------------------------------------------------------
# W1: ranking family.
# --------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
SELECT c_custkey,
       c_nationkey,
       ROW_NUMBER() OVER w AS rn,
       NTILE(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
    tags=("window", "rank"),
    doc="W1: row_number + ntile per nation, fully tie-broken ordering.",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_rank_ties",
    oracle="""
SELECT event_id,
       user_id,
       CAST(FLOOR(value / 50) AS INTEGER) AS val_bucket,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(value / 50) AS INTEGER))
""",
    tags=("window", "rank"),
    doc="W1: rank vs dense_rank with genuine ties (bucketed ordering key).",
)
def window_rank_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50).cast("int")
    w = Window.partitionBy("user_id").orderBy(bucket)
    return ev.select(
        "event_id",
        "user_id",
        bucket.alias("val_bucket"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# --------------------------------------------------------------------------
# W2: analytic lag/lead — inter-event gap per user in microseconds
# (integer math: no float drift possible).
# --------------------------------------------------------------------------


@register(
    "window_lag_lead",
    oracle="""
SELECT event_id,
       user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       LEAD(event_id) OVER w AS next_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window", "analytic"),
    doc="W2: lag/lead per user — gap to previous event (µs), next event id.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    return ev.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts_s"),
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


# --------------------------------------------------------------------------
# W3: frame-spec aggregates — running sum and 7-row moving average,
# decimal-exact inside the frame.
# --------------------------------------------------------------------------


@register(
    "window_running",
    oracle="""
SELECT event_id,
       user_id,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_sum,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / COUNT(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS moving_avg7
FROM events
""",
    tags=("window", "frame"),
    doc="W3: running sum + 7-row moving average per user (decimal-exact frames).",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-6, Window.currentRow)
    dec_val = F.col("value").cast(DEC)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec_val).over(run).cast("double").alias("running_sum"),
        (F.sum(dec_val).over(mov).cast("double") / F.count("value").over(mov))
        .cast("double")
        .alias("moving_avg7"),
    )


# --------------------------------------------------------------------------
# W4: top-k per group — row_number + filter, the scalable pattern (each
# group's sort is local after one shuffle; no global sort, no collect).
# --------------------------------------------------------------------------


@register(
    "window_topk",
    oracle="""
SELECT *
FROM (
  SELECT o_custkey,
         o_orderkey,
         o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
)
WHERE rn <= 3
""",
    tags=("window", "topk"),
    doc="W4: top-3 orders per customer via row_number + filter.",
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# W1b: distribution ranking — percent_rank / cume_dist / ntile.  All three
# are exact rationals of ranks and counts, so the doubles are bit-identical
# across engines; the ORDER BY carries a unique tiebreaker (o_orderkey).
# --------------------------------------------------------------------------


@register(
    "window_percentiles",
    oracle="""
SELECT o_orderpriority,
       o_orderkey,
       o_totalprice,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       NTILE(4) OVER w AS quartile
FROM orders
WHERE o_orderstatus = 'F'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    tags=("window", "rank"),
    doc="W1: percent_rank / cume_dist / ntile(4) per order priority.",
)
def window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# W6: RANGE frame over event time — "last hour per user", the frame kind
# ROWS cannot express (peers by VALUE distance, not row count).  Ordered
# on integer microseconds so the frame bound is exact in both engines;
# ties (equal timestamps) are frame peers, so the result is order-
# deterministic without a tiebreaker.
# --------------------------------------------------------------------------


@register(
    "window_time_range",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS val_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame", "range"),
    doc=(
        "W6: trailing-1-hour RANGE frame per user (count + decimal-exact "
        "sum).  Partitioned by user — distributes across the keyspace; "
        "the range bound rides the sorted run within each partition."
    ),
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("ts_us", F.expr("unix_micros(ts)"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("val_last_hour"),
    )
