"""Composite analytic shapes over the events stream — the queries a
user of the daily-feed reference would grow into (funnel, cohort-style
distinct grouping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import DEC, dsum, sql_davg, sql_dsum

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
SELECT user_id,
       -- windowed SUM(int) is HUGEINT in DuckDB, which pandas materializes
       -- as float64 and breaks the value hash vs Spark's bigint
       CAST(sess AS BIGINT) AS session_no,
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


# --------------------------------------------------------------------------
# TPC-H Q12 shape: late shipments by line status × order priority class.
# Conditional aggregation after a fact-fact equi-join on the order key —
# at scale both sides shuffle-partition on l_orderkey/o_orderkey (or come
# pre-bucketed on it), never a broadcast.
# --------------------------------------------------------------------------


@register(
    "late_shipment_priority",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
""",
    tags=("join", "agg", "tpch"),
    doc=(
        "Q12 shape: lines shipped >60 days after order placement, counted "
        "into high/low priority classes per line status (conditional sums "
        "over a fact-fact join)."
    ),
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share per ship month.  Broadcast the
# part dim into the lineitem scan; one hash aggregate; the ratio of two
# decimal-exact sums is bit-deterministic cross-engine.
# --------------------------------------------------------------------------


@register(
    "promo_revenue_share",
    oracle=f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS promo_revenue,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue,
       {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
         / {sql_dsum("l_extendedprice * (1 - l_discount)")} AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""",
    tags=("join", "agg", "tpch"),
    doc=(
        "Q14 shape: fraction of revenue from PROMO-type parts per ship "
        "month (conditional / total sum ratio, broadcast part dim)."
    ),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    out = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(dsum(promo_rev).alias("promo_revenue"), dsum(rev).alias("total_revenue"))
    )
    return out.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: high-balance customers with no orders, per market
# segment.  Scalar-subquery threshold (broadcast 1-row aggregate) +
# anti-join against the fact table.
# --------------------------------------------------------------------------


@register(
    "idle_customer_balance",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       {sql_dsum("c_acctbal")} AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT {sql_davg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
    tags=("subquery", "join", "agg", "tpch"),
    doc=(
        "Q22 shape: customers above the positive-balance average with no "
        "urgent orders, counted per market segment (scalar subquery + anti "
        "join; the fixture has no order-less customers, so the anti side "
        "filters to urgent orders to stay selective)."
    ),
)
def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._helpers import davg  # local import keeps module header tight

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")  # pushed to the scan
        .select("o_custkey")
    )
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal").alias("_avg"))
    return (
        c.join(F.broadcast(thresh))  # 1-row scalar broadcast
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


# --------------------------------------------------------------------------
# Time-series resample + gap fill: regularize each user's event stream to a
# daily grid (their own min..max day), forward-filling days with no events.
# The scheduled daily feed in the reference (airflow_dag.py:27, one run/day)
# assumes a dense daily grid; this operator CREATES that grid from sparse
# event data — the standard "resample + ffill" time-series primitive.
#
# Scale posture: one hash agg on (user_id, day); the spine is
# sequence()+explode per user (rows ∝ user's active span, no cross join);
# the fill is a per-user running window — partitioned by user_id, never
# global.  Everything shuffles on user_id once and stays co-partitioned.
# --------------------------------------------------------------------------


@register(
    "resample_daily_fill",
    oracle=f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, {sql_davg("value")} AS day_value
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS DATE) AS day
  FROM daily GROUP BY user_id
),
f AS (
  SELECT s.user_id, s.day, d.day_value
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       LAST_VALUE(day_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       day_value IS NULL AS was_gap
FROM f
""",
    tags=("analytics", "timeseries"),
    doc="Time-series resample to a per-user daily grid with forward fill.",
)
def resample_daily_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample + forward fill per user (dense grid from sparse events)."""
    from ._helpers import davg

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        davg("value").alias("day_value")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    filled = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("day_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("day_value").isNull().alias("was_gap"),
    )


# --------------------------------------------------------------------------
# Streaming-style anomaly scoring: each event z-scored against the
# expanding history of ITS OWN user (frame ends at 1 PRECEDING — the
# current value never contaminates its baseline).  Running moments are
# exact decimal sums inside the frame, so mean/std/z go through the
# identical double expression tree in both engines.  Per-user window →
# distributes on user_id; the streaming twin is applyInPandasWithState
# carrying (n, Σx, Σx²) per key.
# --------------------------------------------------------------------------


@register(
    "anomaly_zscore",
    oracle="""
WITH b AS (
  SELECT event_id, user_id, value,
         COUNT(value) OVER w AS n_prev,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s_prev,
         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2_prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, value,
       (value - s_prev / n_prev)
         / SQRT((s2_prev - s_prev * s_prev / n_prev) / (n_prev - 1)) AS z,
       ABS((value - s_prev / n_prev)
         / SQRT((s2_prev - s_prev * s_prev / n_prev) / (n_prev - 1))) > 3.0 AS is_anomaly
FROM b
WHERE n_prev >= 10 AND (s2_prev - s_prev * s_prev / n_prev) > 0
""",
    tags=("analytics", "timeseries", "window"),
    doc="Expanding-history z-score per user (leave-one-out frame) + |z|>3 flag.",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._helpers import DEC

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v = F.col("value")
    b = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count("value").over(w).alias("n_prev"),
        F.sum(v.cast(DEC)).over(w).cast("double").alias("s_prev"),
        F.sum((v * v).cast(DEC)).over(w).cast("double").alias("s2_prev"),
    )
    n, s, s2 = F.col("n_prev"), F.col("s_prev"), F.col("s2_prev")
    var_num = s2 - s * s / n
    z = (v - s / n) / F.sqrt(var_num / (n - 1))
    return b.filter((n >= 10) & (var_num > 0)).select(
        "event_id", "user_id", "value", z.alias("z"), (F.abs(z) > 3.0).alias("is_anomaly")
    )


# --------------------------------------------------------------------------
# Cohort retention: users bucketed by first-seen week, counted in every
# week they return.  Two hash aggs + one equi-join on user_id — the
# canonical retention-matrix shape; weeks are integer epochs (floor of
# days-since-epoch / 7) so both engines bucket identically with no
# locale/week-start semantics in play.
# --------------------------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
WITH w AS (
  SELECT user_id,
         CAST(FLOOR(EPOCH(ts) / 604800) AS BIGINT) AS wk
  FROM events
),
firsts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id)
SELECT f.cohort_wk,
       a.wk - f.cohort_wk AS weeks_since,
       COUNT(DISTINCT a.user_id) AS active_users
FROM (SELECT DISTINCT user_id, wk FROM w) a
JOIN firsts f USING (user_id)
GROUP BY f.cohort_wk, a.wk - f.cohort_wk
""",
    tags=("analytics", "cohort"),
    doc="Retention matrix: distinct users per (first-seen week, weeks since).",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    wk = F.floor(F.unix_timestamp("ts") / 604800).cast("bigint")
    w = ev.select("user_id", wk.alias("wk")).distinct()
    firsts = w.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        w.join(firsts, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("weeks_since"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


# --------------------------------------------------------------------------
# Bitmap presence aggregate: OR each user's events into a 7-bit weekday
# bitmap, popcount for days-active.  The bitmap-index trick — presence
# sets as machine ints, mergeable with OR (associative ⇒ partial-agg and
# partition-order safe), the building block of roaring-bitmap audience
# engines.  Weekday convention: Spark `weekday` == DuckDB `isodow - 1`
# (Mon=0).
# --------------------------------------------------------------------------


@register(
    "user_activity_bitmap",
    oracle="""
SELECT user_id,
       CAST(BIT_OR(1 << (ISODOW(ts) - 1)) AS BIGINT) AS weekday_bitmap,
       CAST(BIT_COUNT(BIT_OR(1 << (ISODOW(ts) - 1))) AS INTEGER) AS days_active,
       BIT_OR(1 << (ISODOW(ts) - 1)) & 96 <> 0 AS any_weekend
FROM events
GROUP BY user_id
""",
    tags=("analytics", "bitmap", "agg"),
    doc="Weekday-presence bitmap per user via bit_or + bit_count (mergeable set encoding).",
)
def user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # python-API shiftleft only takes a literal shift; the SQL form shifts
    # by a column expression
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), weekday(ts))")
    bm = F.bit_or(bit)
    return ev.groupBy("user_id").agg(
        bm.alias("weekday_bitmap"),
        F.bit_count(bm).cast("int").alias("days_active"),
        (bm.bitwiseAND(F.lit(96)) != 0).alias("any_weekend"),
    )


# --------------------------------------------------------------------------
# Capped sessionization — the production session rule (gap timeout AND a
# hard duration cap, the web-analytics convention): first assign
# gap-based sessions (gaps-and-islands), then split each at every
# cap-multiple of elapsed time from its own start.  Three window passes
# over the same (user_id) partitioning — one shuffle, the splits are
# pure arithmetic.  epoch-second integers keep every derived value
# exact across engines.
# --------------------------------------------------------------------------


@register(
    "session_capped",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM marked
), anchored AS (
  SELECT user_id, ts, event_id, sess,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT)
           - MIN(CAST(FLOOR(EPOCH(ts)) AS BIGINT))
               OVER (PARTITION BY user_id, sess) AS elapsed_s
  FROM numbered
)
SELECT user_id,
       -- windowed SUM(int) is HUGEINT in DuckDB → float64 via pandas;
       -- cast to match Spark's bigint in the value hash
       CAST(sess AS BIGINT) AS session_no,
       CAST(FLOOR(elapsed_s / 3600) AS BIGINT) AS subsession,
       COUNT(*) AS n_events,
       CAST(MAX(elapsed_s) - MIN(elapsed_s) AS BIGINT) AS span_s
FROM anchored
GROUP BY user_id, sess, CAST(FLOOR(elapsed_s / 3600) AS BIGINT)
""",
    tags=("window", "session", "events"),
    doc="Sessionization with 30-min gap + 1-hour hard cap (subsession splits).",
)
def session_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Full-precision timestamp gap, identical to the oracle's
    # `ts - LAG(ts) > INTERVAL 30 MINUTE` — a floor-seconds diff would
    # disagree for gaps in (1800 s, 1801 s) whose fractional parts truncate
    # to exactly 1800.
    prev_ts = F.lag("ts").over(wo)
    marked = ev.withColumn(
        "is_new",
        F.when(
            prev_ts.isNull()
            | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn("sess", F.sum("is_new").over(run))
    ws = Window.partitionBy("user_id", "sess")
    # Epoch seconds per row (floor), matching the oracle's FLOOR(EPOCH(ts));
    # unix_micros requires LTZ, which io/tables.py guarantees, and avoids the
    # timestamp→bigint cast Spark 4 ANSI mode rejects.  Micros < 2^53 so the
    # double division is exact before floor.
    epoch_s = F.floor(F.unix_micros(F.col("ts")) / 1_000_000).cast("long")
    anchored = numbered.withColumn(
        "elapsed_s",
        epoch_s - F.min(epoch_s).over(ws),
    )
    return (
        anchored.groupBy(
            "user_id",
            F.col("sess").alias("session_no"),
            F.floor(F.col("elapsed_s") / 3600).cast("bigint").alias("subsession"),
        )
        .agg(
            F.count("*").alias("n_events"),
            (F.max("elapsed_s") - F.min("elapsed_s")).cast("bigint").alias("span_s"),
        )
    )


# --------------------------------------------------------------------------
# Cumulative distinct users per day.  Spark has no COUNT(DISTINCT) OVER,
# and the naive rewrite (collect_set over a running frame) holds the
# whole keyspace per row.  The scale-safe rewrite: each user counts once
# on their FIRST day (one shuffle on user_id), then a running sum over
# the ≤ n_days daily rows.  The oracle uses the identical rewrite, so
# the check is engine-exact, not estimate-vs-estimate.
# --------------------------------------------------------------------------


@register(
    "cumulative_distinct_users",
    oracle="""
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
),
daily AS (
  SELECT d, COUNT(*) AS new_users FROM first_day GROUP BY d
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       new_users,
       -- windowed SUM(int) is HUGEINT in DuckDB → float64 via pandas;
       -- cast to match Spark's bigint in the value hash
       CAST(SUM(new_users) OVER (ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM daily
""",
    tags=("analytics", "window", "distinct"),
    doc="Running distinct-user count via the first-seen-day rewrite (no COUNT(DISTINCT) OVER).",
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    first_day = ev.groupBy("user_id").agg(F.min("d").alias("d"))
    daily = first_day.groupBy("d").agg(F.count("*").alias("new_users"))
    # ≤ ~30 daily rows: a single-partition running window here is fine at
    # any SF because the cardinality is bounded by the calendar, not the data.
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


# --------------------------------------------------------------------------
# Month-over-month revenue growth: monthly agg + LAG.  The window runs
# over ≤ n_months rows (bounded by the calendar), so the unpartitioned
# ordering is scale-safe; all the data-sized work is in the groupBy.
# --------------------------------------------------------------------------


@register(
    "revenue_growth_monthly",
    oracle=f"""
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, {sql_dsum('o_totalprice')} AS revenue
  FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
)
SELECT month, revenue,
       LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
       CASE WHEN LAG(revenue) OVER (ORDER BY month) IS NOT NULL
            THEN ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
                       / LAG(revenue) OVER (ORDER BY month), 6) END AS growth
FROM m
""",
    tags=("analytics", "window", "timeseries"),
    doc="Monthly revenue with LAG-based growth rate (calendar-bounded window).",
)
def revenue_growth_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        dsum("o_totalprice").alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(
            prev.isNotNull(), F.round((F.col("revenue") - prev) / prev, 6)
        ).alias("growth"),
    )


# --------------------------------------------------------------------------
# Sweep-line concurrency: max number of simultaneously-open 1-hour event
# windows per event type.  Classic interval problem with no native
# operator in either engine: emit +1/-1 boundary rows, running-sum in
# boundary order.  Partitioned by event_type, so each window handles one
# type's boundaries; at 100 TB you'd sub-partition by (type, day) and
# carry opening counts across — noted, not needed at fixture scale.
# --------------------------------------------------------------------------


@register(
    "max_concurrent_events",
    oracle="""
WITH b AS (
  SELECT event_type, ts AS bts, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 1 HOUR, -1 FROM events
),
r AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY bts, delta
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_now
  FROM b
)
SELECT event_type, CAST(MAX(open_now) AS BIGINT) AS max_concurrent
FROM r GROUP BY event_type
""",
    tags=("analytics", "window", "interval"),
    doc="Max simultaneously-open 1h windows per type via +1/-1 sweep line.",
)
def max_concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    starts = ev.select("event_type", F.col("ts").alias("bts"), F.lit(1).alias("delta"))
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("bts"),
        F.lit(-1).alias("delta"),
    )
    b = starts.unionAll(ends)
    # Order ties (delta -1 before +1) so a window closing exactly when
    # another opens never overstates concurrency — both engines identically.
    w = (
        Window.partitionBy("event_type")
        .orderBy("bts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = b.withColumn("open_now", F.sum("delta").over(w))
    return r.groupBy("event_type").agg(F.max("open_now").alias("max_concurrent"))


# --------------------------------------------------------------------------
# Market-basket co-occurrence: part pairs appearing in the same order.
# The self-join explodes quadratically in per-order basket size, so the
# pair space is generated per-order (k·(k−1)/2, not k²) with p1 < p2;
# at 100 TB the same plan holds because baskets are small and the join
# key (orderkey) is the natural shuffle key — the quadratic term is
# per-basket, never per-partition.
# --------------------------------------------------------------------------


@register(
    "order_item_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT p1, p2, COUNT(*) AS n_orders
FROM pairs
GROUP BY p1, p2
HAVING COUNT(*) >= 2
""",
    tags=("analytics", "join", "basket"),
    doc="Part pairs co-occurring in ≥2 orders (market-basket self-join).",
)
def order_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle on l_orderkey (collect_set IS the distinct), then the
    # k·(k−1)/2 combinations are generated array-side per basket — no
    # self-join, no second scan, everything in whole-stage codegen.
    baskets = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("parts"),
                    lambda x, i: F.transform(
                        F.slice(F.col("parts"), i + 2, F.size("parts")),
                        lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                    ),
                )
            )
        ).alias("pair")
    ).select("pair.p1", "pair.p2")
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


# --------------------------------------------------------------------------
# Windowed dedup: keep the first event per (user, type) per 10-minute
# tumbling window — the batch twin of streaming dropDuplicates-with-
# watermark (stream_dedup), sharing its key+window bucketing.  One
# shuffle on the composite key; ties broken by event_id for determinism.
# --------------------------------------------------------------------------


@register(
    "dedup_within_window",
    oracle="""
WITH w AS (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type,
                        CAST(FLOOR(EPOCH(ts) / 600) AS BIGINT)
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_type, event_id, value
FROM w WHERE rn = 1
""",
    tags=("analytics", "dedup", "window", "events"),
    doc="First event per (user, type, 10-min bucket) — batch twin of stream_dedup.",
)
def dedup_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_micros(F.col("ts")) / F.lit(600_000_000)).cast("bigint")
    w = Window.partitionBy("user_id", "event_type", bucket).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# --------------------------------------------------------------------------
# RFM segmentation: quartile scores for recency/frequency/monetary per
# customer, then segment population counts.  A naive global NTILE window
# is a single-partition sort over every customer — fine in the oracle,
# wrong at 100 TB.  Instead each metric gets a range-partitioned global
# rank (with_global_pos) and NTILE's bucket assignment is applied as its
# closed form: with n = q·k + m, the first m buckets take q+1 rows —
# bucket(rn) = ceil(rn/(q+1)) while rn ≤ m·(q+1), else
# m + ceil((rn − m·(q+1))/q).  Bit-identical to NTILE, fully distributed.
# --------------------------------------------------------------------------


@register(
    "rfm_segmentation",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         {sql_dsum('o_totalprice')} AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
         NTILE(4) OVER (ORDER BY frequency, o_custkey)  AS f_score,
         NTILE(4) OVER (ORDER BY monetary, o_custkey)   AS m_score
  FROM cust
)
SELECT r_score, f_score, m_score, COUNT(*) AS n_customers
FROM scored GROUP BY r_score, f_score, m_score
""",
    tags=("analytics", "window", "segmentation"),
    doc="RFM quartile segmentation of customers with deterministic ntile tiebreaks.",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._helpers import with_global_pos

    o = table(spark, sf_dir, "orders")
    # Checkpoint the customer aggregate: each of the three rank passes
    # references its input twice (ranked rows + per-partition offsets),
    # so chaining them would otherwise re-derive the orders scan+agg
    # 2^3 times (same pattern as dedup_clusters' per-round checkpoint).
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            dsum("o_totalprice").alias("monetary"),
        )
        .localCheckpoint()
    )

    def ntile4(rn, n):
        q = F.floor(n / 4)
        m = n % 4
        head = m * (q + 1)
        return (
            F.when(rn <= head, F.ceil(rn / (q + 1)))
            .otherwise(m + F.ceil((rn - head) / q))
            .cast("int")
        )

    n_total = cust.agg(F.count("*").alias("_n"))
    scored = cust
    for metric, tiebreak, out in (
        ("last_order", "o_custkey", "r_score"),
        ("frequency", "o_custkey", "f_score"),
        ("monetary", "o_custkey", "m_score"),
    ):
        # pos_name must avoid with_global_pos's internal _rn/_pid/_off names
        scored = with_global_pos(
            scored, [F.asc(metric), F.asc(tiebreak)], pos_name="_gpos"
        )
        scored = scored.crossJoin(F.broadcast(n_total)).withColumn(
            out, ntile4(F.col("_gpos"), F.col("_n"))
        ).drop("_gpos", "_n")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers")
    )


# --------------------------------------------------------------------------
# Shipping-delay distribution: week-bucketed histogram of order→ship
# lag over the fact-fact join.  Day arithmetic runs on DATEs in both
# engines (timestamp day-boundary semantics differ); the join shuffles
# on the order key once, the histogram agg is map-side combinable.
# --------------------------------------------------------------------------


@register(
    "shipping_delay_distribution",
    oracle=f"""
SELECT CAST(FLOOR(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) / 7) AS BIGINT) AS delay_weeks,
       COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY CAST(FLOOR(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) / 7) AS BIGINT)
""",
    tags=("analytics", "join", "histogram"),
    doc="Histogram of order→ship delay in weeks with revenue mass per bucket.",
)
def shipping_delay_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.to_date("l_shipdate").alias("ship_d"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("order_d")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    bucket = F.floor(F.datediff(F.col("ship_d"), F.col("order_d")) / 7).cast("bigint")
    return j.groupBy(bucket.alias("delay_weeks")).agg(
        F.count("*").alias("n_lines"),
        dsum("rev").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Robust outliers via MAD: median and median-absolute-deviation per
# event type (both exact lower-median order statistics — no engine
# interpolation), flag |v − med| > 3·1.4826·MAD.  Two per-group window
# passes; both partition by event_type, so the sorts distribute.  The
# rank-selection median is the same trick as group_quantiles but
# type-1 (no interpolation) so every intermediate is a raw input value.
# --------------------------------------------------------------------------


@register(
    "robust_outlier_counts",
    oracle="""
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, MIN(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS med
  FROM r GROUP BY event_type
),
d AS (
  SELECT r.event_type, r.value, med.med, ABS(r.value - med.med) AS dev,
         ROW_NUMBER() OVER (PARTITION BY r.event_type ORDER BY ABS(r.value - med.med), r.rn) AS drn,
         COUNT(*) OVER (PARTITION BY r.event_type) AS n
  FROM r JOIN med ON r.event_type = med.event_type
),
mad AS (
  SELECT event_type, MIN(CASE WHEN drn = CEIL(n * 0.5) THEN dev END) AS mad
  FROM d GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n_events,
       MIN(d.med) AS median_value,
       MIN(mad.mad) AS mad_value,
       CAST(SUM(CASE WHEN d.dev > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN mad ON d.event_type = mad.event_type
GROUP BY d.event_type
""",
    tags=("analytics", "stats", "robust"),
    doc="MAD-based outlier counts per event type (exact order-statistic medians).",
)
def robust_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    wo = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    r = ev.withColumn("rn", F.row_number().over(wo)).withColumn(
        "n", F.count("*").over(wp)
    )
    med = r.groupBy("event_type").agg(
        F.min(
            F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("value"))
        ).alias("med")
    )
    d = r.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    wd = Window.partitionBy("event_type").orderBy("dev", "rn")
    d2 = d.withColumn("drn", F.row_number().over(wd))
    mad = d2.groupBy("event_type").agg(
        F.min(
            F.when(F.col("drn") == F.ceil(F.col("n") * 0.5), F.col("dev"))
        ).alias("mad")
    )
    j = d2.join(mad, "event_type")
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("med").alias("median_value"),
        F.min("mad").alias("mad_value"),
        F.sum(
            F.when(F.col("dev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
    )


# --------------------------------------------------------------------------
# Event-transition bigrams: LAG over each user's ordered event stream,
# then count (prev → curr) transitions — the Markov-chain estimation
# step behind "what do users do next".  One user-partitioned window
# (distributes on user_id) + one map-side-combinable count.
# --------------------------------------------------------------------------


@register(
    "event_transition_counts",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS curr_type, COUNT(*) AS n_transitions
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
    tags=("analytics", "window", "sequence"),
    doc="Markov transition counts over per-user ordered event streams.",
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


# --------------------------------------------------------------------------
# Pareto cut: the smallest set of customers covering 80% of each
# nation's revenue.  Running-share window per nation over the customer
# aggregate (two shuffles total: fact→customer agg, agg→nation window);
# the "keep until the running share crosses the cut" predicate keeps
# the first row PAST the threshold so the output truly covers ≥80%.
# --------------------------------------------------------------------------


@register(
    "pareto_revenue_customers",
    oracle=f"""
WITH ca AS (
  SELECT c_nationkey, c_custkey, {sql_dsum('o_totalprice')} AS revenue
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_nationkey, c_custkey
),
r AS (
  SELECT c_nationkey, c_custkey, revenue,
         CAST(SUM(revenue) OVER (PARTITION BY c_nationkey
              ORDER BY revenue DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_rev,
         -- run_rev accumulates in the same explicit order in both engines so
         -- a double sum is safe; the UNORDERED partition total is not — cast
         -- back to decimal (lossless: revenue is an exact 6dp value) so the
         -- 80% boundary can't flip on a last-ulp drift (ADVICE r4)
         CAST(SUM(CAST(revenue AS DECIMAL(38,6))) OVER (PARTITION BY c_nationkey)
              AS DOUBLE) AS tot_rev
  FROM ca
)
SELECT c_nationkey, COUNT(*) AS n_top_customers,
       ROUND(MAX(run_rev / tot_rev), 6) AS covered_share
FROM r
WHERE run_rev - revenue < 0.8 * tot_rev
GROUP BY c_nationkey
""",
    tags=("analytics", "window", "pareto"),
    doc="Smallest customer set covering 80% of each nation's revenue (running share).",
)
def pareto_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    ca = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    wrun = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("c_nationkey")
    # run_rev: ordered accumulation, identical sequence in both engines.
    # tot_rev: unordered — sum through decimal (see oracle comment).
    r = ca.withColumn("run_rev", F.sum("revenue").over(wrun).cast("double")).withColumn(
        "tot_rev", F.sum(F.col("revenue").cast(DEC)).over(wtot).cast("double")
    )
    return (
        r.filter(F.col("run_rev") - F.col("revenue") < 0.8 * F.col("tot_rev"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_top_customers"),
            F.round(F.max(F.col("run_rev") / F.col("tot_rev")), 6).alias("covered_share"),
        )
    )


# --------------------------------------------------------------------------
# Calendar heatmap: event volume by day-of-week × hour — the ops
# dashboard staple.  DOW is ISO (Mon=1) in both engines to dodge the
# locale-dependent numbering (Spark dayofweek() is Sun=1, DuckDB
# dayofweek() is Sun=0 — both avoided).
# --------------------------------------------------------------------------


@register(
    "weekday_hour_heatmap",
    oracle="""
SELECT CAST(isodow(ts) AS INT) AS iso_dow,
       CAST(HOUR(ts) AS INT) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
    tags=("analytics", "agg", "calendar"),
    doc="Event volume heatmap by ISO day-of-week × hour.",
)
def weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek(F.date_sub(F.col("ts"), 1)).cast("int").alias("iso_dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# AN-f (round 8): ordered conversion funnel (the windowFunnel shape).
# Per user, the deepest strictly-ordered view → click → purchase chain:
# t1 = first view, t2 = first click AFTER t1, t3 = first purchase AFTER
# t2.  Each level is one filtered agg joined back on user_id — three
# small hash aggs over an events scan, no window over the whole stream,
# no per-user collect_list (a user with millions of events costs three
# partial-agg rows, not a sort).  Timestamps emitted as strings (repo
# temporal rule); funnel_level 0–3 covers users who never viewed.
# --------------------------------------------------------------------------


@register(
    "event_funnel_levels",
    oracle="""
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT u.user_id,
       CASE WHEN p.t3 IS NOT NULL THEN 3
            WHEN c.t2 IS NOT NULL THEN 2
            WHEN v.t1 IS NOT NULL THEN 1
            ELSE 0 END AS funnel_level,
       strftime(v.t1, '%Y-%m-%d %H:%M:%S') AS first_view,
       strftime(c.t2, '%Y-%m-%d %H:%M:%S') AS first_click_after,
       strftime(p.t3, '%Y-%m-%d %H:%M:%S') AS first_purchase_after
FROM u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
""",
    tags=("analytics", "events", "funnel"),
    doc=(
        "AN: ordered conversion funnel — per user the deepest strictly "
        "time-ordered view→click→purchase chain, as three filtered "
        "min-aggs joined on user_id (no stream-wide window, no "
        "collect_list)."
    ),
)
def event_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    users = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_level"),
            F.date_format("t1", fmt).alias("first_view"),
            F.date_format("t2", fmt).alias("first_click_after"),
            F.date_format("t3", fmt).alias("first_purchase_after"),
        )
    )


# --------------------------------------------------------------------------
# AN-g (round 8): EWMA smoothing, exact.  The streaming-monitoring
# staple y_i = α·x_i + (1−α)·y_{i−1}, truncated at 16 lags so it's a
# bounded window op.  Floating pow((1−α), d) is libm-dependent, but
# α = 1/4 makes every weight an exact rational: α(1−α)^d = 3^d/4^(d+1),
# so the smoothed value is Σ x_int·3^d·4^(15−d) / (4^16·10^6) — one
# integer dot product (≤ 2.4e18 < 2^63 at this fixture's value range)
# and ONE correctly-rounded IEEE division.  Shape: row_number per user,
# a bounded self-join (rn−15 ≤ rn_b ≤ rn), coefficient lookup from a
# 16-row broadcast — 16n rows max, no collect_list, no unbounded frame.
# --------------------------------------------------------------------------

_EWMA_LAGS = 16  # α = 1/4, weights 3^d / 4^(d+1), d = 0..15


@register(
    "ewma_user_value",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
w AS (
  SELECT * FROM (VALUES {", ".join(f"({d}, {3**d * 4**(15 - d)})" for d in range(16))}) AS t(d, coef)
),
s AS (
  SELECT a.user_id, a.event_id, a.ts,
         SUM(b.x * w.coef) AS num
  FROM e a
  JOIN e b ON b.user_id = a.user_id AND a.rn - b.rn BETWEEN 0 AND {_EWMA_LAGS - 1}
  JOIN w ON w.d = a.rn - b.rn
  GROUP BY 1, 2, 3
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(num AS DOUBLE) / {4**16 * 10**6} AS ewma
FROM s
""",
    tags=("analytics", "timeseries"),
    doc=(
        "AN: 16-lag truncated EWMA (α=1/4) per user — exact-rational "
        "weights 3^d/4^(d+1) make the smoothed series one integer dot "
        "product and one IEEE division; bounded self-join, no frames."
    ),
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    e = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1e6).cast("bigint").alias("x"),
        rn.alias("rn"),
    )
    coefs = spark.createDataFrame(
        [(d, 3**d * 4 ** (15 - d)) for d in range(_EWMA_LAGS)], "d int, coef long"
    )
    # Banded self-join: joining on user_id alone would materialize
    # |events_u|² pairs per user before the range filter — quadratic on
    # a hot user.  Bucketing rn into 16-row blocks and probing (block,
    # block−1) bounds the intermediate at 32 candidates per row, the
    # same trick as range_join_events.
    blk = F.floor((F.col("rn") - 1) / _EWMA_LAGS)
    a = e.withColumn(
        "blk",
        F.explode(F.array(blk.cast("long"), (blk - 1).cast("long"))),
    )
    b = e.select(
        F.col("user_id").alias("user_id_b"),
        F.col("x").alias("xb"),
        F.col("rn").alias("rnb"),
        F.floor((F.col("rn") - 1) / _EWMA_LAGS).cast("long").alias("blk_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("blk") == F.col("blk_b"))
            & ((F.col("rn") - F.col("rnb")).between(0, _EWMA_LAGS - 1)),
        )
        .join(F.broadcast(coefs), F.col("d") == F.col("rn") - F.col("rnb"))
        .groupBy("user_id", "event_id", "ts")
        .agg(F.sum(F.col("xb") * F.col("coef")).alias("num"))
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            (F.col("num").cast("double") / F.lit(float(4**16 * 10**6))).alias("ewma"),
        )
    )
