"""Joins J1–J8 (SURVEY.md §2.3).

The reference performs no joins — its four per-contaminant tables share
an implicit (day, country) key (``/root/reference/dags/my_data_pipeline.py:67-73``)
that is a latent equi-join.  This module makes the full join algebra
explicit, each shape chosen for 100 TB:

- dims (region/nation/supplier) are broadcast — no shuffle of the fact;
- fact⋈fact equi-joins shuffle on the join key and AQE handles skew;
- the range join is bucketized into an equi-join (an unbounded
  BroadcastNestedLoopJoin would be quadratic at scale);
- the as-of join is the union+window merge pattern — one shuffle on the
  key, no per-row probing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import dsum, sql_dsum, ts_str

# --------------------------------------------------------------------------
# J1: inner equi-join — orders ⋈ customer, revenue per market segment.
# --------------------------------------------------------------------------


@register(
    "join_inner",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS segment_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("join",),
    doc="J1: inner equi-join orders⋈customer with grouped revenue.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("segment_revenue"),
        )
    )


# --------------------------------------------------------------------------
# J2: left outer join — every customer, with or without orders.  The right
# default for merging the reference's per-contaminant tables where a city
# can miss one contaminant (my_data_pipeline.py:64).
# --------------------------------------------------------------------------


@register(
    "join_left_outer",
    oracle=f"""
SELECT c_custkey,
       COUNT(o_orderkey) AS n_orders,
       COALESCE({sql_dsum('o_totalprice')}, 0.0) AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    tags=("join",),
    doc="J2: left outer join keeps order-less customers (count=0, spent=0).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# J3: left semi / left anti — EXISTS / NOT EXISTS without row duplication.
# --------------------------------------------------------------------------


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
""",
    tags=("join",),
    doc="J3: left-semi join — customers having at least one open order.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
""",
    tags=("join",),
    doc="J3: left-anti join — customers with no large (>300k) order.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# J4: broadcast-dim star join (TPC-H Q5 shape).  region/nation/supplier are
# tiny: explicit F.broadcast means the lineitem fact never shuffles for
# the dim lookups — the only exchange is the final 1-key aggregation.
# --------------------------------------------------------------------------


@register(
    "revenue_by_nation",
    oracle=f"""
SELECT n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE', 'AMERICA', 'AFRICA', 'MIDDLE EAST')
GROUP BY n_name
""",
    tags=("join", "broadcast", "agg"),
    doc="J4: star join with broadcast dims (Q5 shape) — zero fact-side shuffle pre-agg.",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE", "AMERICA", "AFRICA", "MIDDLE EAST")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"), F.count("*").alias("n_items"))
    )


# --------------------------------------------------------------------------
# J5: theta (non-equi) join.  Equi component on nationkey bounds the blowup;
# the residual inequality is evaluated as a join filter.
# --------------------------------------------------------------------------


@register(
    "join_theta",
    oracle=f"""
SELECT c_nationkey AS nationkey,
       COUNT(*) AS n_pairs,
       {sql_dsum('s_acctbal - c_acctbal')} AS bal_gap
FROM customer
JOIN supplier ON c_nationkey = s_nationkey AND s_acctbal > c_acctbal
GROUP BY c_nationkey
""",
    tags=("join", "theta"),
    doc="J5: equi key + inequality residual — richer-supplier/customer pairs per nation.",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    return (
        c.join(
            F.broadcast(s),
            (c.c_nationkey == s.s_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_pairs"),
            dsum(F.col("s_acctbal") - F.col("c_acctbal")).alias("bal_gap"),
        )
    )


# --------------------------------------------------------------------------
# J6: range/interval join, bucketized.  "events within 60 s after an error"
# has no equi key; a naive theta join is O(n²).  Bucketizing event time into
# 60 s buckets turns it into an equi-join on the bucket (each left row probes
# bucket b and b+1 — (e1, e1+60 s] can only land there), then the exact range
# predicate filters residuals.  At 100 TB this is a shuffled hash join on a
# dense int key instead of a nested-loop scan.
# --------------------------------------------------------------------------


@register(
    "range_join_events",
    oracle="""
SELECT e1.event_id AS err_id,
       COUNT(*) AS n_follow
FROM events e1
JOIN events e2
  ON e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 60 SECOND
WHERE e1.event_type = 'error'
GROUP BY e1.event_id
""",
    tags=("join", "range"),
    doc="J6: interval join via 60s time-bucket equi-join + residual range filter.",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    bucket = F.expr("unix_micros(ts) div 60000000")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("ts").alias("err_ts"),
            F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
        )
    )
    others = ev.select(
        F.col("ts").alias("fol_ts"),
        bucket.alias("bucket"),
    )
    return (
        errors.join(others, "bucket")
        .filter(
            (F.col("fol_ts") > F.col("err_ts"))
            & (F.col("fol_ts") <= F.col("err_ts") + F.expr("INTERVAL 60 SECONDS"))
        )
        .groupBy("err_id")
        .agg(F.count("*").alias("n_follow"))
    )


# --------------------------------------------------------------------------
# J7: as-of join — for each purchase, the latest click at-or-before it by
# the same user.  No join primitive needed: tag both streams, union, and a
# running MAX over (ts, event_id) ordering within the user partition.  One
# shuffle on user_id; scales linearly (the classic merge pattern, vs the
# quadratic join+filter formulation).
# --------------------------------------------------------------------------


@register(
    "asof_join",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events
  WHERE event_type IN ('click', 'purchase')
), w AS (
  SELECT user_id, ts, event_id, event_type,
         MAX(click_ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_click_ts
  FROM u
)
SELECT event_id AS purchase_id,
       user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(last_click_ts, '%Y-%m-%d %H:%M:%S') AS asof_click_ts
FROM w
WHERE event_type = 'purchase'
""",
    tags=("join", "asof", "window"),
    doc="J7: as-of join via union + running-max window (merge pattern, single shuffle).",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("last_click_ts", F.max("click_ts").over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            ts_str("last_click_ts").alias("asof_click_ts"),
        )
    )


# --------------------------------------------------------------------------
# J8: cross join — bounded sides only (125 rows here; at scale only ever
# with a broadcast-small side, e.g. the LSH probe tables in similarity.py).
# --------------------------------------------------------------------------


@register(
    "join_cross",
    oracle="""
SELECT r_name, n_name
FROM region
CROSS JOIN nation
""",
    tags=("join", "cross"),
    doc="J8: cross join of two bounded dims.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --------------------------------------------------------------------------
# J9: null-safe equality join.  SQL NULL never equals NULL under `=`;
# matching null keys takes IS NOT DISTINCT FROM (Spark: `<=>`), which
# hashes NULL like any other key value — same shuffle shape, different
# semantics.  A real engine must expose both.
# --------------------------------------------------------------------------


@register(
    "join_null_safe",
    oracle="""
WITH a AS (
  SELECT NULLIF(user_id % 7, 3) AS k, COUNT(*) AS n_events
  FROM events GROUP BY 1
),
b AS (
  SELECT NULLIF(o_custkey % 7, 3) AS k, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT CAST(a.k AS BIGINT) AS k, a.n_events, b.n_orders
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    tags=("join", "semantics"),
    doc=(
        "J9: null-safe equi-join (<=> / IS NOT DISTINCT FROM) — the NULL "
        "bucket joins to the NULL bucket instead of silently dropping; "
        "plain `=` would return one row fewer."
    ),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    a = ev.groupBy(F.nullif(F.col("user_id") % 7, F.lit(3)).alias("k")).agg(
        F.count("*").alias("n_events")
    )
    b = o.groupBy(F.nullif(F.col("o_custkey") % 7, F.lit(3)).alias("k")).agg(
        F.count("*").alias("n_orders")
    )
    return a.join(b, a.k.eqNullSafe(b.k)).select(a.k, "n_events", "n_orders")


# --------------------------------------------------------------------------
# J10: grid-blocked spatial join — the 2D analogue of the bucketized
# interval join (J6): assign each point to an integer grid cell sized to
# the search radius, explode each probe into its 3×3 neighborhood, and
# equi-join on the cell before the exact distance check.  Candidates ∝
# local density × 9, never O(n²) — the standard geohash/S2 pattern.
#
# Coordinates are derived deterministically from supplier keys (the
# fixture has no geo columns; the OPERATOR is what matters), and the
# distance is squared-euclidean on exact 1dp values — no trig, so no
# libm divergence between engines.
# --------------------------------------------------------------------------


@register(
    "spatial_blocked_join",
    oracle="""
WITH pts AS (
  SELECT s_suppkey AS id,
         CAST((s_suppkey * 37) % 1000 AS DOUBLE) / 10 AS x,
         CAST((s_suppkey * 73) % 1000 AS DOUBLE) / 10 AS y
  FROM supplier
),
cells AS (
  SELECT *, CAST(FLOOR(x / 5) AS BIGINT) AS cx, CAST(FLOOR(y / 5) AS BIGINT) AS cy
  FROM pts
),
probe AS (
  SELECT c.*, c.cx + dx.d AS ncx, c.cy + dy.d AS ncy
  FROM cells c,
       (SELECT unnest([-1, 0, 1]) AS d) dx,
       (SELECT unnest([-1, 0, 1]) AS d) dy
)
SELECT a.id AS id_a, b.id AS id_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM probe a
JOIN cells b ON a.ncx = b.cx AND a.ncy = b.cy AND a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 25.0
""",
    tags=("join", "spatial"),
    doc="J10: radius self-join via integer grid cells + 3×3 neighbor probe.",
)
def spatial_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier").select("s_suppkey")
    pts = s.select(
        F.col("s_suppkey").alias("id"),
        (((F.col("s_suppkey") * 37) % 1000).cast("double") / 10).alias("x"),
        (((F.col("s_suppkey") * 73) % 1000).cast("double") / 10).alias("y"),
    )
    cells = pts.select(
        "*",
        F.floor(F.col("x") / 5).cast("bigint").alias("cx"),
        F.floor(F.col("y") / 5).cast("bigint").alias("cy"),
    )
    offsets = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    probe = (
        cells.select("*", offsets.alias("dx"))
        .select("*", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dy"))
        .select(
            "id",
            "x",
            "y",
            (F.col("cx") + F.col("dx")).alias("ncx"),
            (F.col("cy") + F.col("dy")).alias("ncy"),
        )
    )
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    d2 = (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb")) + (
        F.col("y") - F.col("yb")
    ) * (F.col("y") - F.col("yb"))
    return (
        probe.join(
            b,
            (F.col("ncx") == F.col("cx"))
            & (F.col("ncy") == F.col("cy"))
            & (F.col("id") < F.col("id_b")),
        )
        .select(F.col("id").alias("id_a"), "id_b", d2.alias("dist2"))
        .filter(F.col("dist2") <= 25.0)
    )


# --------------------------------------------------------------------------
# J7b: tolerance-bounded as-of join — same union + running-max merge as
# asof_join, plus the staleness bound every production as-of has
# (pandas merge_asof's `tolerance`): a prior click only matches if it is
# within 30 minutes of the purchase; older matches become NULL.  The
# tolerance is a post-window filter on the matched timestamp, so the
# plan is identical to J7 — still one shuffle on the key.
# --------------------------------------------------------------------------


@register(
    "asof_join_tolerance",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events
  WHERE event_type IN ('click', 'purchase')
), w AS (
  SELECT user_id, ts, event_id, event_type,
         MAX(click_ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_click_ts
  FROM u
)
SELECT event_id AS purchase_id,
       user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CASE WHEN last_click_ts >= ts - INTERVAL 30 MINUTE
            THEN strftime(last_click_ts, '%Y-%m-%d %H:%M:%S') END AS asof_click_ts,
       last_click_ts IS NOT NULL
         AND last_click_ts < ts - INTERVAL 30 MINUTE AS match_too_old
FROM w
WHERE event_type = 'purchase'
""",
    tags=("join", "asof", "window"),
    doc="J7: as-of join with a 30-minute staleness tolerance (merge_asof semantics).",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cutoff = F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    last = F.col("last_click_ts")
    return (
        u.withColumn("last_click_ts", F.max("click_ts").over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            F.when(last >= cutoff, ts_str("last_click_ts")).alias("asof_click_ts"),
            (last.isNotNull() & (last < cutoff)).alias("match_too_old"),
        )
    )
