"""Set operations U1–U3 and sorts/limits O1–O3 (SURVEY.md §2.6–2.7).

U1 grounds in the reference: per-city row lists appended into one table
(``/root/reference/dags/my_data_pipeline.py:62-73``) is a by-name union
— hence ``unionByName``, never positional.  U3 fixes a reference bug:
daily re-runs + append-mode inserts (``airflow_dag.py:27`` +
``my_data_pipeline.py:111``) silently duplicate rows; the engine dedups
deterministically (keep lowest key via window, not arbitrary-first
``dropDuplicates``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import ts_str, with_global_pos

# --------------------------------------------------------------------------
# U1: union all / union distinct (by name).
# --------------------------------------------------------------------------


@register(
    "union_all",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    tags=("setop",),
    doc="U1: unionByName of two overlapping selections (duplicates kept).",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
    a = o.filter(F.col("o_orderstatus") == "O").drop("o_orderstatus", "o_orderpriority")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").drop("o_orderstatus", "o_orderpriority")
    return a.unionByName(b)


@register(
    "union_distinct",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    tags=("setop",),
    doc="U1: union with set semantics — overlap collapsed.",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
    a = o.filter(F.col("o_orderstatus") == "O").drop("o_orderstatus", "o_orderpriority")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").drop("o_orderstatus", "o_orderpriority")
    return a.unionByName(b).distinct()


# --------------------------------------------------------------------------
# U2: intersect / except (set semantics in both engines).
# --------------------------------------------------------------------------


@register(
    "intersect_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop",),
    doc="U2: nations having both customers and suppliers.",
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "except_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop",),
    doc="U2: nations with customers but no suppliers.",
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (set semantics); exceptAll would keep multiplicities


# --------------------------------------------------------------------------
# U3: deduplication.  `dropDuplicates` keeps an arbitrary row — fine for
# semantics, useless for reproducible pipelines.  The deterministic form
# keeps the lowest event_id per key via window row_number (same single
# shuffle, reproducible at any scale).
# --------------------------------------------------------------------------


@register(
    "distinct_pairs",
    oracle="""
SELECT DISTINCT user_id, event_type
FROM events
""",
    tags=("setop", "dedup"),
    doc="U3: distinct projection (set semantics).",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@register(
    "dedup_keep_first",
    oracle="""
SELECT user_id, event_type, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
)
WHERE rn = 1
""",
    tags=("setop", "dedup"),
    doc="U3: deterministic dedup — first event per (user, type) by event_id.",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", ts_str("ts").alias("ts_s"))
    )


# --------------------------------------------------------------------------
# O1–O3: global sort / limit / top-k.  The hash compare is
# order-insensitive, so the sort is made value-visible by attaching the
# global rank.  Spark executes orderBy as a range-partitioned sort
# (sampled boundaries), top-k as TakeOrderedAndProject — no global sort.
# --------------------------------------------------------------------------


@register(
    "sort_global",
    oracle="""
SELECT o_orderkey,
       o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos
FROM orders
WHERE o_orderstatus = 'F'
""",
    tags=("sort",),
    doc="O1: global sort, made hash-visible via global position column.",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe global ranking: a bare ``row_number() OVER (ORDER BY ...)``
    funnels every row through ONE task; ``with_global_pos`` range-partitions
    on the full sort key, ranks locally, and adds per-partition offsets.
    The sort key is total (o_orderkey is unique), so the global position is
    exact regardless of sampled range boundaries."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    ranked = with_global_pos(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], pos_name="_pos")
    return ranked.select(
        "o_orderkey", "o_totalprice", F.col("_pos").cast("int").alias("pos")
    )


@register(
    "limit_deterministic",
    oracle="""
SELECT c_custkey, c_name
FROM customer
ORDER BY c_custkey
LIMIT 10
""",
    tags=("sort", "limit"),
    doc="O2: limit over a defined order (unordered LIMIT is nondeterministic).",
)
def limit_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.orderBy("c_custkey").select("c_custkey", "c_name").limit(10)


@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("sort", "topk"),
    doc="O3: global top-k → Spark TakeOrderedAndProject (no full sort).",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )
