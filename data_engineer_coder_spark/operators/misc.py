"""Remaining inventory rows: S2 in-memory source, classic multi-join
shapes, scalar subquery — plus the §3.4 pipeline composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io.tables import table
from ..registry import register
from ._helpers import day_str, dsum, sql_dsum

# --------------------------------------------------------------------------
# S2: in-memory rows → DataFrame with an explicit schema (the engine's
# replacement for pd.DataFrame(data_list) inference,
# /root/reference/dags/my_data_pipeline.py:61-75 — schema precedes data).
# --------------------------------------------------------------------------

_CITY_ROWS = [
    ("madrid", "ES", 3223000),
    ("barcelona", "ES", 1620000),
    ("valencia", "ES", 791000),
]


@register(
    "inmemory_rows",
    oracle="""
SELECT city, country_code, population,
       UPPER(SUBSTRING(city, 1, 1)) || LOWER(SUBSTRING(city, 2)) AS city_cap
FROM (VALUES
  ('madrid', 'ES', 3223000),
  ('barcelona', 'ES', 1620000),
  ('valencia', 'ES', 791000)
) AS t(city, country_code, population)
""",
    tags=("source", "inmemory"),
    doc="S2: literal rows under an explicit schema (no inference), derived column.",
)
def inmemory_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("city", T.StringType(), False),
            T.StructField("country_code", T.StringType(), False),
            T.StructField("population", T.IntegerType(), False),
        ]
    )
    df = spark.createDataFrame(_CITY_ROWS, schema)
    cap = F.concat(
        F.upper(F.substring("city", 1, 1)), F.lower(F.expr("substring(city, 2)"))
    )
    return df.select("city", "country_code", "population", cap.alias("city_cap"))


# --------------------------------------------------------------------------
# TPC-H Q3 shape: segment filter → 3-way join → grouped revenue → top-10.
# customer is the small side (broadcast); lineitem never shuffles before
# the aggregate.
# --------------------------------------------------------------------------


@register(
    "shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk"),
    doc="Q3 shape: filtered 3-way star join, grouped revenue, global top-10.",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            day_str("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS with a correlated range condition → semi join.
# --------------------------------------------------------------------------


@register(
    "order_priority_check",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "agg"),
    doc="Q4 shape: correlated EXISTS (late-shipping orders) as a semi join.",
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 60).cast("timestamp")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Scalar subquery: compare each row against a global aggregate.
# --------------------------------------------------------------------------


@register(
    "scalar_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice,
       o_totalprice >= 0.9 * (SELECT MAX(o_totalprice) FROM orders) AS near_max
FROM orders
WHERE o_totalprice >= 0.5 * (SELECT MAX(o_totalprice) FROM orders)
""",
    tags=("subquery",),
    doc="Scalar subquery: rows vs a global aggregate (broadcast scalar, two-pass).",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice >= 0.9 * (SELECT MAX(o_totalprice) FROM orders_ssq) AS near_max
        FROM orders_ssq
        WHERE o_totalprice >= 0.5 * (SELECT MAX(o_totalprice) FROM orders_ssq)
        """
    )


# --------------------------------------------------------------------------
# §3.4.3: the composable pipeline — source → transforms → sink as a
# library function (the reference's three-task DAG without Airflow).
# --------------------------------------------------------------------------


def to_records(df: DataFrame):
    """S7: records serialization for *external* handoff only
    (``to_dict(orient='records')`` twin of my_data_pipeline.py:161).
    Intra-engine stages exchange lazy DataFrames, never serialized rows.
    Returns an RDD of JSON strings (one object per row)."""
    return df.toJSON()


def pipeline(source: DataFrame, *transforms, sink=None):
    """Compose ``source |> t1 |> t2 ... |> sink`` lazily.

    Each transform is ``DataFrame -> DataFrame``; the optional sink is a
    terminal callable (e.g. ``lambda df: write_partitioned_parquet(...)``).
    Returns the final DataFrame (pre-sink) so callers can also inspect it.
    Stages exchange lazy plans — the reference's XCom serialization seam
    (SURVEY.md §3.1 type-contract bug) cannot exist here.
    """
    df = source
    for t in transforms:
        df = t(df)
    if sink is not None:
        sink(df)
    return df


# --------------------------------------------------------------------------
# TPC-H Q17 shape: correlated aggregate subquery — each lineitem compared
# against the per-part average quantity.  Catalyst decorrelates this into
# an aggregate + equi-join; written in SQL so the decorrelation path
# itself is exercised.
# --------------------------------------------------------------------------


@register(
    "correlated_agg_subquery",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice')} AS small_order_revenue,
       COUNT(*) AS n_lines
FROM lineitem l
WHERE l_quantity < (
  SELECT 0.5 * AVG(l_quantity) FROM lineitem WHERE l_partkey = l.l_partkey
)
""",
    tags=("subquery", "agg"),
    doc="Q17 shape: correlated aggregate subquery (qty < half the part's average).",
)
def correlated_agg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_csq")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS small_order_revenue,
               COUNT(*) AS n_lines
        FROM lineitem_csq l
        WHERE l_quantity < (
          SELECT 0.5 * AVG(l_quantity) FROM lineitem_csq WHERE l_partkey = l.l_partkey
        )
        """
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING over a grouped subquery feeding a semi join —
# large-volume orders with their customers.
# --------------------------------------------------------------------------


@register(
    "large_volume_orders",
    oracle=f"""
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       {sql_dsum('l_quantity')} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250
)
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
""",
    tags=("subquery", "join", "agg", "having"),
    doc="Q18 shape: IN-subquery with HAVING (large orders), join back to customers.",
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_ok"), li.l_orderkey == F.col("_ok"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            day_str("o_orderdate").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


# --------------------------------------------------------------------------
# LATERAL correlated subquery — the SQL-surface twin of window top-k:
# per outer row, a dependent inner query (here: each nation's two richest
# customers).  Catalyst decorrelates the LIMIT-ed lateral into a
# partitioned window, so the physical plan is the same scalable shape as
# window_topk — no nested-loop re-execution per nation.
# --------------------------------------------------------------------------


@register(
    "lateral_topk_per_nation",
    oracle="""
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
""",
    tags=("subquery", "sql"),
    doc="LATERAL correlated subquery: top-2 customers per nation via the SQL surface.",
)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation_lat n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_lat c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        """
    )


# --------------------------------------------------------------------------
# Data-quality expectation battery (dbt-test / Great-Expectations shape):
# each check is one aggregate over the data, unioned into a
# (check_name, n_violations, passed) report.  The reference's only QA is
# a describe() email (my_data_pipeline.py:199-231); this is that report
# made *assertable*.  All checks are single-pass aggregates or one
# broadcast anti-join (referential integrity) — nothing quadratic, and
# the whole battery is one job.
# --------------------------------------------------------------------------


@register(
    "dq_expectations",
    oracle="""
SELECT 'orders_pk_not_null' AS check_name,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS n_violations,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) = 0 AS passed
UNION ALL
SELECT 'orders_pk_unique',
       (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)),
       (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)) = 0
UNION ALL
SELECT 'orders_fk_customer',
       (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
       (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
UNION ALL
SELECT 'lineitem_qty_range',
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50),
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50) = 0
UNION ALL
SELECT 'orders_price_positive',
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0),
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) = 0
""",
    tags=("quality", "pipeline"),
    doc="Data-quality battery: PK null/unique, FK integrity, range checks → report.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")

    pk_null = o.filter(F.col("o_orderkey").isNull()).agg(
        F.count("*").alias("n_violations")
    )
    pk_dup = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("n_violations"))
    )
    fk = o.join(
        c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti"
    ).agg(F.count("*").alias("n_violations"))
    qty = li.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).agg(
        F.count("*").alias("n_violations")
    )
    price = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count("*").alias("n_violations")
    )
    checks = [
        ("orders_pk_not_null", pk_null),
        ("orders_pk_unique", pk_dup),
        ("orders_fk_customer", fk),
        ("lineitem_qty_range", qty),
        ("orders_price_positive", price),
    ]
    out = None
    for name, df in checks:
        branch = df.select(
            F.lit(name).alias("check_name"),
            F.col("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )
        out = branch if out is None else out.unionByName(branch)
    return out


# --------------------------------------------------------------------------
# Column profiling: per-column null/distinct/row counts in ONE scan —
# the schema-drift tripwire run before every load.  All metrics come
# out of a single aggregate row (count+count_distinct per column,
# partial-aggregated map-side), then pivot tall via stack(); the
# UNION-of-scans alternative reads the table once per column.
# --------------------------------------------------------------------------


@register(
    "column_profile",
    oracle="""
WITH m AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(o_custkey) AS nn_custkey, COUNT(DISTINCT o_custkey) AS nd_custkey,
         COUNT(o_orderstatus) AS nn_status, COUNT(DISTINCT o_orderstatus) AS nd_status,
         COUNT(o_totalprice) AS nn_price, COUNT(DISTINCT o_totalprice) AS nd_price,
         COUNT(o_orderpriority) AS nn_priority, COUNT(DISTINCT o_orderpriority) AS nd_priority
  FROM orders
)
SELECT 'o_custkey' AS col_name, n_rows, n_rows - nn_custkey AS n_nulls, nd_custkey AS n_distinct FROM m
UNION ALL
SELECT 'o_orderstatus', n_rows, n_rows - nn_status, nd_status FROM m
UNION ALL
SELECT 'o_totalprice', n_rows, n_rows - nn_price, nd_price FROM m
UNION ALL
SELECT 'o_orderpriority', n_rows, n_rows - nn_priority, nd_priority FROM m
""",
    tags=("quality", "profiling", "agg"),
    doc="Single-scan per-column null/distinct profile of orders (stack to tall).",
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    m = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows - nn_{c}, nd_{c}" for c in cols
    )
    return m.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


# --------------------------------------------------------------------------
# S8 (round 8): ACID-table commit log through the driver gate — builds a
# three-commit table (replace, append, schema-evolving append) from the
# documents fixture in a scratch dir, then returns the commit history
# with a TIME-TRAVEL row count per version (read_table(version=v)).
# The oracle recomputes every ledger column from the same doc_id % 3
# split in plain SQL, so manifest accounting, append accumulation, and
# version-pinned reads are all value-hash-checked by the driver.  This
# is the lakehouse surface that replaces the reference's CREATE TABLE
# IF NOT EXISTS + blind append (my_data_pipeline.py:106-115): its
# silent rerun duplication and silent schema drift both become
# impossible here.  Scratch IO is ~the sf0.01 documents table; the
# dir is removed before returning (history/counts are already driver-
# side rows).
# --------------------------------------------------------------------------


@register(
    "acid_table_history",
    oracle="""
WITH s AS (SELECT doc_id, lang, CAST(doc_id % 3 AS INT) AS m FROM documents),
v AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(version))
SELECT v.version,
       't' || CAST(v.version AS VARCHAR) AS txid,
       (SELECT COUNT(DISTINCT lang) FROM s WHERE m < v.version) AS n_partitions,
       (SELECT COUNT(*) FROM (SELECT DISTINCT m, lang FROM s WHERE m < v.version)) AS n_dirs,
       CAST(CASE WHEN v.version = 3 THEN 3 ELSE 2 END AS BIGINT) AS n_cols,
       (SELECT COUNT(*) FROM s WHERE m < v.version) AS n_rows
FROM v
""",
    tags=("sink", "acid", "lakehouse"),
    doc=(
        "S8: ACID table commit log + time travel — replace, append, and "
        "schema-evolving append commits over the documents table; one "
        "row per version with partition/dir/schema accounting and the "
        "version-pinned row count."
    ),
)
def acid_table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..io.acid_table import (
        append_partitions,
        read_table,
        replace_partitions,
        table_history,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", (F.col("doc_id") % 3).cast("int").alias("m")
    )
    base = tempfile.mkdtemp(prefix="acid_hist_")
    root = os.path.join(base, "t")
    try:
        replace_partitions(docs.filter("m = 0").drop("m"), root, ["lang"], "t1")
        append_partitions(docs.filter("m = 1").drop("m"), root, ["lang"], "t2")
        evolved = docs.filter("m = 2").drop("m").withColumn("ingest", F.lit("batch3"))
        append_partitions(evolved, root, ["lang"], "t3")
        hist = table_history(spark, root)
        rows = [
            (v, read_table(spark, root, version=v).count()) for v in (1, 2, 3)
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    counts = spark.createDataFrame(rows, "version int, n_rows long")
    return hist.join(counts, "version").select(
        "version",
        "txid",
        F.col("n_partitions").cast("bigint").alias("n_partitions"),
        F.col("n_dirs").cast("bigint").alias("n_dirs"),
        F.col("n_cols").cast("bigint").alias("n_cols"),
        "n_rows",
    )


# --------------------------------------------------------------------------
# S8b (round 8): zone-map data skipping through the driver gate.  The
# documents table is committed hive-partitioned by (lang, bucket) where
# bucket = ⌊doc_id/100⌋, so every parquet file's doc_id footer range
# lies inside one 100-id window.  A doc_id BETWEEN 150 AND 349 stats
# filter then prunes files BEFORE listing; because doc_ids are integers
# and each file's min/max are actual row values inside a single bucket
# window, a file's range overlapping the predicate is EXACTLY "the file
# contains a matching row" — so the per-directory was_read decision the
# engine makes must equal the SQL truth ∃ row in range, which is what
# the oracle recomputes.  This is the Delta/Iceberg add-file-with-stats
# design: at 100 TB the manifest's KB of footer ranges decide between
# scanning the year and scanning the day.
# --------------------------------------------------------------------------


@register(
    "acid_zone_map_skipping",
    oracle="""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
s AS (
  SELECT doc_id, lang, CAST((doc_id * 5) // nn.n AS INT) AS bucket
  FROM documents, nn
)
SELECT lang, bucket,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
       COUNT(*) AS n_rows,
       MAX(CASE WHEN doc_id BETWEEN (SELECT (3 * n) // 10 FROM nn)
                              AND (SELECT (7 * n) // 10 - 1 FROM nn)
                THEN 1 ELSE 0 END) = 1 AS was_read
FROM s GROUP BY lang, bucket
""",
    tags=("sink", "acid", "lakehouse", "scan"),
    doc=(
        "S8b: file-level zone-map skipping — per (lang, bucket) "
        "partition, the engine's prune-before-list decision under a "
        "doc_id range stats filter, checked against the SQL truth.  "
        "Buckets are 5 corpus-relative id ranges, so the scratch table "
        "is 25 dirs at EVERY scale factor (the first draft's fixed-width "
        "buckets made 250 dirs × multi-file writes at sf0.1 — 212 s)."
    ),
)
def acid_zone_map_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..io.acid_table import files_selected, read_table, replace_partitions

    base_docs = table(spark, sf_dir, "documents")
    # one bounded scalar: the corpus size drives the bucket edges and
    # the predicate, both of which the driver-side stats filter needs
    n = base_docs.count()
    lo, hi = (3 * n) // 10, (7 * n) // 10 - 1
    docs = base_docs.select(
        "doc_id",
        "lang",
        ((F.col("doc_id") * 5) / n).cast("int").alias("bucket"),
    )
    base = tempfile.mkdtemp(prefix="acid_zm_")
    root = os.path.join(base, "t")

    def in_range(stats: dict) -> bool:
        s = stats.get("doc_id", (None, None))
        if s[0] is None or s[1] is None:
            return True  # no usable stats: must read
        return s[1] >= lo and s[0] <= hi

    try:
        # one file per (lang, bucket) dir: hash-repartition on the
        # partition cols so 32 write tasks don't each spray 25 files
        replace_partitions(
            docs.repartition("lang", "bucket"), root, ["lang", "bucket"], "t1"
        )
        decisions = []
        for rel, files in files_selected(root, stats_filter=in_range).items():
            kv = dict(
                seg.split("=", 1) for seg in rel.split("/")[2:]
            )  # _staging/<txid>/lang=…/bucket=…
            decisions.append(
                (kv["lang"], int(kv["bucket"]), any(k for _, k in files))
            )
        full = read_table(spark, root).groupBy(
            "lang", F.col("bucket").cast("int").alias("bucket")
        ).agg(
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.count("*").alias("n_rows"),
        )
        read_flags = spark.createDataFrame(
            decisions, "lang string, bucket int, was_read boolean"
        )
        out = full.join(read_flags, ["lang", "bucket"]).select(
            "lang", "bucket", "min_id", "max_id", "n_rows", "was_read"
        )
        out = out.localCheckpoint()  # scratch dir is deleted in finally
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# S8c (round 8): compaction of a multi-epoch append through the driver
# gate.  Three streaming-style append epochs (doc_id % 3) land one
# staging dir per epoch per lang; compact_partitions collapses every
# multi-dir partition to ONE dir under a maintenance txid — logically a
# no-op (v4 row count must equal v3's), physically the small-files fix
# a year of micro-batches needs.  The oracle recomputes the whole dir
# ledger (appends accumulate; compaction leaves exactly one dir per
# surviving lang) and the per-version time-travel row counts in SQL.
# --------------------------------------------------------------------------


@register(
    "acid_compaction_audit",
    oracle="""
WITH s AS (SELECT doc_id % 3 AS m, lang FROM documents),
le AS (SELECT DISTINCT lang, m FROM s),
v AS (SELECT * FROM (VALUES (1), (2), (3), (4)) AS t(version))
SELECT v.version,
       CASE WHEN v.version <= 3
            THEN (SELECT COUNT(*) FROM le WHERE m < v.version)
            ELSE (SELECT COUNT(DISTINCT lang) FROM le) END AS n_dirs,
       (SELECT COUNT(*) FROM s WHERE m < LEAST(v.version, 3)) AS n_rows
FROM v
""",
    tags=("sink", "acid", "lakehouse"),
    doc=(
        "S8c: small-file compaction — per version, the staging-dir "
        "count and time-travel row count across three append epochs "
        "and the compacting commit (same rows, one dir per partition)."
    ),
)
def acid_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..io.acid_table import (
        append_partitions,
        compact_partitions,
        read_table,
        table_history,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", (F.col("doc_id") % 3).alias("m")
    )
    base = tempfile.mkdtemp(prefix="acid_compact_")
    root = os.path.join(base, "t")
    try:
        for epoch in (0, 1, 2):
            append_partitions(
                # one file per lang dir per epoch (32 write tasks would
                # otherwise each emit a file into every dir)
                docs.filter(F.col("m") == epoch).drop("m").repartition("lang"),
                root, ["lang"], f"e{epoch + 1}",
            )
        compact_partitions(spark, root, "c1")
        hist = table_history(spark, root).select("version", "n_dirs")
        counts = spark.createDataFrame(
            [
                (v, read_table(spark, root, version=v).count())
                for v in (1, 2, 3, 4)
            ],
            "version int, n_rows long",
        )
        out = hist.join(counts, "version").select(
            "version",
            F.col("n_dirs").cast("bigint").alias("n_dirs"),
            "n_rows",
        )
        out = out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# S8d (round 8 late): MERGE INTO through the driver gate — builds a
# lang-partitioned table from the doc_id % 3 != 2 slice, merges an
# updates batch (every even doc_id, with n_chars shifted +1000: the
# even ∩ base rows are UPDATES, the even ∩ %3==2 rows are INSERTS),
# and reports the per-lang ledger: rows before/after, update/insert
# counts, and the post-merge character mass (which only balances if
# updated VALUES actually replaced the old rows — a row-count check
# alone cannot see a failed update).  The oracle recomputes all five
# columns from the raw fixture.  Partition-local merge: key (lang,
# doc_id) ⊇ partition (lang), so only touched partitions are read.
# --------------------------------------------------------------------------


@register(
    "acid_merge_upsert_audit",
    oracle="""
WITH s AS (
  SELECT doc_id, lang, n_chars,
         doc_id % 3 <> 2 AS in_base,
         doc_id % 2 = 0 AS in_upd
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) FILTER (in_base) AS BIGINT) AS n_before,
       CAST(COUNT(*) FILTER (in_base OR in_upd) AS BIGINT) AS n_after,
       CAST(COUNT(*) FILTER (in_base AND in_upd) AS BIGINT) AS n_updated,
       CAST(COUNT(*) FILTER (in_upd AND NOT in_base) AS BIGINT) AS n_inserted,
       CAST(SUM(CASE WHEN in_upd THEN n_chars + 1000
                     WHEN in_base THEN n_chars END) AS BIGINT) AS chars_after
FROM s
GROUP BY lang
""",
    tags=("sink", "acid", "lakehouse"),
    doc=(
        "S8d: ACID MERGE INTO (upsert) ledger — per lang the rows "
        "before/after, matched updates, inserts, and the post-merge "
        "character mass proving updated values replaced old rows; "
        "partition-local merge reads only touched partitions."
    ),
)
def acid_merge_upsert_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..io.acid_table import merge_into, read_table, replace_partitions

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = docs.filter("doc_id % 3 != 2")
    upd = docs.filter("doc_id % 2 = 0").withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    tmp = tempfile.mkdtemp(prefix="acid_merge_")
    root = os.path.join(tmp, "t")
    try:
        replace_partitions(base, root, ["lang"], "t1")
        before = (
            read_table(spark, root)
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_before"))
        )
        merge_into(spark, upd, root, ["lang"], ["lang", "doc_id"], "m1")
        # replay must be a no-op (exactly-once) — same txid
        merge_into(spark, upd, root, ["lang"], ["lang", "doc_id"], "m1")
        after = (
            read_table(spark, root)
            .groupBy("lang")
            .agg(
                F.count("*").cast("bigint").alias("n_after"),
                F.sum("n_chars").cast("bigint").alias("chars_after"),
            )
        )
        out = before.join(after, "lang").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    b = base.select("lang", "doc_id")
    u = docs.filter("doc_id % 2 = 0").select("lang", "doc_id")
    upd_ins = (
        u.join(b, ["lang", "doc_id"], "left_semi")
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_updated"))
        .join(
            u.join(b, ["lang", "doc_id"], "left_anti")
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_inserted")),
            "lang",
            "outer",
        )
    )
    ledger = spark.createDataFrame(
        out, "lang string, n_before long, n_after long, chars_after long"
    )
    return ledger.join(upd_ins, "lang", "left").select(
        "lang",
        "n_before",
        "n_after",
        F.coalesce("n_updated", F.lit(0)).cast("bigint").alias("n_updated"),
        F.coalesce("n_inserted", F.lit(0)).cast("bigint").alias("n_inserted"),
        "chars_after",
    )


# --------------------------------------------------------------------------
# S8e (round 8 late): row-level DELETE through the driver gate — the
# opt-out / right-to-erasure purge.  Builds the lang-partitioned
# documents table, deletes every row of one source (the "opted-out
# feed"), and reports per lang: rows before, rows after, rows erased,
# and the PRE-delete count still visible at version 1 (time travel —
# history is immutable until vacuum).  Oracle recomputes all four from
# the raw fixture.
# --------------------------------------------------------------------------


@register(
    "acid_delete_audit",
    oracle="""
WITH s AS (
  SELECT lang, source = 'web' AS opted_out FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(COUNT(*) FILTER (NOT opted_out) AS BIGINT) AS n_after,
       CAST(COUNT(*) FILTER (opted_out) AS BIGINT) AS n_erased,
       CAST(COUNT(*) AS BIGINT) AS n_at_v1
FROM s GROUP BY lang
""",
    tags=("sink", "acid", "lakehouse"),
    doc=(
        "S8e: ACID row-level DELETE (opt-out purge) ledger — per lang "
        "the before/after/erased counts plus the version-1 time-travel "
        "count proving history stays readable until vacuum."
    ),
)
def acid_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..io.acid_table import delete_rows, read_table, replace_partitions

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    tmp = tempfile.mkdtemp(prefix="acid_del_")
    root = os.path.join(tmp, "t")
    try:
        replace_partitions(docs, root, ["lang"], "t1")
        before = (
            read_table(spark, root)
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_before"))
        )
        delete_rows(
            spark,
            root,
            partition_cols=["lang"],
            condition=F.col("source") == "web",
            txid="d1",
        )
        # replay must be the exactly-once no-op
        delete_rows(
            spark,
            root,
            partition_cols=["lang"],
            condition=F.col("source") == "web",
            txid="d1",
        )
        after = (
            read_table(spark, root)
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_after"))
        )
        v1 = (
            read_table(spark, root, version=1)
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_at_v1"))
        )
        rows = (
            before.join(after, "lang").join(v1, "lang").collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = spark.createDataFrame(
        rows, "lang string, n_before long, n_after long, n_at_v1 long"
    )
    return out.select(
        "lang",
        "n_before",
        "n_after",
        (F.col("n_before") - F.col("n_after")).cast("bigint").alias("n_erased"),
        "n_at_v1",
    )


# --------------------------------------------------------------------------
# S8f (round 9): cross-partition MERGE through the driver gate — the
# label-correction upsert.  Builds the lang-partitioned documents
# table, then "corrects" the lang of every doc_id % 97 == 0 row to a
# new label ("xx") via merge_into(allow_partition_move=True): the
# delete-from-old-partition half and the insert-into-new-partition
# half land as ONE commit, so no version shows the row duplicated or
# stranded.  Reports per lang the pre-move (v1 time-travel), post-move
# and moved-out counts; untouched langs (fr/zh at every sf) must be
# byte-identical passthroughs.  Oracle recomputes the relabeled final
# state from the raw fixture.
# --------------------------------------------------------------------------


@register(
    "acid_partition_move_audit",
    oracle="""
WITH before AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before FROM documents GROUP BY lang
),
after AS (
  SELECT CASE WHEN doc_id % 97 = 0 THEN 'xx' ELSE lang END AS lang,
         CAST(COUNT(*) AS BIGINT) AS n_after
  FROM documents GROUP BY 1
)
SELECT COALESCE(b.lang, a.lang) AS lang,
       CAST(COALESCE(n_before, 0) AS BIGINT) AS n_before,
       CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
       CAST(COALESCE(n_before, 0) AS BIGINT) AS n_at_v1
FROM before b FULL JOIN after a ON b.lang = a.lang
""",
    tags=("sink", "acid", "lakehouse"),
    doc=(
        "S8f: cross-partition ACID MERGE (label-correction move) ledger "
        "— per lang the v1/pre-move, post-move counts; the moved rows "
        "leave their old partition and land in the new one under one "
        "commit, with v1 still time-traveling to the pre-move state."
    ),
)
def acid_partition_move_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..io.acid_table import merge_into, read_table, replace_partitions

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    tmp = tempfile.mkdtemp(prefix="acid_move_")
    root = os.path.join(tmp, "t")
    try:
        replace_partitions(docs, root, ["lang"], "t1")
        upd = docs.filter(F.col("doc_id") % 97 == 0).withColumn(
            "lang", F.lit("xx")
        )
        merge_into(
            spark, upd, root, ["lang"], ["doc_id"], "m1",
            allow_partition_move=True,
        )
        # replay must be the exactly-once no-op
        merge_into(
            spark, upd, root, ["lang"], ["doc_id"], "m1",
            allow_partition_move=True,
        )
        after = (
            read_table(spark, root)
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_after"))
        )
        v1 = (
            read_table(spark, root, version=1)
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_at_v1"))
        )
        rows = after.join(v1, "lang", "full_outer").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = spark.createDataFrame(rows, "lang string, n_after long, n_at_v1 long")
    return out.select(
        "lang",
        F.coalesce("n_at_v1", F.lit(0)).cast("bigint").alias("n_before"),
        F.coalesce("n_after", F.lit(0)).cast("bigint").alias("n_after"),
        F.coalesce("n_at_v1", F.lit(0)).cast("bigint").alias("n_at_v1"),
    )
