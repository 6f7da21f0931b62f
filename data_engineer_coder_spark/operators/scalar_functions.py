"""Scalar function families F1–F7 (SURVEY.md §2.8).

Grounding: the reference uses ``str.capitalize`` + f-string concat
(``/root/reference/dags/my_data_pipeline.py:69-72,174``), ISO-date
strings (``:68``), ``json.loads`` (``:38``), and status-code
conditionals (``:37-48``).  Each family below exercises the Spark
built-in (JVM-side, whole-stage-codegen) equivalents — no Python UDFs
anywhere in these paths.

Cross-engine parity traps handled here:
- ``dayofweek``: Spark is Sunday=1; DuckDB isodow is Monday=1.  We use
  Spark ``weekday`` (Mon=0) ↔ DuckDB ``isodow-1``.
- transcendentals (ln/exp) are not correctly-rounded across libms →
  rounded to 6dp; sqrt IS IEEE-correctly-rounded → left exact.
- regexp patterns chosen to always match (no-match returns '' in one
  engine, NULL in the other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import day_str

# --------------------------------------------------------------------------
# F1: strings.
# --------------------------------------------------------------------------


@register(
    "string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
       LEN(string_split(p_name, ' ')) AS n_words,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       REPLACE(p_type, ' ', '_') AS type_snake,
       TRIM(p_name) AS name_trim
FROM part
""",
    tags=("function", "string"),
    doc="F1: upper/lower/length/substring/concat/split/regexp/replace/trim.",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
    )


# --------------------------------------------------------------------------
# F2: date/time.
# --------------------------------------------------------------------------


@register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mon,
       CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
       CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wday,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
FROM orders
""",
    tags=("function", "date"),
    doc="F2: extract/trunc/add/diff/last_day with engine-parity weekday.",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.weekday(d).alias("wday"),
        day_str(F.date_trunc("month", d)).alias("month_start"),
        day_str(F.date_add(d.cast("date"), 30)).alias("due_day"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
        day_str(F.last_day(d.cast("date"))).alias("month_end"),
    )


# --------------------------------------------------------------------------
# F3: math.
# --------------------------------------------------------------------------


@register(
    "math_funcs",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)) AS DOUBLE) AS net_price,
       ABS(l_discount - 0.05) AS disc_dev,
       SQRT(l_quantity) AS qty_sqrt,
       l_quantity * l_quantity AS qty_sq,
       FLOOR(l_extendedprice / 1000) AS price_k,
       CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil7,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       ROUND(LN(l_extendedprice), 6) AS price_ln
FROM lineitem
WHERE l_orderkey % 50 = 0
""",
    tags=("function", "math"),
    doc="F3: arithmetic/abs/sqrt/floor/ceil/mod; transcendentals rounded to 6dp.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.floor(F.col("l_extendedprice") / 1000).cast("double").alias("price_k"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("qty_ceil7"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
    )


# --------------------------------------------------------------------------
# F4: JSON (beyond the P1 extraction query) — typed extraction + defaults +
# re-serialization.  json.loads equivalent of my_data_pipeline.py:38.
# --------------------------------------------------------------------------


@register(
    "json_funcs",
    oracle="""
SELECT event_id,
       COALESCE(CAST(json_extract(props, '$.k') AS INTEGER), -1) AS k_or_default,
       CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL AS has_k,
       CAST(json_extract(props, '$.missing') AS INTEGER) AS missing_field
FROM events
""",
    tags=("function", "json"),
    doc="F4: typed JSON extraction, default-on-missing, existence flag.",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    missing = F.get_json_object("props", "$.missing").cast("int")
    return ev.select(
        "event_id",
        F.coalesce(k, F.lit(-1)).alias("k_or_default"),
        k.isNotNull().alias("has_k"),
        missing.alias("missing_field"),
    )


@register(
    "json_malformed_robustness",
    oracle="""
SELECT id,
       CASE WHEN json_valid(payload)
            THEN CAST(json_extract(payload, '$.k') AS INTEGER) END AS k,
       json_valid(payload) AS is_valid
FROM (VALUES
  (1, '{"k": 7}'),
  (2, 'not json at all'),
  (3, '{"k": }'),
  (4, NULL),
  (5, '{"other": 1}')
) AS t(id, payload)
""",
    tags=("function", "json", "robustness"),
    doc="F4 edge: malformed/missing JSON yields NULL, never an error (status-code branching parity, my_data_pipeline.py:37-48).",
)
def json_malformed_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        (1, '{"k": 7}'),
        (2, "not json at all"),
        (3, '{"k": }'),
        (4, None),
        (5, '{"other": 1}'),
    ]
    df = spark.createDataFrame(rows, "id int, payload string")
    k = F.get_json_object("payload", "$.k").cast("int")
    # Spark's validity probe: a malformed document fails even a '$' query.
    # NULL payload → NULL validity (matching SQL json_valid's null-safety).
    is_valid = F.when(
        F.col("payload").isNotNull(), F.get_json_object("payload", "$").isNotNull()
    )
    return df.select("id", k.alias("k"), is_valid.alias("is_valid"))


# --------------------------------------------------------------------------
# F5: arrays (embeddings fixture) — size / element access / slice /
# float-exact min/max.  Heavy numeric array work lives in similarity.py.
# --------------------------------------------------------------------------


@register(
    "array_funcs",
    oracle="""
SELECT vec_id,
       LEN(embedding) AS n_dims,
       embedding[1] AS first_val,
       embedding[64] AS last_val,
       list_max(embedding) AS max_val,
       list_min(embedding) AS min_val,
       embedding[1] AS head_1,
       embedding[2] AS head_2,
       embedding[3] AS head_3
FROM embeddings
""",
    tags=("function", "array"),
    doc="F5: size/element_at/slice/array_min/array_max over array<float>.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The slice result is re-exposed as scalar columns: raw array<> cells
    # crash pandas-side hashing, and float→string serialization is not
    # format-stable across engines.
    e = table(spark, sf_dir, "embeddings")
    head3 = F.slice("embedding", 1, 3)
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", 64).alias("last_val"),
        F.array_max("embedding").alias("max_val"),
        F.array_min("embedding").alias("min_val"),
        F.element_at(head3, 1).alias("head_1"),
        F.element_at(head3, 2).alias("head_2"),
        F.element_at(head3, 3).alias("head_3"),
    )


# --------------------------------------------------------------------------
# F6: maps — build a map column, then explode to rows (the oracle-friendly
# projection of map semantics).
# --------------------------------------------------------------------------


@register(
    "map_funcs",
    oracle="""
SELECT o_orderkey, 'status' AS key, o_orderstatus AS value FROM orders
UNION ALL
SELECT o_orderkey, 'priority' AS key, o_orderpriority AS value FROM orders
""",
    tags=("function", "map"),
    doc="F6: create_map + explode → (key, value) rows.",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return o.select("o_orderkey", F.explode(m).alias("key", "value"))


# --------------------------------------------------------------------------
# F7: conditionals — the engine form of the reference's status-code
# branching (my_data_pipeline.py:37-48).
# --------------------------------------------------------------------------


@register(
    "conditional_funcs",
    oracle="""
SELECT o_orderkey,
       CASE
         WHEN o_totalprice >= 300000 THEN 'large'
         WHEN o_totalprice >= 100000 THEN 'medium'
         ELSE 'small'
       END AS size_class,
       CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS finished_price,
       COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unknown') AS priority_clean,
       o_orderstatus = 'O' AS is_open
FROM orders
""",
    tags=("function", "conditional"),
    doc="F7: when/otherwise, nullif, coalesce, boolean projection.",
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).alias("finished_price"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("unknown")
        ).alias("priority_clean"),
        (F.col("o_orderstatus") == "O").alias("is_open"),
    )


# --------------------------------------------------------------------------
# F5b: higher-order array functions — exists / forall / filter / transform
# composed JVM-side (lambda expressions inside whole-stage codegen, the
# idiomatic replacement for per-row Python loops over array columns).
# Predicates compare floats against literals only → deterministic.
# --------------------------------------------------------------------------


@register(
    "higher_order_funcs",
    oracle="""
SELECT vec_id,
       LEN(list_filter(embedding, x -> x > 0)) AS n_pos,
       LEN(list_filter(embedding, x -> x > 1.0)) > 0 AS any_gt1,
       LEN(list_filter(embedding, x -> NOT (ABS(x) < 100))) = 0 AS all_small,
       LEN(list_filter(list_transform(embedding, x -> x * x), x -> x > 0.25))
         AS n_sq_gt_quarter
FROM embeddings
""",
    tags=("function", "array", "higher-order"),
    doc="F5: exists/forall/filter/transform lambda pipeline over array<float>.",
)
def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.exists(emb, lambda x: x > 1.0).alias("any_gt1"),
        F.forall(emb, lambda x: F.abs(x) < 100).alias("all_small"),
        F.size(F.filter(F.transform(emb, lambda x: x * x), lambda x: x > 0.25))
        .cast("bigint")
        .alias("n_sq_gt_quarter"),
    )


# --------------------------------------------------------------------------
# F5b: positional + outer explode.  ``posexplode_outer`` keeps rows whose
# array is empty (one NULL row) — the lossless flatten; plain explode
# silently drops them, a classic correctness trap in token pipelines.
# Oracle: DuckDB lateral over range(), with the empty case CASEd to NULL.
# --------------------------------------------------------------------------


@register(
    "posexplode_outer_tokens",
    oracle="""
WITH t AS (
  SELECT p_partkey, string_split(p_name, ' ')[4:] AS arr FROM part
)
SELECT p_partkey,
       CAST(CASE WHEN LEN(arr) = 0 THEN NULL ELSE i - 1 END AS BIGINT) AS pos,
       CASE WHEN LEN(arr) = 0 THEN NULL ELSE arr[i] END AS tok
FROM t, LATERAL (SELECT unnest(range(1, GREATEST(LEN(arr), 1) + 1)) AS i) u
""",
    tags=("function", "array"),
    doc="F5: posexplode_outer — positional flatten preserving empty-array rows.",
)
def posexplode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    arr = F.slice(F.split("p_name", " "), 4, 1000)
    return (
        p.select("p_partkey", arr.alias("arr"))
        .select("p_partkey", F.posexplode_outer("arr").alias("pos", "tok"))
        .select("p_partkey", F.col("pos").cast("bigint").alias("pos"), "tok")
    )


# --------------------------------------------------------------------------
# F7b: ANSI-safe arithmetic/cast (`try_*`).  Spark 4 runs ANSI mode by
# default — bare `/0`, overflow, or a bad cast now FAIL the job; the
# idiomatic safe path is the try_* family returning NULL instead.  DuckDB
# lacks try_divide/try_add, so the oracle spells out the equivalent
# NULLIF/TRY_CAST algebra.
# --------------------------------------------------------------------------


@register(
    "try_safe_funcs",
    oracle="""
SELECT p_partkey,
       p_retailprice / NULLIF(p_size - 10, 0) AS price_per_size,
       CAST(TRY_CAST(SUBSTR(p_name, 1, 3) AS INTEGER) AS BIGINT) AS bad_cast,
       CAST(TRY_CAST(SUBSTR(p_brand, 7) AS INTEGER) AS BIGINT) AS brand_num,
       CASE WHEN p_size - 10 = 0 THEN NULL ELSE p_retailprice / (p_size - 10) END IS NULL
         AS division_was_null
FROM part
""",
    tags=("function", "conditional", "ansi"),
    doc="F7: try_divide/try_cast NULL-on-error semantics under ANSI mode.",
)
def try_safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    div = F.try_divide(F.col("p_retailprice"), F.col("p_size") - 10)
    return p.select(
        "p_partkey",
        div.alias("price_per_size"),
        F.substring("p_name", 1, 3).try_cast("int").cast("bigint").alias("bad_cast"),
        F.substring("p_brand", 7, 100).try_cast("int").cast("bigint").alias("brand_num"),
        div.isNull().alias("division_was_null"),
    )


# --------------------------------------------------------------------------
# F4b: VARIANT semi-structured type (Spark 4's answer to string-typed
# JSON columns): parse once into a binary-encoded variant, then typed
# `variant_get` path extraction — repeated-extraction cost drops from
# re-parsing the string per path to walking the encoded tree, the
# open-format answer to JSON columns at 100 TB.  The query is also the
# parameterized-SQL demo: the threshold arrives via spark.sql named
# arguments, not string interpolation.
# --------------------------------------------------------------------------


@register(
    "variant_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract(props, '$.k') AS INTEGER) % 10 = 0 AS k_round,
       json_extract(props, '$.missing') IS NULL AS missing_is_null
FROM events
WHERE CAST(json_extract(props, '$.k') AS INTEGER) >= 50
""",
    tags=("function", "json", "variant"),
    doc="F4: VARIANT parse_json + typed variant_get, threshold via parameterized SQL.",
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "props")
    ev.createOrReplaceTempView("events_variant")
    return spark.sql(
        """
        SELECT event_id,
               variant_get(v, '$.k', 'int') AS k,
               variant_get(v, '$.k', 'int') % 10 = 0 AS k_round,
               variant_get(v, '$.missing', 'int') IS NULL AS missing_is_null
        FROM (SELECT event_id, parse_json(props) AS v FROM events_variant)
        WHERE variant_get(v, '$.k', 'int') >= :min_k
        """,
        args={"min_k": 50},
    )
