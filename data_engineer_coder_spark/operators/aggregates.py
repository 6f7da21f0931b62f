"""Aggregations A1, A3–A6 (SURVEY.md §2.4).

A1 generalizes the reference's report: ``df.describe().to_string()`` per
table (``/root/reference/dags/my_data_pipeline.py:212``) — here an
oracle-checkable single-pass aggregate instead of a rendered string.
A6 replaces the reference's loop-as-pivot (``:84-86``: one wide pandas
frame per contaminant with prefixed columns) with a real pivot.

Scale notes: every aggregate here is a partial(map-side)→final
HashAggregate — the shuffle carries group rows only.  The exact
percentile query is the one deliberate exception (global sort); its
100 TB path is ``percentile_approx`` (see ``summary_approx``, rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import DEC, davg, day_str, dsum, sql_davg, sql_dsum, with_global_pos

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# --------------------------------------------------------------------------
# A1: summary statistics (describe-equivalent), one pass, unpivoted via
# stack() so every stat is an oracle-checkable cell.
# std = sqrt((sumsq - sum²/n) / (n-1)) on exact decimal sums → deterministic.
# --------------------------------------------------------------------------


def _sql_std(expr: str) -> str:
    s = sql_dsum(expr)
    s2 = sql_dsum(f"({expr}) * ({expr})")
    return f"SQRT(({s2} - {s} * {s} / COUNT({expr})) / (COUNT({expr}) - 1))"


_SUMMARY_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def _summary_oracle() -> str:
    parts = [
        f"""
SELECT '{c}' AS col_name,
       COUNT({c}) AS cnt,
       {sql_davg(c)} AS mean,
       {_sql_std(c)} AS std,
       MIN({c}) AS min_val,
       MAX({c}) AS max_val
FROM lineitem"""
        for c in _SUMMARY_COLS
    ]
    return "\nUNION ALL\n".join(parts)


@register(
    "summary_stats",
    oracle=_summary_oracle(),
    tags=("agg", "summary"),
    doc="A1: count/mean/std/min/max per column in one scan (describe-equivalent).",
)
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")

    def _std(c: str):
        s = dsum(c)
        s2 = dsum(F.col(c) * F.col(c))
        n = F.count(c)
        return F.sqrt((s2 - s * s / n) / (n - 1))

    aggs = []
    for c in _SUMMARY_COLS:
        aggs += [
            F.count(c).alias(f"cnt_{c}"),
            davg(c).alias(f"mean_{c}"),
            _std(c).alias(f"std_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', cnt_{c}, mean_{c}, std_{c}, min_{c}, max_{c}" for c in _SUMMARY_COLS
    )
    return one.selectExpr(
        f"stack({len(_SUMMARY_COLS)}, {stack_args}) "
        "AS (col_name, cnt, mean, std, min_val, max_val)"
    )


# --------------------------------------------------------------------------
# A1b: exact quantiles (type-1 / discrete: element at rank ceil(q*n)).
# Interpolating percentiles differ at ULP level across engines; picking an
# actual element is bit-exact.  The global rank comes from the
# range-partitioned helper (no single-partition window): ties across a
# range boundary don't matter — every element at a given rank among equal
# keys has the same value.  100 TB alternative: the approx variant below.
# --------------------------------------------------------------------------


@register(
    "quantiles_exact",
    oracle="""
WITH s AS (
  SELECT l_quantity AS x,
         ROW_NUMBER() OVER (ORDER BY l_quantity) AS rn,
         COUNT(*) OVER () AS n
  FROM lineitem
)
SELECT MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN x END) AS p25,
       MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN x END) AS p50,
       MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN x END) AS p75
FROM s
""",
    tags=("agg", "summary", "sort"),
    doc="A1: exact discrete quantiles via rank selection (bit-exact across engines).",
)
def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(F.col("l_quantity").alias("x"))
    ranked = with_global_pos(li, [F.asc("x")], pos_name="rn")
    n = li.agg(F.count("*").alias("n"))
    s = ranked.crossJoin(F.broadcast(n))
    sel = lambda q: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("bigint"), F.col("x"))
    )
    return s.agg(sel(0.25).alias("p25"), sel(0.50).alias("p50"), sel(0.75).alias("p75"))


@register(
    "summary_approx",
    # Tolerance-boolean oracle (the approx_distinct_check pattern): the
    # estimates themselves are engine-specific, so the CHECKED output is
    # the exact reference values plus booleans asserting each estimate
    # landed within tolerance — which the oracle asserts as TRUE.
    oracle="""
WITH s AS (
  SELECT l_quantity AS x,
         ROW_NUMBER() OVER (ORDER BY l_quantity) AS rn,
         COUNT(*) OVER () AS n
  FROM lineitem
),
q AS (
  SELECT MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN x END) AS p25,
         MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN x END) AS p50,
         MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN x END) AS p75
  FROM s
),
d AS (
  SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
         COUNT(DISTINCT l_orderkey) AS exact_orders
  FROM lineitem
)
SELECT d.exact_parts, d.exact_orders,
       TRUE AS parts_within_8pct,
       TRUE AS orders_within_8pct,
       TRUE AS q25_within_2pct,
       TRUE AS q50_within_2pct,
       TRUE AS q75_within_2pct
FROM d, q
""",
    tags=("agg", "summary", "approx"),
    doc=(
        "A1/100TB: approx quantiles + approx distinct (t-digest/HLL) — the "
        "scale path — asserted within tolerance of exact twins.  The approx "
        "side is the one-pass mergeable-sketch plan that survives 100 TB; "
        "the exact side here is verification scaffolding only."
    ),
)
def summary_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # One-pass sketch aggregates (quantiles exploded to scalars: the
    # driver's pandas canonicalizer chokes on raw array<> cells).
    approx = li.agg(
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10000).alias("qs"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )
    exact_counts = li.agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    # Exact discrete quantiles without a single-partition sort (range-
    # partitioned global rank; see quantiles_exact).
    ranked = with_global_pos(
        li.select(F.col("l_quantity").alias("x")), [F.asc("x")], pos_name="rn"
    )
    n = li.agg(F.count("*").alias("n"))
    sel = lambda qf: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(qf) * F.col("n")).cast("bigint"), F.col("x"))
    )
    exact_q = ranked.crossJoin(F.broadcast(n)).agg(
        sel(0.25).alias("p25"), sel(0.50).alias("p50"), sel(0.75).alias("p75")
    )
    j = approx.crossJoin(F.broadcast(exact_counts)).crossJoin(F.broadcast(exact_q))

    def within(est, exact, tol):
        return F.abs(est - exact) <= tol * exact

    # Count tolerance is 4 sigma over rsd=0.02 (8%): the driver's recorded
    # row carries only booleans, so a tolerance trip must MEAN a logic bug
    # (wrong column, lost dedup — errors >>8%), not sketch variance.  At
    # 2.5 sigma (the old 5%) a legitimate HLL estimate trips ~1% of runs.
    return j.select(
        "exact_parts",
        "exact_orders",
        within(F.col("approx_parts"), F.col("exact_parts"), 0.08).alias("parts_within_8pct"),
        within(F.col("approx_orders"), F.col("exact_orders"), 0.08).alias("orders_within_8pct"),
        within(F.element_at("qs", 1), F.col("p25"), 0.02).alias("q25_within_2pct"),
        within(F.element_at("qs", 2), F.col("p50"), 0.02).alias("q50_within_2pct"),
        within(F.element_at("qs", 3), F.col("p75"), 0.02).alias("q75_within_2pct"),
    )


# --------------------------------------------------------------------------
# A3: count / sum / exact distinct count.
# --------------------------------------------------------------------------


@register(
    "count_distinct",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
""",
    tags=("agg",),
    doc="A3: global count/sum + exact distinct counts (expand-based in Spark).",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_quantity").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# A4: rollup / cube — multi-granularity in one pass (partial aggregates are
# shared across grouping sets by Catalyst's Expand).
# --------------------------------------------------------------------------


@register(
    "rollup_returnflag",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    tags=("agg", "rollup"),
    doc="A4: rollup over (returnflag, linestatus) — per-pair, per-flag, grand total.",
)
def rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "cube_orders",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    tags=("agg", "cube"),
    doc="A4: cube over (status, priority) — all 4 grouping sets in one pass.",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "grouping_sets_events",
    oracle=f"""
SELECT COALESCE(event_type, 'ALL') AS etype,
       COALESCE(CAST(user_id AS VARCHAR), 'ALL') AS uid,
       COUNT(*) AS n,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id), ())
""",
    tags=("agg", "grouping-sets"),
    doc="A4: explicit GROUPING SETS — two independent dimensions + grand total.",
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT COALESCE(event_type, 'ALL') AS etype,
               COALESCE(CAST(user_id AS STRING), 'ALL') AS uid,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """
    )


# --------------------------------------------------------------------------
# A5: collect_list — re-nesting rows into arrays (inverse of the flatten
# P1; sorted so the value is deterministic).
# --------------------------------------------------------------------------


@register(
    "collect_lines",
    oracle="""
SELECT l_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_nums,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_orderkey
""",
    tags=("agg", "nest"),
    doc="A5: collect_list + sort_array, serialized to CSV — deterministic re-nesting per order.",
)
def collect_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Serialized to a string (not a raw array<int> cell): integer→string is
    # format-stable across engines, and array cells crash pandas-side hashing.
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.sort_array(F.collect_list("l_linenumber")).cast("array<string>"), ","
        ).alias("line_nums"),
        F.count("*").alias("n_lines"),
    )


# --------------------------------------------------------------------------
# A6: pivot — long→wide on event_type with an explicit value list (an
# implicit list would need an extra distinct scan; explicit also fixes the
# output schema, which 100 TB jobs require anyway).
# Replaces the reference's per-contaminant prefixed-column loop
# (my_data_pipeline.py:70-72,84-86).
# --------------------------------------------------------------------------


def _pivot_oracle() -> str:
    cells = ",\n       ".join(
        f"CAST(CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)"
        f" / COUNT(CASE WHEN event_type = '{t}' THEN value END) AS DOUBLE) AS {t}_avg"
        for t in EVENT_TYPES
    )
    return f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       {cells}
FROM events
GROUP BY 1
"""


@register(
    "pivot_event_types",
    oracle=_pivot_oracle(),
    tags=("agg", "pivot"),
    doc="A6: pivot events long→wide, one avg-value column per event type.",
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy(day_str("ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(davg("value"))
    )
    for t in EVENT_TYPES:
        out = out.withColumnRenamed(t, f"{t}_avg")
    return out


# --------------------------------------------------------------------------
# A6b: unpivot (melt) — the inverse of the pivot above: the wide
# per-type table back to long (day, event_type, avg_value) rows.
# Null cells (day × type combos with no events) are dropped so the
# result equals the direct long aggregate, which is also the oracle.
# --------------------------------------------------------------------------


@register(
    "unpivot_event_types",
    oracle=f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       event_type,
       {sql_davg('value')} AS avg_value
FROM events
GROUP BY 1, 2
""",
    tags=("agg", "pivot", "unpivot"),
    doc="A6: unpivot/melt of the wide pivot back to long — round-trips to the direct aggregate.",
)
def unpivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_event_types(spark, sf_dir)
    long = wide.unpivot(
        "day",
        [f"{t}_avg" for t in EVENT_TYPES],
        "event_type",
        "avg_value",
    )
    return long.filter(F.col("avg_value").isNotNull()).select(
        "day",
        F.regexp_replace("event_type", "_avg$", "").alias("event_type"),
        "avg_value",
    )


# --------------------------------------------------------------------------
# A4b: grouping_id — the correct way to tell a subtotal row from a
# genuine NULL group key (the COALESCE(x,'ALL') idiom above conflates
# them; fixture keys are non-null so both are shown).
# --------------------------------------------------------------------------


@register(
    "rollup_grouping_id",
    oracle=f"""
SELECT COALESCE(l_returnflag, '(total)') AS returnflag,
       COALESCE(l_linestatus, '(total)') AS linestatus,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    tags=("agg", "rollup", "grouping-id"),
    doc="A4: rollup with grouping_id marking which keys are aggregated per row.",
)
def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(total)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(total)")).alias("linestatus"),
            F.col("gid").cast("bigint").alias("gid"),
            "n",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# A1 extension: equi-width histogram.  One hash aggregate over the bucket
# expression — the distributed histogram IS a group-by; fixed bin edges
# keep the double arithmetic bit-identical cross-engine.
# --------------------------------------------------------------------------

_HIST_LO, _HIST_W, _HIST_NB = 0.0, 30000.0, 20


@register(
    "price_histogram",
    oracle=f"""
SELECT CAST(LEAST(FLOOR((o_totalprice - {_HIST_LO}) / {_HIST_W}), {_HIST_NB - 1}) AS BIGINT) AS bucket,
       CAST(LEAST(FLOOR((o_totalprice - {_HIST_LO}) / {_HIST_W}), {_HIST_NB - 1}) * {_HIST_W} AS DOUBLE) AS bucket_lo,
       COUNT(*) AS n,
       {sql_dsum("o_totalprice")} AS sum_price
FROM orders
GROUP BY 1, 2
""",
    tags=("agg", "histogram"),
    doc=(
        "Equi-width histogram of order totals (20 x 30k buckets, top "
        "bucket clamps the tail): bucket expression + one hash aggregate "
        "— fully parallel, map-side combinable."
    ),
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_totalprice")
    bucket = F.least(
        F.floor((F.col("o_totalprice") - _HIST_LO) / _HIST_W), F.lit(_HIST_NB - 1)
    ).cast("bigint")
    return (
        o.withColumn("bucket", bucket)
        .withColumn("bucket_lo", (F.col("bucket") * _HIST_W).cast("double"))
        .groupBy("bucket", "bucket_lo")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("sum_price"))
    )


# --------------------------------------------------------------------------
# A3 extension: HLL sketch vs exact, driver-checked via a tolerance
# boolean.  approx_count_distinct is THE count-distinct at 100 TB (fixed
# few-KB state per group vs an unbounded distinct-set shuffle); emitting
# (exact, within_tolerance) makes the sketch's accuracy an oracle fact
# while keeping engine-specific sketch internals out of the hash.
# --------------------------------------------------------------------------


@register(
    "approx_distinct_check",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_8pct
FROM events
GROUP BY event_type
""",
    tags=("agg", "approx", "sketch"),
    doc=(
        "HyperLogLog++ distinct-user estimate per event type, asserted "
        "within 8% (4 sigma over rsd=0.02; ~10 groups each get a trial, "
        "so the per-group gate must be far out in the tail for a trip to "
        "mean a logic bug).  The exact count and the tolerance verdict "
        "are the checked output; the estimate itself is engine-specific."
    ),
)
def approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    g = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    return g.select("event_type", "exact_users", (rel_err < 0.08).alias("approx_within_8pct"))


# --------------------------------------------------------------------------
# A1 extension: exact per-group quantiles with explicit type-7
# interpolation.  Engine builtins interpolate with engine-specific
# arithmetic; spelling the formula out (rank selection + linear
# interpolation) makes the result bit-identical cross-engine AND keeps
# the window partitioned by group — per-group sorts distribute, unlike a
# global-order quantile.
# --------------------------------------------------------------------------


@register(
    "group_quantiles",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
s AS (
  SELECT g, MAX(n) AS n,
         MIN(CASE WHEN rn = FLOOR(1 + (n-1)*0.5) THEN v END) AS lo5,
         MIN(CASE WHEN rn = CEIL(1 + (n-1)*0.5)  THEN v END) AS hi5,
         MIN(CASE WHEN rn = FLOOR(1 + (n-1)*0.9) THEN v END) AS lo9,
         MIN(CASE WHEN rn = CEIL(1 + (n-1)*0.9)  THEN v END) AS hi9
  FROM r GROUP BY g
)
SELECT g AS l_returnflag, n AS n_rows,
       lo5 + (hi5 - lo5) * ((1 + (n-1)*0.5) - FLOOR(1 + (n-1)*0.5)) AS qty_p50,
       lo9 + (hi9 - lo9) * ((1 + (n-1)*0.9) - FLOOR(1 + (n-1)*0.9)) AS qty_p90
FROM s
""",
    tags=("agg", "window", "quantile"),
    doc=(
        "Exact p50/p90 of quantity per return flag: row_number + count "
        "windows pick the two straddling order statistics, explicit "
        "type-7 interpolation combines them.  Scale: partitioned by the "
        "group key — no global sort, no single-partition window."
    ),
)
def group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"), F.col("l_quantity").cast("double").alias("v")
    )
    w = Window.partitionBy("g").orderBy("v")
    r = li.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("g"))
    )

    def pick(p: float, which) -> F.Column:
        pos = 1 + (F.col("n") - 1) * p
        target = which(pos)
        return F.min(F.when(F.col("rn") == target, F.col("v")))

    s = r.groupBy("g").agg(
        F.max("n").alias("n"),
        pick(0.5, F.floor).alias("lo5"),
        pick(0.5, F.ceil).alias("hi5"),
        pick(0.9, F.floor).alias("lo9"),
        pick(0.9, F.ceil).alias("hi9"),
    )

    def interp(lo, hi, p):
        pos = 1 + (F.col("n") - 1) * p
        frac = pos - F.floor(pos)
        return F.col(lo) + (F.col(hi) - F.col(lo)) * frac

    return s.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").alias("n_rows"),
        interp("lo5", "hi5", 0.5).alias("qty_p50"),
        interp("lo9", "hi9", 0.9).alias("qty_p90"),
    )


# --------------------------------------------------------------------------
# A7: bivariate statistics per group — Pearson correlation and OLS
# slope/intercept (the regr_slope/regr_intercept/corr SQL family), built
# from exact decimal moments (Σx, Σy, Σxy, Σx², n) instead of the engines'
# native streaming accumulators, whose double accumulation order is
# nondeterministic across engines AND across partitionings.  The final
# double arithmetic runs the identical expression tree in both engines on
# identical inputs, so results are bit-exact.  One hash agg, map-side
# combinable — the moments pattern is how you make ANY algebraic
# statistic deterministic at 100 TB.
# --------------------------------------------------------------------------


@register(
    "corr_regression_by_flag",
    oracle=f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         {sql_dsum("l_quantity")} AS sx,
         {sql_dsum("l_extendedprice")} AS sy,
         {sql_dsum("l_quantity * l_extendedprice")} AS sxy,
         {sql_dsum("l_quantity * l_quantity")} AS sx2,
         {sql_dsum("l_extendedprice * l_extendedprice")} AS sy2
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy) / (n * sx2 - sx * sx) AS slope,
       (sy - ((n * sxy - sx * sy) / (n * sx2 - sx * sx)) * sx) / n AS intercept,
       (n * sxy - sx * sy)
         / (SQRT(n * sx2 - sx * sx) * SQRT(n * sy2 - sy * sy)) AS pearson_r
FROM m
""",
    tags=("agg", "stats"),
    doc="A7: per-group OLS slope/intercept + Pearson r from exact decimal moments.",
)
def corr_regression_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr/regr_slope/regr_intercept equivalents, deterministic by moments."""
    li = table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sx2"),
        dsum(y * y).alias("sy2"),
    )
    n, sx, sy, sxy, sx2, sy2 = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sx2", "sy2"))
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    intercept = (sy - slope * sx) / n
    r = (n * sxy - sx * sy) / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy))
    return m.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r.alias("pearson_r"),
    )


# --------------------------------------------------------------------------
# A1 extension: approximate quantiles with a hard correctness signal.
# percentile_approx's sketch values are engine-specific, so checking them
# directly is impossible — instead both engines emit the EXACT discrete
# quantile plus a boolean asserting the approx estimate landed within a
# rank-error tolerance of it (the oracle asserts TRUE, mirroring
# approx_distinct_check).  The approx path is the 100 TB one: one
# mergeable sketch pass, no per-group sort.
# --------------------------------------------------------------------------


@register(
    "approx_quantile_check",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT g AS l_returnflag,
       MIN(CASE WHEN rn = CEIL(n * 0.5) THEN v END) AS exact_p50,
       TRUE AS approx_within_tol
FROM r GROUP BY g
""",
    tags=("agg", "approx", "sketch"),
    doc=(
        "A1: percentile_approx p50 per group, asserted within ±2% "
        "value-tolerance of the exact discrete quantile; exact value + "
        "verdict are the checked output."
    ),
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("double").alias("v")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy("v")
    wc = Window.partitionBy("l_returnflag")
    r = li.select(
        F.col("l_returnflag"),
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    exact = r.groupBy(F.col("l_returnflag")).agg(
        F.min(
            F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("v"))
        ).alias("exact_p50")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("v", 0.5, 10000).alias("approx_p50")
    )
    j = exact.join(approx, "l_returnflag")
    ok = (
        F.abs(F.col("approx_p50") - F.col("exact_p50"))
        <= 0.02 * F.greatest(F.abs(F.col("exact_p50")), F.lit(1.0))
    )
    return j.select("l_returnflag", "exact_p50", ok.alias("approx_within_tol"))


# --------------------------------------------------------------------------
# A1 extension: winsorized statistics — the ML-preprocessing clip: cap
# each group's values at its own discrete p05/p95, then aggregate.
# Discrete quantiles are actual data values (rank selection, the
# group_quantiles contract) so the clip thresholds are bit-identical in
# both engines, and the clipped mean is an exact decimal sum.  Shape: one
# per-group window pass for ranks + one hash agg — distributes on the
# group key.
# --------------------------------------------------------------------------


@register(
    "winsorized_stats",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS g, l_extendedprice AS v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
cuts AS (
  SELECT g,
         MIN(CASE WHEN rn = CEIL(n * 0.05) THEN v END) AS lo,
         MIN(CASE WHEN rn = CEIL(n * 0.95) THEN v END) AS hi
  FROM r GROUP BY g
)
SELECT r.g AS l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN r.v < c.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN r.v > c.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       CAST(CAST(SUM(CAST(LEAST(GREATEST(r.v, c.lo), c.hi) AS DECIMAL(38,6))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS winsorized_mean
FROM r JOIN cuts c USING (g)
GROUP BY r.g
""",
    tags=("agg", "stats", "ml"),
    doc="A1: per-group p05/p95 winsorized mean + clip counts (discrete cut points).",
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-exact variant: cut points via per-group rank windows, so
    parallelism is bounded by group count (3 here) — the quantiles_exact
    caveat.  Scale path at low-cardinality groups: percentile_approx cut
    points (one mergeable sketch agg), identical clip/aggregate shape.
    """
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("g").orderBy("v", "l_orderkey", "l_linenumber")
    wc = Window.partitionBy("g")
    r = li.select(
        "g",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    cuts = r.groupBy("g").agg(
        F.min(F.when(F.col("rn") == F.ceil(F.col("n") * 0.05), F.col("v"))).alias("lo"),
        F.min(F.when(F.col("rn") == F.ceil(F.col("n") * 0.95), F.col("v"))).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (
        r.join(cuts, "g")
        .groupBy(F.col("g").alias("l_returnflag"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0)).alias("n_clipped_low"),
            F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0)).alias("n_clipped_high"),
            (F.sum(clipped.cast(DEC)).cast("double") / F.count("*")).cast("double").alias(
                "winsorized_mean"
            ),
        )
    )


# --------------------------------------------------------------------------
# A8: mergeable distinct-count sketches — the 100 TB counting pattern:
# build an HLL sketch PER PARTITION SLICE (here per day), persist/ship the
# ~KB sketches, and union them later for any rollup without touching raw
# data again.  `approx_count_distinct` answers one fixed question;
# sketch-agg + union answers every containing rollup.  Estimates are
# engine-specific, so (like approx_distinct_check) the checked output is
# the exact count + a tolerance verdict.
# --------------------------------------------------------------------------


@register(
    "hll_union_check",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS union_within_8pct
FROM events
GROUP BY event_type
""",
    tags=("agg", "approx", "sketch"),
    doc=(
        "A8: per-day HLL sketches unioned per event type; union estimate "
        "asserted within 8% (4 sigma at lgConfigK=14) of the exact count."
    ),
)
def hll_union_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count_distinct("user_id").alias("_daily_exact"),
    )
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    j = merged.join(exact, "event_type")
    rel_err = F.abs(F.col("_est") - F.col("exact_users")) / F.col("exact_users")
    return j.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        "exact_users",
        (rel_err < 0.08).alias("union_within_8pct"),
    )


# --------------------------------------------------------------------------
# A8b: count-min sketch — the mergeable frequency sketch next to HLL
# (cardinality) above.  Unlike hll_sketch_agg there is no Spark builtin,
# so the sketch is built from first principles as a (row, bucket) hash
# aggregate: d=4 deterministic md5-derived hash rows × w=1024 buckets.
# The cells table is 4096 counts REGARDLESS of corpus size and is
# map-side combinable end to end — the whole point of the sketch at
# 100 TB (counts merge by cell-wise addition across partitions/days).
# Hashes are md5-hex-prefix mod w, the repo's established cross-engine
# pattern (sampling.py train_test_split), so the DuckDB oracle builds
# the IDENTICAL sketch and the estimates compare exactly.
# --------------------------------------------------------------------------

_CM_D = 4
_CM_W = 1024
_CM_TOPN = 30


def _cm_bucket_spark(j: int, key) -> "F.Column":
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}|"), key)), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(_CM_W),
    )


def _cm_bucket_sql(j: int, col: str) -> str:
    return (
        f"(('0x' || substring(md5('{j}|' || {col}), 1, 8))::BIGINT % {_CM_W})"
    )


@register(
    "countmin_token_freq",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
cells AS (
  SELECT j, bucket, COUNT(*) AS cell
  FROM (
    {" UNION ALL ".join(
        f"SELECT {j} AS j, {_cm_bucket_sql(j, 'w')} AS bucket FROM toks"
        for j in range(_CM_D)
    )}
  )
  GROUP BY j, bucket
),
exact AS (
  SELECT w AS token, COUNT(*) AS exact_cnt FROM toks GROUP BY w
  ORDER BY exact_cnt DESC, token ASC LIMIT {_CM_TOPN}
),
probes AS (
  {" UNION ALL ".join(
      f"SELECT token, exact_cnt, {j} AS j, "
      f"{_cm_bucket_sql(j, 'token')} AS bucket FROM exact"
      for j in range(_CM_D)
  )}
)
SELECT token, exact_cnt, MIN(cell) AS cm_estimate,
       MIN(cell) >= exact_cnt AS never_underestimates
FROM probes JOIN cells USING (j, bucket)
GROUP BY token, exact_cnt
""",
    tags=("agg", "approx", "sketch", "text", "llm"),
    doc=(
        "A8: count-min sketch (d=4 x w=1024, md5-derived rows) over the "
        "corpus token stream; estimates for the top-30 tokens vs exact "
        "counts, asserting the one-sided error guarantee."
    ),
)
def countmin_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for the 30 most frequent tokens.

    One explode over the token stream feeds BOTH the 4096-cell sketch
    (hash aggregate, map-side combinable) and the exact top-30; probes
    then broadcast-join the cells.  At scale only the sketch build
    touches the corpus — probing is O(top-n x d) against 4096 cells.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
    )
    rows = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_bucket_spark(j, F.col("w")).alias("bucket"),
                    )
                    for j in range(_CM_D)
                ]
            )
        ).alias("jb")
    )
    cells = (
        rows.select("jb.j", "jb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cell"))
    )
    exact = (
        toks.groupBy(F.col("w").alias("token"))
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(_CM_TOPN)
    )
    probes = exact.select(
        "token",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_bucket_spark(j, F.col("token")).alias("bucket"),
                    )
                    for j in range(_CM_D)
                ]
            )
        ).alias("jb"),
    ).select("token", "exact_cnt", "jb.j", "jb.bucket")
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cell").alias("cm_estimate"))
        .withColumn(
            "never_underestimates", F.col("cm_estimate") >= F.col("exact_cnt")
        )
    )


# --------------------------------------------------------------------------
# A8c: bloom-filter membership — the third mergeable sketch next to HLL
# (cardinality) and count-min (frequency): approximate set membership.
# The 100 TB use case is join pruning / decontamination probes where
# shipping the exact key set is too big but a few MB of bloom bits
# broadcast to every executor is free.  Spark 4's builtin
# bloom_filter_agg is not SQL-registered, so — exactly like the
# count-min build above — the sketch is constructed from first
# principles: k=4 md5-derived hash positions into m=131072 bits, the
# "set bits" relation is a distinct over positions (bitwise-OR
# mergeability = set union, map-side combinable), and probes join
# against it.  Because the construction is pure md5 integer math, the
# DuckDB oracle rebuilds the IDENTICAL filter and the false-positive
# count is exact-hash-checkable — a stronger check than a
# TRUE-constant gate.
# --------------------------------------------------------------------------

_BLOOM_M = 131_072  # bits; ~9 bits/key at sf0.1 => theoretical FP ~1.8%
_BLOOM_K = 4  # hash functions


@register(
    "bloom_membership_gate",
    oracle=f"""
WITH keys AS (
  SELECT DISTINCT c_custkey AS k FROM customer
), pos AS (
  SELECT k, j,
         ('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))::BIGINT
           % {_BLOOM_M} AS p
  FROM keys CROSS JOIN (SELECT unnest(range(0, {_BLOOM_K})) AS j)
), bits AS (
  SELECT DISTINCT p FROM pos
), mprobe AS (
  SELECT k, COUNT(b.p) AS c
  FROM pos LEFT JOIN bits b USING (p) GROUP BY k
), fpos AS (
  SELECT k, j,
         ('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(k + 1000000000 AS VARCHAR)), 1, 8))::BIGINT
           % {_BLOOM_M} AS p
  FROM keys CROSS JOIN (SELECT unnest(range(0, {_BLOOM_K})) AS j)
), fprobe AS (
  SELECT k, COUNT(b.p) AS c
  FROM fpos LEFT JOIN bits b USING (p) GROUP BY k
)
SELECT (SELECT COUNT(*) FROM keys) AS n_members,
       (SELECT COUNT(*) FROM bits) AS n_bits_set,
       (SELECT COUNT(CASE WHEN c = {_BLOOM_K} THEN 1 END) FROM mprobe) AS n_member_hits,
       (SELECT COUNT(CASE WHEN c = {_BLOOM_K} THEN 1 END) FROM fprobe) AS n_false_positives,
       (SELECT COUNT(CASE WHEN c = {_BLOOM_K} THEN 1 END) FROM fprobe) * 50
         < (SELECT COUNT(*) FROM keys) AS fp_rate_lt_2pct
""",
    tags=("agg", "approx", "sketch", "quality"),
    doc=(
        "A8: first-principles bloom filter (k=4 md5 hashes, m=131072 bits) "
        "over customer keys — member probes must all hit, and the exact "
        "false-positive count on a disjoint shifted key set is "
        "hash-checked against the oracle's identical rebuild."
    ),
)
def bloom_membership_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build + probe a deterministic bloom filter, cross-engine exact.

    The set-bits relation plays the role of the bit array; `distinct`
    is the set union that makes the sketch mergeable across partitions.
    Probes LEFT-join their k positions against it: a key "hits" iff all
    k rows matched.  Every count in the output is exact integer math on
    md5 values both engines compute identically.
    """

    def positions(key_col):
        return F.array(
            *[
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(j), key_col.cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % _BLOOM_M
                for j in range(_BLOOM_K)
            ]
        )

    keys = (
        table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k")).distinct()
    )
    pos = keys.select("k", F.explode(positions(F.col("k"))).alias("p"))
    bits = pos.select("p").distinct().withColumn("_set", F.lit(1))
    mhit = (
        pos.join(bits, "p", "left")
        .groupBy("k")
        .agg(F.count("_set").alias("c"))
    )
    fpos = keys.select(
        "k", F.explode(positions(F.col("k") + 1_000_000_000)).alias("p")
    )
    fhit = (
        fpos.join(bits, "p", "left")
        .groupBy("k")
        .agg(F.count("_set").alias("c"))
    )
    n_members = keys.agg(F.count("*").alias("n_members"))
    n_bits = bits.agg(F.count("*").alias("n_bits_set"))
    m = mhit.agg(
        F.count(F.when(F.col("c") == _BLOOM_K, F.lit(1))).alias("n_member_hits")
    )
    f = fhit.agg(
        F.count(F.when(F.col("c") == _BLOOM_K, F.lit(1))).alias("n_false_positives")
    )
    return (
        n_members.crossJoin(n_bits)
        .crossJoin(m)
        .crossJoin(f)
        .select(
            "n_members",
            "n_bits_set",
            "n_member_hits",
            "n_false_positives",
            (F.col("n_false_positives") * 50 < F.col("n_members")).alias(
                "fp_rate_lt_2pct"
            ),
        )
    )


# --------------------------------------------------------------------------
# A7 (round 8): incremental materialized-view maintenance.  A standing
# daily rollup plus a new ingest batch must produce the SAME rollup a
# full recompute would, without rescanning history — the continuous-
# aggregate contract every warehouse needs at 100 TB (rescanning a year
# of events per ingest hour is the naive plan; merging partial states
# is the scalable one).  The trick is carrying MERGEABLE state in the
# view: counts, exact DECIMAL sums (not doubles — double partial sums
# would make merge order observable), min/max.  avg is derived at read
# time from (sum, count).  The oracle is the full recompute over all of
# events, so the driver's value-hash parity IS the merge==recompute
# theorem instance.
# --------------------------------------------------------------------------

_ROLLUP_CUT = "2024-01-26 00:00:00"


@register(
    "incremental_rollup_merge",
    oracle=f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value,
       {sql_davg('value')} AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
""",
    tags=("agg", "incremental", "matview"),
    doc=(
        "A7: incremental rollup maintenance — standing daily view "
        "(ts < Jan 26) merged with the new batch (ts >= Jan 26) via "
        "mergeable partial states; oracle = full recompute."
    ),
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
        (F.col("ts") < F.lit(_ROLLUP_CUT).cast("timestamp")).alias("_standing"),
    )

    def partial(df: DataFrame) -> DataFrame:
        # the view's stored state: everything here is mergeable EXACTLY
        return df.groupBy("day", "event_type").agg(
            F.count("*").alias("n"),
            F.count("value").alias("n_val"),
            F.sum(F.col("value").cast(DEC)).alias("sv"),  # decimal, NOT double
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    standing = partial(ev.filter(F.col("_standing")))
    batch = partial(ev.filter(~F.col("_standing")))
    return (
        standing.unionByName(batch)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("n_val").alias("_nv"),
            F.sum("sv").alias("_sv"),  # decimal + decimal: exact, order-free
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            F.col("_sv").cast("double").alias("sum_value"),
            (F.col("_sv").cast("double") / F.col("_nv"))
            .cast("double")
            .alias("avg_value"),
            "min_value",
            "max_value",
        )
    )


# --------------------------------------------------------------------------
# A8c (round 8): AMS second-frequency-moment sketch (Alon–Matias–Szegedy
# '96) — F2 = Σ f_tok² estimated from 16 ±1-sign counters (4 groups × 4,
# mean-then-lower-median), next to the exact F2 for the error gate.  F2
# is the self-join-size / skew statistic a planner wants BEFORE running
# the join.  Completes the sketch family (HLL, count-min, bloom,
# Misra-Gries).  Scale shape: the 16 counters are ONE ungrouped
# aggregate over the token stream — 16 partial sums, map-side combined,
# a single 16-value row crosses the wire; the exact side is the normal
# hash-agg.  All integer arithmetic (signs, sums, squares) on md5-
# derived bits, so DuckDB rebuilds the identical sketch bit-for-bit.
# --------------------------------------------------------------------------

_AMS_J = 16  # counters: 4 groups of 4


def _ams_sign_sql(j: int) -> str:
    return (
        f"CASE WHEN substr(md5(tok || '|{j}'), 1, 1) >= '8' THEN 1 ELSE -1 END"
    )


def _ams_oracle() -> str:
    zs = ",\n         ".join(
        f"CAST(SUM({_ams_sign_sql(j)}) AS BIGINT) AS z{j}" for j in range(_AMS_J)
    )
    groups = ", ".join(
        "(" + " + ".join(f"z{4 * g + i} * z{4 * g + i}" for i in range(4)) + ")"
        for g in range(4)
    )
    return f"""
WITH t AS MATERIALIZED (
  SELECT tok
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
),
z AS (
  SELECT {zs}
  FROM t
),
ex AS (
  SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens
  FROM (SELECT COUNT(*) AS cnt FROM t GROUP BY tok)
),
est AS (
  SELECT list_sort([{groups}])[2] // 4 AS ams_estimate FROM z
)
SELECT n_tokens, exact_f2, ams_estimate,
       (ams_estimate <= 2 * exact_f2 AND exact_f2 <= 2 * ams_estimate)
         AS within_2x
FROM ex CROSS JOIN est
"""


@register(
    "ams_f2_sketch",
    oracle=_ams_oracle(),
    tags=("sketch", "llm", "approx"),
    doc=(
        "A8c: AMS F2 (self-join size) sketch — 16 md5-sign counters in "
        "one ungrouped map-side aggregate, 4-group mean + lower-median "
        "estimate vs the exact Σf², with a 2x error gate."
    ),
)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )

    def sign(j: int):
        h = F.md5(F.concat(F.col("tok"), F.lit(f"|{j}")))
        return F.when(F.substring(h, 1, 1) >= "8", 1).otherwise(-1)

    z = toks.agg(
        *[F.sum(sign(j)).cast("bigint").alias(f"z{j}") for j in range(_AMS_J)]
    )
    group_sums = [
        sum(
            (F.col(f"z{4 * g + i}") * F.col(f"z{4 * g + i}") for i in range(4)),
            start=F.lit(0).cast("bigint"),
        )
        for g in range(4)
    ]
    # lower median of the 4 group sums, then /4 (the in-group mean) as a
    # pure-integer shift — group sums are non-negative, so >>2 == //4
    # in both engines with no double intermediate.
    est = z.select(
        F.shiftright(F.sort_array(F.array(*group_sums)).getItem(1), 2)
        .cast("bigint")
        .alias("ams_estimate")
    )
    ex = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("exact_f2"),
            F.sum("cnt").cast("bigint").alias("n_tokens"),
        )
    )
    return ex.crossJoin(F.broadcast(est)).select(
        "n_tokens",
        "exact_f2",
        "ams_estimate",
        (
            (F.col("ams_estimate") <= 2 * F.col("exact_f2"))
            & (F.col("exact_f2") <= 2 * F.col("ams_estimate"))
        ).alias("within_2x"),
    )


# --------------------------------------------------------------------------
# A8d (round 8 late): count-min INNER-PRODUCT join-cardinality estimate —
# what a cost-based planner wants before scheduling a join: |A ⋈ B| =
# Σ_k fA(k)·fB(k), estimated as min_j Σ_w cmA[j,w]·cmB[j,w] (Cormode &
# Muthukrishnan '05).  The estimate is ONE-SIDED (≥ exact, always: each
# row of the sketch product counts every true pair plus hash
# collisions), which the audit asserts next to the measured relative
# overshoot.  Scale shape: each side's sketch is one hash agg to
# d×w = 4096 cells; the "join" is a 4096-row cell merge — the 100 TB
# join's size is priced without shuffling either table.  All integer
# (md5 buckets, BIGINT counts/products), so DuckDB rebuilds both
# sketches bit-for-bit.
# --------------------------------------------------------------------------


_CMJ_W = 8192  # wider than the token sketch: join keys are high-cardinality
# (w must sit above the distinct-key count or collisions dominate the
# inner product; overshoot measured 15.6x at w=1024 vs 1.1-2.5x at 8192)


def _cmj_bucket_sql(j: int, col: str) -> str:
    return (
        f"(('0x' || substring(md5('{j}|' || {col}), 1, 8))::BIGINT % {_CMJ_W})"
    )


def _cm_cells_sql(src: str, key: str) -> str:
    rows = "\n    UNION ALL\n    ".join(
        f"SELECT {j} AS j, {_cmj_bucket_sql(j, key)} AS bucket FROM {src}"
        for j in range(_CM_D)
    )
    return f"SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (\n    {rows}\n  ) GROUP BY j, bucket"


@register(
    "cm_join_cardinality_audit",
    oracle=f"""
WITH a AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
b AS (SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer),
ca AS ({_cm_cells_sql('a', 'k')}),
cb AS ({_cm_cells_sql('b', 'k')}),
ip AS (
  SELECT ca.j, CAST(SUM(ca.c * cb.c) AS BIGINT) AS dot
  FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
  GROUP BY ca.j
),
ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_card
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT exact_card,
       (SELECT MIN(dot) FROM ip) AS cm_estimate,
       (SELECT MIN(dot) FROM ip) >= exact_card AS one_sided_ok,
       CAST(FLOOR(10000.0 * (SELECT MIN(dot) FROM ip) / exact_card) AS BIGINT)
         AS ratio_e4
FROM ex
""",
    tags=("sketch", "join", "approx"),
    doc=(
        "A8d: count-min inner-product estimate of |orders ⋈ customer| "
        "(min over d rows of the 4096-cell sketch dot product) vs the "
        "exact join count — one-sided (>= exact) by construction, "
        "asserted; the planner's join-size oracle without a shuffle."
    ),
)
def cm_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def cells(df, key):
        rows = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.pmod(
                                F.conv(
                                    F.substring(
                                        F.md5(
                                            F.concat(
                                                F.lit(f"{j}|"),
                                                F.col(key).cast("string"),
                                            )
                                        ),
                                        1,
                                        8,
                                    ),
                                    16,
                                    10,
                                ).cast("bigint"),
                                F.lit(_CMJ_W),
                            ).alias("bucket"),
                        )
                        for j in range(_CM_D)
                    ]
                )
            ).alias("jb")
        )
        return (
            rows.select("jb.j", "jb.bucket")
            .groupBy("j", "bucket")
            .agg(F.count("*").cast("bigint").alias("c"))
        )

    o = table(spark, sf_dir, "orders").select("o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    ca = cells(o, "o_custkey")
    cb = cells(c, "c_custkey").withColumnsRenamed({"c": "cb"})
    ip = (
        ca.join(cb, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("cb")).cast("bigint").alias("dot"))
        .agg(F.min("dot").cast("bigint").alias("cm_estimate"))
    )
    ex = o.join(c, o["o_custkey"] == c["c_custkey"]).agg(
        F.count("*").cast("bigint").alias("exact_card")
    )
    return ex.crossJoin(F.broadcast(ip)).select(
        "exact_card",
        "cm_estimate",
        (F.col("cm_estimate") >= F.col("exact_card")).alias("one_sided_ok"),
        F.floor(10000.0 * F.col("cm_estimate") / F.col("exact_card"))
        .cast("bigint")
        .alias("ratio_e4"),
    )
