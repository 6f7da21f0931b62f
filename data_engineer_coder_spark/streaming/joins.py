"""Stream-stream joins (T-family extension, SURVEY.md §2.9).

The canonical attribution query: join each purchase event to the click
events by the same user in the preceding 30 minutes.  In Structured
Streaming this is a watermarked stream-stream inner join — both sides
buffer state, the event-time bound (``c.ts BETWEEN p.ts - 30m AND
p.ts``) plus the watermarks let Spark evict state as time advances,
which is what makes the join runnable forever at scale.

Batch-first like streaming/windows.py: ``attributed_purchases`` is a
pure DataFrame transformation; the registered query runs it over two
REAL ``readStream`` inputs through a memory sink and shares the batch
oracle (availableNow over a complete input ⇒ streaming == batch for an
inner join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import table
from ..operators._helpers import sql_dsum, ts_str
from ..registry import register
from .core import run_to_memory, stream_events

_GAP_MIN = 30


def attributed_purchases(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Inner join: purchases ⋈ same-user clicks in the preceding 30 min.

    Equi-key = user_id (the shuffle/state key); the range predicate on
    event time bounds the buffered state on both sides.
    """
    p = purchases.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {_GAP_MIN} MINUTES")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        ts_str("p_ts").alias("purchase_ts"),
        ts_str("c_ts").alias("click_ts"),
        "purchase_value",
    )


_SSJ_ORACLE = f"""
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       p.value AS purchase_value
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL {_GAP_MIN} MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


@register(
    "stream_stream_join",
    oracle=_SSJ_ORACLE,
    tags=("streaming", "join", "real-stream"),
    doc=(
        "T stream-stream: watermarked purchase⋈click attribution join over "
        "two real readStream inputs → memory sink; inner join over a "
        "complete availableNow input equals the batch join, so it shares "
        "the batch oracle."
    ),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    clicks = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    # 8 state partitions: the join keyspace (user_id ≈ 1.5k) is small and
    # every partition costs 4 state-store instances per micro-batch
    # (see run_to_memory docstring; 32 partitions measured 3× slower).
    return run_to_memory(attributed_purchases(purchases, clicks), "append", shuffle_partitions=8)


def attributed_purchases_outer(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """LEFT OUTER variant: every purchase survives — with its qualifying
    clicks when any exist, with null click columns otherwise.

    In Structured Streaming the null (unmatched) results for a purchase
    are emitted only once the watermark passes its event time (no
    earlier click can still arrive), so the outer side's completeness
    is watermark-gated — the registered query trims to that horizon.
    """
    p = purchases.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {_GAP_MIN} MINUTES")),
        "left_outer",
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        ts_str("p_ts").alias("purchase_ts"),
        ts_str("c_ts").alias("click_ts"),
        "purchase_value",
    )


# Outer-join oracle: the batch LEFT JOIN restricted to purchases at or
# below the stream's final watermark horizon.  Catalyst pushes each
# branch's event-type filter BELOW its EventTimeWatermark node, so each
# branch tracks max event time over its own type only and the query's
# final watermark is min(max purchase ts, max click ts) - 1h (measured:
# a late non-click/non-purchase event does NOT advance it).  The
# closing no-data batch emits null rows for purchases below that
# watermark; later purchases stay buffered when availableNow
# terminates.  Equivalence with the batch left join therefore holds on
# ts <= min(max_p, max_c) - 90min (1h watermark + 30min margin for the
# join-interval component of the eviction threshold) — we trim BOTH
# engines there.
_SSJ_OUTER_ORACLE = f"""
WITH mx AS (
  SELECT LEAST(
    (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
    (SELECT MAX(ts) FROM events WHERE event_type = 'click')
  ) AS m
),
p AS (
  SELECT event_id, user_id, ts, value FROM events, mx
  WHERE event_type = 'purchase' AND ts <= mx.m - INTERVAL 90 MINUTE
),
c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       p.value AS purchase_value
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL {_GAP_MIN} MINUTE
"""


@register(
    "stream_stream_left_outer_join",
    oracle=_SSJ_OUTER_ORACLE,
    tags=("streaming", "join", "real-stream"),
    doc=(
        "T stream-stream LEFT OUTER: purchases with no qualifying click "
        "survive with null click columns once the watermark closes; two "
        "real readStream inputs -> memory sink, trimmed to the final "
        "watermark horizon where streaming == the batch left join "
        "(shared oracle)."
    ),
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    clicks = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    out = run_to_memory(
        attributed_purchases_outer(purchases, clicks), "append", shuffle_partitions=8
    )
    horizon = _outer_horizon(spark, sf_dir)
    # purchase_ts is 'YYYY-MM-DD HH:MM:SS' — lexicographic == chronological
    return out.filter(F.col("purchase_ts") <= horizon)


def _outer_horizon(spark: SparkSession, sf_dir: str) -> str:
    """min(max purchase ts, max click ts) - 90 min, formatted — the
    point below which the streaming outer join is provably complete."""
    import datetime

    ev = table(spark, sf_dir, "events")
    m = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.min("m"))
        .first()[0]
    )
    return (m - datetime.timedelta(minutes=90)).strftime("%Y-%m-%d %H:%M:%S")


@register(
    "purchase_attribution_outer_batch",
    oracle=_SSJ_OUTER_ORACLE,
    tags=("streaming", "join"),
    doc=(
        "Batch twin of stream_stream_left_outer_join (same transformation "
        "and horizon trim, spark.read input)."
    ),
)
def purchase_attribution_outer_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return attributed_purchases_outer(ev, ev).filter(
        F.col("purchase_ts") <= _outer_horizon(spark, sf_dir)
    )


@register(
    "purchase_attribution_batch",
    oracle=_SSJ_ORACLE,
    tags=("streaming", "join"),
    doc="Batch twin of stream_stream_join (same transformation, spark.read input).",
)
def purchase_attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return attributed_purchases(ev, ev)


@register(
    "stream_join_conversion_rate",
    oracle=f"""
WITH attributed AS ({_SSJ_ORACLE})
SELECT user_id,
       COUNT(DISTINCT purchase_id) AS n_attributed_purchases,
       COUNT(*) AS n_click_pairs,
       {sql_dsum('purchase_value')} AS attributed_value
FROM attributed
GROUP BY user_id
""",
    tags=("streaming", "join", "agg"),
    doc="Aggregation over the attribution join: per-user attributed purchase totals.",
)
def stream_join_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators._helpers import DEC

    ev = table(spark, sf_dir, "events")
    return (
        attributed_purchases(ev, ev)
        .groupBy("user_id")
        .agg(
            F.countDistinct("purchase_id").alias("n_attributed_purchases"),
            F.count("*").alias("n_click_pairs"),
            F.sum(F.col("purchase_value").cast(DEC)).cast("double").alias("attributed_value"),
        )
    )


# --------------------------------------------------------------------------
# Stream-static enrichment: the third join kind Structured Streaming
# supports, and the most common in practice — enrich each micro-batch
# with a slowly-changing dimension.  No watermark and no join state: the
# static side is (re)planned per micro-batch, broadcast when small.
# --------------------------------------------------------------------------


@register(
    "stream_static_enrich",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
GROUP BY c_mktsegment
""",
    tags=("streaming", "join", "real-stream"),
    doc=(
        "T stream-static: purchases stream enriched with the customer "
        "dimension (broadcast static side, no join state), aggregated per "
        "market segment in complete mode; availableNow over the full "
        "input equals the batch join+agg, so it shares a batch oracle."
    ),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators._helpers import DEC

    ev = stream_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    dim = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )
    # Complete-mode aggregate over availableNow input == batch result;
    # 5-key keyspace → 4 state partitions.
    return run_to_memory(agg, "complete", shuffle_partitions=4)
