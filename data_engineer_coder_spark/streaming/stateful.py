"""Arbitrary stateful processing T7 + grouped-map UDFs D3 (SURVEY.md
§2.9–2.10).

Batch twin: ``applyInPandas`` per user computes session statistics in
pandas (Arrow-batched, one group per call).  Streaming twin:
``applyInPandasWithState`` keeps per-user running state across
micro-batches — the generalization of the reference's per-run
accumulation (each Airflow run re-derives everything from scratch;
state makes it incremental).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..io.tables import table
from ..registry import register
from ..operators._helpers import shuffle_parts

_USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_gap_us", T.LongType()),
        T.StructField("n_sessions_30m", T.LongType()),
    ]
)


def _user_stats_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user session statistics computed in pandas (one group).

    Receives ``ts_us`` (bigint microseconds), not a timestamp: converting
    JVM-side keeps the Arrow hop primitive — a timestamp column costs an
    extra ~25% of the whole grouped-map at sf0.1 (profiled r5), and the
    integer gap math is exactly what the op needs anyway.
    """
    pdf = pdf.sort_values(["ts_us", "event_id"])
    gaps_us = pdf["ts_us"].diff().dropna().astype("int64")
    n_sessions = int((gaps_us > 30 * 60 * 1_000_000).sum()) + 1
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "max_gap_us": [int(gaps_us.max()) if len(gaps_us) else 0],
            "n_sessions_30m": [n_sessions],
        }
    )


@register(
    "user_session_stats",
    oracle="""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS gap_us
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       COALESCE(MAX(gap_us), 0) AS max_gap_us,
       1 + COUNT(CASE WHEN gap_us > 30 * 60 * 1000000 THEN 1 END) AS n_sessions_30m
FROM g
GROUP BY user_id
""",
    tags=("streaming", "stateful", "pandas-udf"),
    doc="T7/D3 batch twin: per-user session stats via applyInPandas (Arrow grouped-map).",
)
def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    # Explicit hash repartition: AQE otherwise coalesces the small shuffle
    # to ONE partition and every pandas group call serializes through a
    # single Python worker (measured 4.2s → 0.65s at sf0.1).  The grouped
    # map reuses this partitioning — no second exchange.
    ev = ev.repartition(shuffle_parts(ev), F.col("user_id"))
    return ev.groupBy("user_id").applyInPandas(_user_stats_pandas, _USER_STATS_SCHEMA)


# --------------------------------------------------------------------------
# Streaming T7: running per-user counters with GroupState.
# --------------------------------------------------------------------------

_STATE_SCHEMA = T.StructType(
    [T.StructField("n_events", T.LongType()), T.StructField("sum_value", T.DoubleType())]
)
_STATE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_user_state(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate event count + value sum per user across micro-batches."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def streaming_user_counters(ev_stream: DataFrame) -> DataFrame:
    """T7: applyInPandasWithState over a streaming events DataFrame."""
    return (
        ev_stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=_STATE_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@register(
    "streaming_user_counters",
    oracle=None,  # update-mode stateful output; checked by batch-equivalence in tests
    tags=("streaming", "stateful", "real-stream"),
    doc="T7 real stream: per-user running counters via applyInPandasWithState.",
)
def streaming_user_counters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .core import run_to_memory, stream_events

    return run_to_memory(
        streaming_user_counters(stream_events(spark, sf_dir)), "update", shuffle_partitions=8
    )


# --------------------------------------------------------------------------
# Streaming T7 (Spark 4 API): the same per-user counters via
# transformWithStateInPandas — the successor to applyInPandasWithState:
# named, independently-evolvable state variables (value/list/map) on a
# StatefulProcessorHandle, explicit timers, and initial-state bootstrap.
# ENVIRONMENT GATE: the Spark-internal state-server protocol for this
# API needs `google.protobuf` on the PYTHONPATH, which this container
# lacks (and installs are out of scope) — so the operator is a library
# surface with an import-gated test (tests/test_streaming.py), NOT a
# registered query: registering it would hard-crash the driver gate on
# any host without protobuf.  `tws_available()` is the gate.
# --------------------------------------------------------------------------


def tws_available() -> bool:
    """True iff transformWithStateInPandas can actually run here (its
    driver worker imports protobuf-generated state-protocol messages)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    return True


def _make_user_counter_processor():
    """StatefulProcessor: running (n_events, sum_value) per user.  The
    ABC import stays inside the factory so batch-only use of this
    module never touches the streaming processor machinery."""
    from pyspark.sql.streaming import StatefulProcessor

    class P(StatefulProcessor):
        def init(self, handle) -> None:
            self._counters = handle.getValueState("counters", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s = (
                self._counters.get() if self._counters.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._counters.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return P()


def streaming_user_counters_tws(ev_stream: DataFrame) -> DataFrame:
    """T7 via the Spark 4 transformWithState API (value state, no timers)."""
    return (
        ev_stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_user_counter_processor(),
            outputStructType=_STATE_OUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


def streaming_user_counters_tws_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runner for the transformWithState counters (not registry-exposed;
    see the ENVIRONMENT GATE note above — call only when
    ``tws_available()``)."""
    from .core import run_to_memory, stream_events

    return run_to_memory(
        streaming_user_counters_tws(stream_events(spark, sf_dir)),
        "update",
        shuffle_partitions=8,
    )


# --------------------------------------------------------------------------
# Streaming T7b: incremental sequence packing — the production shape of
# the batch packer in operators/packing.py: corpora arrive as a stream,
# and each source's packing cursor (its running token count) is per-key
# GroupState carried across micro-batches.  Within a batch the group
# sorts by doc_id, so with the fixture's single-file single-batch
# delivery the manifest is IDENTICAL to the batch prefix-sum — the
# registry entry therefore reuses the batch oracle and gets a full
# value-hash check on a stateful streaming query (most stateful ops can
# only manage rows-only).  Across real multi-batch streams the cursor
# semantics are exactly what production wants: windows pack in ingest
# order, history is never re-sorted.
# --------------------------------------------------------------------------

from ..operators.packing import _PACK_BUDGET  # single source of the budget

_PACK_STATE_SCHEMA = T.StructType([T.StructField("cum_tokens", T.LongType())])
_PACK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_id", T.LongType()),
        T.StructField("n_tok", T.LongType()),
    ]
)


def _pack_source_state(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Advance one source's packing cursor over its new documents.

    The iterator yields the group's batch rows in ARROW CHUNKS
    (split at spark.sql.execution.arrow.maxRecordsPerBatch) in
    arbitrary order — sorting per chunk would interleave doc_ids across
    chunk boundaries, so the whole micro-batch group is materialized
    and sorted ONCE.  Memory bound: one source's documents per
    micro-batch (the metadata columns only — ids and token counts, not
    text), the same bound any per-group stateful op carries.
    """
    cum = state.get[0] if state.exists else 0
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values("doc_id")
        csum = pdf["n_tok"].astype("int64").cumsum()
        start = cum + csum - pdf["n_tok"].astype("int64")
        out = pd.DataFrame(
            {
                "source": key[0],
                "doc_id": pdf["doc_id"].astype("int64"),
                "window_id": (start // _PACK_BUDGET).astype("int64"),
                "n_tok": pdf["n_tok"].astype("int64"),
            }
        )
        cum += int(csum.iloc[-1])
        yield out
    state.update((cum,))


def streaming_sequence_packing_stream(doc_stream: DataFrame) -> DataFrame:
    """T7: per-source packing cursor via applyInPandasWithState."""
    docs = doc_stream.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    return docs.groupBy("source").applyInPandasWithState(
        _pack_source_state,
        _PACK_OUT_SCHEMA,
        _PACK_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def _packing_oracle() -> str:
    from ..operators.packing import PACKING_ORACLE_SQL

    return PACKING_ORACLE_SQL


@register(
    "streaming_sequence_packing",
    oracle=_packing_oracle(),
    tags=("streaming", "stateful", "packing", "llm"),
    doc=(
        "T7: incremental concat-and-chunk packing — per-source token "
        "cursor in GroupState, availableNow replay of the documents "
        "table; manifest hash-matches the batch packer's oracle."
    ),
)
def streaming_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .core import run_to_memory, stream_documents

    out = streaming_sequence_packing_stream(stream_documents(spark, sf_dir))
    # ~20 sources → 8 state partitions (state-store fixed cost per
    # partition per micro-batch; see run_to_memory docstring).
    assigned = run_to_memory(out, "append", shuffle_partitions=8)
    return assigned.groupBy("source", "window_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("window_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
