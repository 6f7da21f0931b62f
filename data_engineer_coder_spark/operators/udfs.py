"""UDF surface D1–D5 (SURVEY.md §2.10).

The reference's "UDFs" are driver-side Python functions
(``/root/reference/dags/my_data_pipeline.py:22-48,50-75,199-216``).
Engine rules: built-ins first; when Python is genuinely needed it is
Arrow-batched (pandas UDF / mapInPandas / UDTF) — never row-at-a-time.

These two queries exist to pin the *plumbing* (Arrow exchange, schema
contracts); their logic is deliberately re-expressible in SQL so the
oracle can check the full path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..io.tables import table
from ..registry import register
from ._helpers import shuffle_parts

# --------------------------------------------------------------------------
# D2: vectorized scalar pandas UDF — text normalization over Arrow batches.
# --------------------------------------------------------------------------


@pandas_udf(T.StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    return s.str.lower().str.replace(r"[^a-z0-9 ]", "", regex=True).str.strip()


@register(
    "pandas_udf_normalize",
    oracle="""
SELECT doc_id,
       TRIM(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g')) AS norm_text
FROM documents
WHERE doc_id < 100
""",
    tags=("udf", "pandas-udf", "text"),
    doc="D2: Arrow-batched scalar pandas UDF (text normalization), oracle-checked.",
)
def pandas_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select("doc_id", _normalize_text("text").alias("norm_text"))


# --------------------------------------------------------------------------
# D1: row-at-a-time Python UDF — exists to pin the surface; deliberately
# NOT used anywhere else (SURVEY §2.10: last resort; ~10-100× slower than
# the equivalent builtin/pandas UDF).
# --------------------------------------------------------------------------

_reverse_udf = F.udf(lambda s: s[::-1] if s is not None else None, T.StringType())


@register(
    "python_udf_reverse",
    oracle="""
SELECT p_partkey, reverse(p_name) AS name_rev
FROM part
WHERE p_partkey < 50
""",
    tags=("udf", "slow-path"),
    doc="D1: scalar Python UDF (the documented slow path; builtins preferred).",
)
def python_udf_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 50)
    return p.select("p_partkey", _reverse_udf("p_name").alias("name_rev"))


# --------------------------------------------------------------------------
# D4: grouped-aggregate pandas UDAF — one Arrow batch per group in, one
# scalar out.  Median sorts inside the UDF, so shuffle row order cannot
# leak into the result (and numpy/DuckDB interpolate identically).
# --------------------------------------------------------------------------


@pandas_udf(T.DoubleType())
def _median_udaf(v: pd.Series) -> float:
    import numpy as np

    return float(np.median(v.to_numpy(dtype="float64")))


@register(
    "pandas_udaf_median",
    oracle="""
SELECT event_type, median(value) AS median_value
FROM events
GROUP BY event_type
""",
    tags=("udf", "pandas-udf", "agg"),
    doc=(
        "D4: grouped-agg pandas UDAF (per-type median), oracle-checked. "
        "NB: Spark forbids mixing pandas UDAFs with JVM aggregates in one agg()."
    ),
)
def pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(_median_udaf("value").alias("median_value"))


# --------------------------------------------------------------------------
# D5: Python UDTF — 1→N row expansion (the explode-with-logic shape).
# --------------------------------------------------------------------------


@udtf(returnType="pos INT, token STRING, token_len INT", useArrow=True)
class _TokenizeUdtf:
    def eval(self, doc_id: int, text: str):  # noqa: D401
        for pos, tok in enumerate(text.split(" ")):
            if tok:
                yield pos, tok, len(tok)


@register(
    "udtf_tokenize",
    oracle="""
SELECT doc_id, u.pos, u.token, u.token_len
FROM (
  SELECT doc_id,
         list_transform(string_split(text, ' '), (w, i) ->
           struct_pack(pos := CAST(i - 1 AS INTEGER),
                       token := w,
                       token_len := CAST(LENGTH(w) AS INTEGER))) AS toks
  FROM documents
  WHERE doc_id < 50
), unnest(toks) AS t(u)
WHERE u.token <> ''
""",
    tags=("udf", "udtf", "text"),
    doc="D5: Python UDTF 1→N expansion (positional tokenizer), oracle-checked.",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.lateralJoin(
        _TokenizeUdtf(F.col("doc_id").outer(), F.col("text").outer())
    ).select("doc_id", "pos", "token", "token_len")


# --------------------------------------------------------------------------
# D6: cogrouped-map — ``cogroup(...).applyInPandas`` hands BOTH sides'
# rows for one key to a single pandas function (the Arrow twin of a
# sort-merge join's per-key bucket).  The right tool when per-key logic
# needs full frames from two inputs at once (custom as-of merges,
# per-entity reconciliation) and a plain join + agg can't express it.
# Here the logic is deliberately join-expressible so DuckDB can oracle
# the plumbing: per user, event count + total value vs account balance.
#
# Scale posture: both sides shuffle once on the key; each key's pair of
# pandas frames must fit one worker — the same contract as grouped-map.
# --------------------------------------------------------------------------


@register(
    "cogroup_reconcile",
    oracle="""
SELECT c.c_custkey AS user_id,
       COUNT(e.event_id) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
       MAX(c.c_acctbal) AS acctbal,
       COUNT(e.event_id) > 0 AND MAX(c.c_acctbal) < 0 AS active_but_negative
FROM customer c
LEFT JOIN events e ON e.user_id = c.c_custkey
WHERE c.c_custkey < 150
GROUP BY c.c_custkey
""",
    tags=("udf", "cogroup"),
    doc="D6: cogroup().applyInPandas per-key reconciliation of events vs customer.",
)
def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 150)
        .select(F.col("c_custkey").alias("user_id"), "c_acctbal")
    )

    def reconcile(events_pdf: pd.DataFrame, cust_pdf: pd.DataFrame) -> pd.DataFrame:
        if cust_pdf.empty:  # event users outside the customer slice
            return pd.DataFrame(
                columns=["user_id", "n_events", "total_value", "acctbal", "active_but_negative"]
            )
        uid = int(cust_pdf["user_id"].iloc[0])
        n = len(events_pdf)
        # exact decimal-cent sum (values are 2dp), cast back to float once
        total = float(int(events_pdf["value"].mul(100).round().sum())) / 100.0 if n else None
        bal = float(cust_pdf["c_acctbal"].max())
        return pd.DataFrame(
            [
                {
                    "user_id": uid,
                    "n_events": n,
                    "total_value": total,
                    "acctbal": bal,
                    "active_but_negative": bool(n > 0 and bal < 0),
                }
            ]
        )

    # Explicit pre-partitioning: AQE would otherwise coalesce the tiny
    # cogroup shuffle to one partition and serialize every key through a
    # single Python worker (see spark-engine gotchas).
    out_schema = (
        "user_id bigint, n_events bigint, total_value double, "
        "acctbal double, active_but_negative boolean"
    )
    return (
        ev.repartition(shuffle_parts(ev), "user_id")
        .groupBy("user_id")
        .cogroup(cust.repartition(shuffle_parts(cust), "user_id").groupBy("user_id"))
        .applyInPandas(reconcile, out_schema)
    )
