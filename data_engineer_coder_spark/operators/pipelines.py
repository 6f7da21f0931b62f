"""End-to-end training-data preparation pipeline (north-star showcase).

The composition a 100 TB LLM-data run actually executes, as ONE lazy
plan: quality-filter → content-hash exact dedup → deterministic sample
→ per-language corpus stats.  Each stage is the registry operator it
reuses (`quality_score`, `dedup_hash_groups`, `deterministic_sample`)
— here chained so Catalyst fuses them: the quality expressions and the
sample predicate evaluate in the same scan stage, and the only
shuffles are the dedup window (hash key) and the final aggregate.

Mirrors the reference's fetch→transform→load composition
(``/root/reference/dags/my_data_pipeline.py:142-176``) with the
XCom/process seams replaced by one Catalyst plan (SURVEY.md §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import davg, sql_davg
from .textops import _QUALITY_SQL_CTE, with_quality

_SAMPLE_HEX = "80"  # keep ≈ 50% of deduped survivors


@register(
    "training_data_prep",
    oracle=f"""
WITH {_QUALITY_SQL_CTE},
kept AS (SELECT * FROM q WHERE keep),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
),
sampled AS (
  SELECT * FROM deduped
  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_SAMPLE_HEX}'
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       {sql_davg('quality')} AS avg_quality
FROM sampled
GROUP BY lang
""",
    tags=("pipeline", "llm", "text", "dedup", "sampling"),
    doc=(
        "End-to-end LLM-data prep in one lazy plan: quality filter → "
        "sha256 exact dedup (deterministic winner) → 50% content-hash "
        "sample → per-language corpus stats."
    ),
)
def training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    kept = with_quality(docs).filter(F.col("keep"))
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    sampled = deduped.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < _SAMPLE_HEX
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        davg("quality").alias("avg_quality"),
    )
