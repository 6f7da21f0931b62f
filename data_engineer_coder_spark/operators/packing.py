"""Training-data assembly: sequence packing, chunking, token budgeting.

The last mile of an LLM data pipeline turns scored, deduplicated
documents into fixed-shape training sequences.  Three operations
dominate that stage at 100 TB:

- **concat-and-chunk packing** (``sequence_packing``): stream documents
  in a deterministic order, concatenate, and cut every ``_PACK_BUDGET``
  tokens.  The industry-standard packing used by GPT/LLaMA-style
  pretraining — no bin-packing search, one pass, and the window
  assignment is a pure function of the running token sum, so it is
  reproducible across engines and re-runs.
- **strided chunking** (``chunk_long_docs``): split long documents into
  overlapping windows (width ``_CHUNK_W``, stride ``_CHUNK_S``) — the
  long-context variant where document boundaries must be respected.
- **token-budget selection** (``token_budget_sample``): per-source
  greedy knapsack — take the highest-quality documents until the
  source's token budget is exhausted.  The "data mix" step that turns
  quality scores into an actual corpus.
- **temperature weighting** (``domain_temperature_weights``): the
  multinomial-mix weights w_s ∝ tokens_s^0.5 (XLM-R / mT5 style
  temperature sampling at alpha = 0.5).

Scale notes: every op here is a window function partitioned by
``source`` plus a hash aggregate — no joins, no driver loops.  At 100 TB
a single giant source would make its packing window one straggler task;
production would salt the partition key into ``(source, shard)`` with a
content-hash shard and pack shards independently (the window ids stay
deterministic because the shard is content-derived, exactly like
``deterministic_sample``'s md5 gate).  The per-source form here keeps
the oracle readable; the salting pattern is proven separately by
``skew_salted_agg``.

All arithmetic is integer (token counts, running sums, floor division)
— bit-identical across Spark and DuckDB by construction.  The only
doubles are ``quality`` (already proven hash-stable by
``quality_score``) used as a sort key, and one IEEE-correctly-rounded
``sqrt`` on an exact bigint.

The reference (a ~300-line pandas ETL, /root/reference/dags/
my_data_pipeline.py) has no packing stage; this module is part of the
mandated LLM-pipeline extension surface (SURVEY.md §2 L-block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from .textops import _QUALITY_SQL_CTE, with_quality

# Context-window token budget for concat-and-chunk packing.  Real
# pipelines use 2k-8k; 512 keeps the tiny fixtures producing multiple
# windows per source at every SF.
_PACK_BUDGET = 512

# Strided-chunking geometry: width 32, stride 24 (25% overlap).
_CHUNK_W = 32
_CHUNK_S = 24

# Per-source token budget for the greedy quality knapsack.
_SRC_TOKEN_BUDGET = 600


def _with_tokens(docs: DataFrame) -> DataFrame:
    """Attach the whitespace token count (the engine's canonical
    tokenizer proxy, same LEN(string_split(...)) the oracles use)."""
    return docs.withColumn("n_tok", F.size(F.split("text", " ")).cast("bigint"))


# Shared with streaming_sequence_packing (streaming/stateful.py): the
# stateful stream twin produces the identical manifest, so it reuses
# this oracle verbatim — a fully hash-checked streaming query.
PACKING_ORACLE_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), r AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start_tok
  FROM t
), w AS (
  SELECT source, CAST(FLOOR(start_tok / {_PACK_BUDGET}) AS BIGINT) AS window_id,
         doc_id, n_tok
  FROM r
)
SELECT source, window_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS window_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM w GROUP BY source, window_id
"""


@register(
    "sequence_packing",
    oracle=PACKING_ORACLE_SQL,
    tags=("packing", "llm", "window"),
    doc=(
        "Concat-and-chunk sequence packing: deterministic per-source doc "
        "order, running token sum, window = floor(start/512).  One window "
        "function + one hash agg; no joins."
    ),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to its pretraining context window.

    A document belongs to the window in which its FIRST token lands
    (documents spanning a boundary are attributed to the window they
    start in — the accounting convention that keeps window assignment a
    pure prefix-sum function).  The report aggregates per window so the
    output is a compact packing manifest, not a row per document.
    """
    docs = _with_tokens(table(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = docs.withColumn("start_tok", F.sum("n_tok").over(w) - F.col("n_tok"))
    # floor() on BOTH sides: DuckDB CAST(double AS BIGINT) rounds while
    # Spark's cast truncates — an explicit floor removes the divergence.
    win = r.withColumn(
        "window_id", F.floor(F.col("start_tok") / _PACK_BUDGET).cast("bigint")
    )
    return win.groupBy("source", "window_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("window_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "chunk_long_docs",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok, CAST(i AS BIGINT) AS chunk_id,
         CAST(i * {_CHUNK_S} AS BIGINT) AS start_tok,
         LEAST(CAST(i * {_CHUNK_S} + {_CHUNK_W} AS BIGINT), n_tok) AS end_tok
  FROM t CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
  WHERE i * {_CHUNK_S} < n_tok
)
SELECT doc_id, chunk_id, start_tok, end_tok,
       end_tok - start_tok AS chunk_len
FROM c
""",
    tags=("packing", "llm", "chunking"),
    doc=(
        "Strided chunking (width 32, stride 24): one row per overlapping "
        "window of each document.  Pure per-row explode — embarrassingly "
        "parallel, no shuffle."
    ),
)
def chunk_long_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token windows.

    The chunk index sequence is generated per-row (``sequence`` +
    ``explode``) — no join, no shuffle; output size is input tokens /
    stride.  The oracle mirrors it with a bounded ``range(0, 64)``
    cross join (fixture docs are < 64 * 24 tokens; the Spark side
    computes the exact count so it has no such bound).
    """
    docs = _with_tokens(table(spark, sf_dir, "documents").select("doc_id", "text"))
    n_chunks = (
        F.floor((F.col("n_tok") - 1) / _CHUNK_S) + 1
    )  # chunks whose start (i * S) is < n_tok
    c = docs.select(
        "doc_id",
        "n_tok",
        F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias("chunk_id"),
    )
    start = (F.col("chunk_id") * _CHUNK_S).cast("bigint")
    end = F.least(start + _CHUNK_W, F.col("n_tok"))
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.alias("start_tok"),
        end.alias("end_tok"),
        (end - start).alias("chunk_len"),
    )


@register(
    "token_budget_sample",
    oracle=f"""
WITH {_QUALITY_SQL_CTE},
r AS (
  SELECT source, doc_id, n_tokens, quality,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM q
)
SELECT source,
       COUNT(*) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       ROUND(MIN(quality), 6) AS min_kept_quality
FROM r WHERE cum_tok <= {_SRC_TOKEN_BUDGET}
GROUP BY source
""",
    tags=("packing", "llm", "sampling"),
    doc=(
        "Greedy per-source token-budget selection: highest-quality docs "
        "first until 600 tokens/source.  The data-mix step between scoring "
        "and tokenization."
    ),
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the best documents per source within a token budget.

    Sort key is (quality DESC, doc_id) — quality doubles are
    bit-identical across engines (proven by ``quality_score``'s hash
    match), and doc_id breaks ties totally, so the running sum and the
    budget cut agree exactly.  The budget test is on exact bigint
    cumulative tokens; no float boundary exists.
    """
    docs = with_quality(table(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = docs.withColumn("cum_tok", F.sum("n_tokens").over(w))
    return (
        r.filter(F.col("cum_tok") <= _SRC_TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
            F.round(F.min("quality"), 6).alias("min_kept_quality"),
        )
    )


@register(
    "domain_temperature_weights",
    oracle="""
WITH t AS (
  SELECT source,
         CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS tokens,
         COUNT(*) AS n_docs
  FROM documents GROUP BY source
), g AS (
  SELECT *, CAST(SUM(tokens) OVER () AS BIGINT) AS total_tokens FROM t
)
SELECT source, n_docs, tokens,
       CAST(FLOOR(tokens * 10000 / total_tokens) AS BIGINT) AS share_e4,
       CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT)
         AS temp_weight_e6
FROM g
""",
    tags=("packing", "llm", "mix"),
    doc=(
        "Temperature-sampling mix weights: w_s ∝ tokens_s^0.5 (alpha=0.5, "
        "XLM-R style), emitted as exact integers (share in 1e-4 units, "
        "weight in 1e-6 units)."
    ),
)
def domain_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token accounting + temperature-sampling weight.

    ``sqrt`` on an exact bigint is IEEE-754 correctly rounded in both
    engines, so ``floor(sqrt(t) * 1e6)`` is deterministic; the token
    share uses exact integer math under an explicit floor.  The global
    total is attached via the repo's broadcast-scalar idiom (one-row
    aggregate, broadcast cross join) — no single-partition window.
    """
    docs = _with_tokens(table(spark, sf_dir, "documents").select("source", "text"))
    t = docs.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("tokens"),
        F.count("*").alias("n_docs"),
    )
    tot = t.agg(F.sum("tokens").cast("bigint").alias("total_tokens"))
    g = t.crossJoin(F.broadcast(tot))
    return g.select(
        "source",
        "n_docs",
        "tokens",
        F.floor(F.col("tokens") * 10000 / F.col("total_tokens"))
        .cast("bigint")
        .alias("share_e4"),
        F.floor(F.sqrt(F.col("tokens").cast("double")) * 1000000)
        .cast("bigint")
        .alias("temp_weight_e6"),
    )


@register(
    "packing_fill_histogram",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), r AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start_tok
  FROM t
), w AS (
  SELECT source, CAST(FLOOR(start_tok / {_PACK_BUDGET}) AS BIGINT) AS window_id,
         n_tok
  FROM r
), win AS (
  SELECT source, window_id, CAST(SUM(n_tok) AS BIGINT) AS window_tokens
  FROM w GROUP BY source, window_id
), deciles AS (
  SELECT LEAST(CAST(FLOOR(window_tokens * 10 / {_PACK_BUDGET}) AS BIGINT), 10)
           AS fill_decile
  FROM win
)
SELECT fill_decile, COUNT(*) AS n_windows
FROM deciles GROUP BY fill_decile
""",
    tags=("packing", "llm", "audit"),
    doc=(
        "Packing QA: histogram of window fill rates in budget deciles "
        "(decile 10 = window at/over budget — the attribution convention "
        "puts a boundary-spanning doc's tokens in its start window).  A "
        "fat low-decile tail means the doc stream needs shuffling or the "
        "budget is mis-sized."
    ),
)
def packing_fill_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of how full the packed context windows are.

    Derives from the same prefix-sum manifest as ``sequence_packing``
    (shared convention: a document counts toward the window its first
    token lands in, so the final window of each source can exceed the
    budget by less than one document).  Pure integer math end to end.
    """
    win = sequence_packing(spark, sf_dir).select("window_tokens")
    decile = F.least(
        F.floor(F.col("window_tokens") * 10 / _PACK_BUDGET).cast("bigint"), F.lit(10)
    )
    return (
        win.select(decile.alias("fill_decile"))
        .groupBy("fill_decile")
        .agg(F.count("*").alias("n_windows"))
    )


@register(
    "packing_boundary_docs",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), r AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start_tok
  FROM t
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(CASE WHEN CAST(FLOOR(start_tok / {_PACK_BUDGET}) AS BIGINT)
                     <> CAST(FLOOR((start_tok + n_tok - 1) / {_PACK_BUDGET}) AS BIGINT)
                  THEN 1 END) AS n_boundary_docs,
       CAST(FLOOR(10000.0 * COUNT(CASE WHEN CAST(FLOOR(start_tok / {_PACK_BUDGET}) AS BIGINT)
                     <> CAST(FLOOR((start_tok + n_tok - 1) / {_PACK_BUDGET}) AS BIGINT)
                  THEN 1 END) / COUNT(*)) AS BIGINT) AS boundary_rate_e4
FROM r GROUP BY source
""",
    tags=("packing", "llm", "audit"),
    doc=(
        "Packing QA: documents whose tokens straddle a context-window "
        "boundary (their attention span gets cut in training).  High "
        "rates mean the budget is small relative to doc length and "
        "document-aware packing is worth its cost."
    ),
)
def packing_boundary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count documents split by a window boundary, per source.

    A doc starting at ``start`` with ``n`` tokens straddles iff its
    first and last token land in different windows — pure integer math
    off the same prefix sums as ``sequence_packing``.
    """
    docs = _with_tokens(table(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = docs.withColumn("start_tok", F.sum("n_tok").over(w) - F.col("n_tok"))
    first_w = F.floor(F.col("start_tok") / _PACK_BUDGET).cast("bigint")
    last_w = F.floor((F.col("start_tok") + F.col("n_tok") - 1) / _PACK_BUDGET).cast(
        "bigint"
    )
    straddle = F.count(F.when(first_w != last_w, F.lit(1)))
    return r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        straddle.alias("n_boundary_docs"),
        F.floor(10000.0 * straddle / F.count("*"))
        .cast("bigint")
        .alias("boundary_rate_e4"),
    )


# --------------------------------------------------------------------------
# Mix allocation under a token budget — UniMax (Chung et al. 2023,
# arXiv:2304.09151): give every source as uniform a share as possible,
# capped at E epochs of its own data; the budget freed by capped (small)
# sources waterfills into the rest.  Closed form, no iteration: sort
# sources ascending by cap, take caps while cap_i ≤ θ_i =
# ⌊(B − Σ smaller caps) / #remaining⌋ (θ is non-decreasing along that
# prefix, so the first violation is THE water level), then every
# remaining source gets θ at the switch point.  All integer math over
# the ~|sources| aggregate — the windows run on rows-per-source, never
# corpus rows.
# --------------------------------------------------------------------------

_UNIMAX_EPOCHS = 1  # per-source cap = E × its tokens
# budget = ⌊0.8 × corpus tokens⌋ — under Σcaps, so the waterfill engages


@register(
    "unimax_allocation",
    oracle="""
WITH t AS (
  SELECT source, CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
g AS (
  SELECT source, tokens, tokens AS cap,
         CAST(FLOOR(SUM(tokens) OVER () * 8 / 10) AS BIGINT) AS b,
         ROW_NUMBER() OVER (ORDER BY tokens, source) AS rn,
         COUNT(*) OVER () AS n,
         CAST(COALESCE(SUM(tokens) OVER (ORDER BY tokens, source
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prefix
  FROM t
),
th AS (
  SELECT *, CAST(FLOOR(GREATEST(b - prefix, 0) / (n - rn + 1.0)) AS BIGINT) AS theta
  FROM g
),
sw AS (
  SELECT MIN(rn) AS srn, arg_min(theta, rn) AS stheta FROM th WHERE cap > theta
)
SELECT source, tokens,
       CASE WHEN rn < srn THEN cap ELSE stheta END AS allocation,
       CAST(FLOOR(CASE WHEN rn < srn THEN cap ELSE stheta END * 10000.0 / tokens)
            AS BIGINT) AS epochs_e4
FROM th CROSS JOIN sw
""",
    tags=("packing", "llm", "mix"),
    doc=(
        "UniMax mix allocation: uniform token budget waterfill capped at "
        f"{_UNIMAX_EPOCHS} epoch(s) per source (closed-form water level, "
        "exact integers; budget = 0.8 of corpus tokens)."
    ),
)
def unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_tokens(table(spark, sf_dir, "documents").select("source", "text"))
    t = docs.groupBy("source").agg(F.sum("n_tok").cast("bigint").alias("tokens"))
    cap = (F.col("tokens") * _UNIMAX_EPOCHS).alias("cap")
    # windows over the per-source aggregate (~|sources| rows — tiny)
    w = Window.orderBy("tokens", "source")
    g = t.select(
        "source",
        "tokens",
        cap,
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.coalesce(
            F.sum("tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("prefix"),
        F.floor(
            F.sum("tokens").over(Window.partitionBy()) * 8 / 10
        )
        .cast("bigint")
        .alias("b"),
    )
    th = g.withColumn(
        "theta",
        F.floor(
            F.greatest(F.col("b") - F.col("prefix"), F.lit(0))
            / (F.col("n") - F.col("rn") + 1.0)
        ).cast("bigint"),
    )
    sw = (
        th.filter(F.col("cap") > F.col("theta"))
        .agg(F.min("rn").alias("srn"), F.min_by("theta", "rn").alias("stheta"))
    )
    alloc = F.when(F.col("rn") < F.col("srn"), F.col("cap")).otherwise(F.col("stheta"))
    return (
        th.crossJoin(F.broadcast(sw))
        .select(
            "source",
            "tokens",
            alloc.alias("allocation"),
            F.floor(alloc * 10000.0 / F.col("tokens")).cast("bigint").alias("epochs_e4"),
        )
    )
