"""Deterministic sampling + skew-mitigation aggregation patterns.

Training-data pipelines sample constantly (holdout splits, per-source
quotas, debug slices).  ``df.sample()`` is seed-dependent *per partition
layout*, so results change when the file split changes — useless for
reproducible 100 TB pipelines.  The engine's sampling is **content
hashed**: a row is in the sample iff ``md5(key)`` falls under a
threshold, so membership is a pure function of the data (stable under
repartitioning, re-runs, engine version, even engine *choice* — the
DuckDB oracle computes the identical sample).

``skew_salted_agg`` is the canonical two-stage salted aggregation: at
100 TB a single hot group key (bot traffic on one event_type) turns a
hash agg's final exchange into one straggler task.  Salting splits each
key into ``_SALTS`` subkeys for the partial aggregate, then merges the
partials — the hot key's work spreads over ``_SALTS`` tasks and the
second shuffle carries only ``keys × _SALTS`` rows.  (Spark's partial
map-side aggregation already does this when the hot key is spread over
many *input* partitions; explicit salting is the insurance for when it
is not — and the oracle proves the rewrite is semantics-preserving.)

The reference has no sampling or skew handling (it processes ≤96
rows/day, /root/reference/dags/my_data_pipeline.py:16,19,150).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from ._helpers import DEC, md5_bucket, shuffle_parts, sql_dsum
from .textops import _QUALITY_SQL_CTE, with_quality

_SALTS = 16

# md5 produces a uniform hex string; comparing its first 2 chars against a
# threshold yields rate = int(threshold, 16) / 256.  '20' → 32/256 = 12.5%.
_SAMPLE_THRESHOLD = "20"

# Stratified rates per event_type, as hex-prefix thresholds:
# purchase kept at ~50% ('80'=128/256), error at 100% ('zz' > any hex),
# everything else at ~6.25% ('10'=16/256).
_STRATA = {"purchase": "80", "error": "zz"}
_DEFAULT_STRATUM = "10"


@register(
    "deterministic_sample",
    oracle=f"""
WITH keyed AS (
  SELECT event_id, user_id, event_type, value,
         substring(md5(CAST(event_id AS VARCHAR)), 1, 2) AS hk
  FROM events
)
SELECT event_id, user_id, event_type, value
FROM keyed
WHERE hk < '{_SAMPLE_THRESHOLD}'
   OR hk < CASE event_type
             WHEN 'purchase' THEN '{_STRATA["purchase"]}'
             WHEN 'error' THEN '{_STRATA["error"]}'
             ELSE '{_DEFAULT_STRATUM}'
           END
""",
    tags=("sampling", "llm"),
    doc=(
        "Content-hash deterministic sample (12.5% uniform ∪ stratified "
        "per-type rates) — reproducible under repartitioning and across "
        "engines, unlike seed-based df.sample()."
    ),
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hk = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    stratum = (
        F.when(F.col("event_type") == "purchase", _STRATA["purchase"])
        .when(F.col("event_type") == "error", _STRATA["error"])
        .otherwise(_DEFAULT_STRATUM)
    )
    return ev.filter((hk < _SAMPLE_THRESHOLD) | (hk < stratum)).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "skew_salted_agg",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY event_type
""",
    tags=("agg", "skew"),
    doc=(
        "Two-stage salted aggregation (salt = hash(event_id) % 16): "
        "hot-key insurance at scale, provably identical to the direct "
        "group-by (the oracle IS the unsalted query)."
    ),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # Stage 1: partial aggregate on (key, salt).  The salt is derived from
    # a data column (not rand()) so the plan stays deterministic.
    partial = (
        ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALTS)))
        .groupBy("event_type", "_salt")
        # Keep the partial as exact DECIMAL — casting to double here would
        # reintroduce accumulation-order dependence in the merge.
        .agg(F.count("*").alias("_n"), F.sum(F.col("value").cast(DEC)).alias("_sv"))
    )
    # Stage 2: merge partials — only keys × _SALTS rows shuffle here; the
    # decimal re-sum is exact, so the result is bit-identical to the
    # direct single-stage aggregate the oracle runs.
    return partial.groupBy("event_type").agg(
        F.sum("_n").alias("n"),
        F.sum("_sv").cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# L6b: deterministic train/test split — the hash-bucket split every
# training pipeline needs to be reproducible across runs AND engines
# (no rand(): re-running on a re-shuffled 100 TB corpus must yield the
# SAME membership).  md5(doc_id) first byte < 0xE6 (230/256 ≈ 90%) →
# train.  Checked output is the per-(lang, split) contract: counts and
# char volume; the splits are disjoint and exhaustive by construction.
# --------------------------------------------------------------------------


@register(
    "train_test_split",
    oracle="""
WITH s AS (
  SELECT lang, n_chars,
         CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT < 230
              THEN 'train' ELSE 'test' END AS split
  FROM documents
)
SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY lang, split
""",
    tags=("sampling", "llm", "split"),
    doc="L6: reproducible ~90/10 train/test split via md5 hash bucket, per-lang accounting.",
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    bucket = md5_bucket("doc_id")
    s = docs.withColumn(
        "split", F.when(bucket < 230, F.lit("train")).otherwise(F.lit("test"))
    )
    return s.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# L6b: quality-weighted (importance) sampling — the training-mix step
# between scoring and tokenization: each document survives with
# probability equal to its quality score, via a deterministic
# content-hash acceptance test (md5 unit-interval draw < quality).
# Reproducible under repartitioning, re-runs, and engine swap — a
# seeded Bernoulli sample is none of those.  One map-side filter: no
# shuffle at any corpus size; the per-lang report is the audit surface.
# --------------------------------------------------------------------------


@register(
    "quality_weighted_sample",
    oracle=f"""
WITH {_QUALITY_SQL_CTE},
s AS (
  SELECT doc_id, lang, quality
  FROM q
  WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         / 4294967296.0) < quality
)
SELECT lang, COUNT(*) AS n_sampled,
       -- exact decimal sum: double SUM is accumulation-order-dependent and a
       -- last-ulp drift can flip the floored e4 bucket (ADVICE r4)
       CAST(FLOOR(SUM(CAST(quality AS DECIMAL(38,6))) * 10000) AS BIGINT)
         AS quality_mass_e4
FROM s GROUP BY lang
""",
    tags=("sampling", "llm", "quality"),
    doc=(
        "L6: importance sampling by quality score — P(keep) = quality, "
        "decided by md5(doc_id) unit draw (deterministic, shuffle-free); "
        "per-lang sampled counts + retained quality mass."
    ),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_quality(table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "quality"
    )
    unit = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    s = docs.filter(unit < F.col("quality"))
    return s.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        # exact decimal sum before scaling/flooring — see oracle comment
        F.floor(F.sum(F.col("quality").cast(DEC)) * 10000)
        .cast("bigint")
        .alias("quality_mass_e4"),
    )


# --------------------------------------------------------------------------
# L6c: stratified deterministic top-k sample — exactly k docs per
# (lang, source) stratum, selected by content-independent hash order
# (md5 of the id), so the carve-out is stable under repartitioning,
# re-runs, and engine swap.  This is the eval-holdout pattern: the
# quality_weighted_sample keeps a rate, this keeps a COUNT per cell.
# One shuffle (the per-stratum window); at 100 TB k rows per stratum
# bound both the state and the output.
# --------------------------------------------------------------------------

_STRAT_K = 5


@register(
    "stratified_topk_sample",
    oracle=f"""
SELECT lang, source, doc_id, rn
FROM (
  SELECT lang, source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= {_STRAT_K}
""",
    tags=("sampling", "llm", "stratified"),
    doc=(
        "L6: deterministic stratified sample — k=5 docs per (lang, source) "
        "cell by md5(doc_id) hash order (stable holdout carve-out)."
    ),
)
def stratified_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRAT_K)
        .select("lang", "source", "doc_id", "rn")
    )


# --------------------------------------------------------------------------
# L6b: deterministic global corpus shuffle — the data-loading order every
# pretraining run fixes up front (seeded, resumable, identical on every
# re-run and engine).  Each doc gets a shard (hash bucket) and a position
# within the shard (hash order): the loader streams shard files in
# position order and gets a reproducible global permutation without any
# global sort.  Scale shape: the only shuffle is the hash partition by
# shard; within-shard ordering is a per-shard external sort (spillable),
# and shard COUNT — not shard size — grows with the corpus, so no task
# ever sorts more than one shard.  Seed changes re-derive a fresh
# permutation from the same plan.
# --------------------------------------------------------------------------

_SHUFFLE_SEED = 7
_SHUFFLE_SHARDS = 64


@register(
    "corpus_shuffle_order",
    oracle=f"""
SELECT doc_id, shard, CAST(pos AS BIGINT) AS pos
FROM (
  SELECT doc_id, shard,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
  FROM (
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR) || ':{_SHUFFLE_SEED}') AS k,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{_SHUFFLE_SEED}'), 1, 8))::BIGINT
             % {_SHUFFLE_SHARDS} AS shard
    FROM documents
  )
)
""",
    tags=("sampling", "llm", "assembly"),
    doc=(
        "L6: seeded deterministic global shuffle — shard = md5(doc_id:seed) "
        f"bucket (of {_SHUFFLE_SHARDS}), pos = hash order within shard.  "
        "Reproducible data-loading permutation; one hash shuffle, "
        "per-shard sorts, no global sort."
    ),
)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("doc_id")
    k = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{_SHUFFLE_SEED}")))
    shard = F.pmod(
        F.conv(F.substring(k, 1, 8), 16, 10).cast("bigint"), F.lit(_SHUFFLE_SHARDS)
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return (
        docs.select("doc_id", k.alias("k"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


# --------------------------------------------------------------------------
# L6c: DSIR-style importance weighting (Xie et al. 2023,
# arXiv:2302.03169): score each corpus doc by how target-like its
# unigram distribution is — log w(x) = Σ_tokens [ln p_target(tok) −
# ln p_raw(tok)] under Laplace-smoothed hashed-unigram LMs — then select
# docs whose per-token log-weight is positive (more target-like than
# corpus average).  The two LMs are COUNT TABLES (vocab-sized, broadcast)
# built in one pass each; scoring is a broadcast join + integer-grid sum,
# so the whole selection is two map-side aggregates + one broadcast join
# at any corpus size.  Per-term logs are floored to a 1e-9 grid (the
# unigram_logprob_score pattern) so per-doc sums are exact integers —
# order-independent and engine-portable; selection thresholds on the
# integer sum's SIGN, so no float boundary decides membership.
# --------------------------------------------------------------------------

_DSIR_TARGET = "src0"  # target-domain proxy: one source's docs


@register(
    "dsir_importance_weights",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tgt_tok AS (
  SELECT unnest(string_split(d.text, ' ')) AS term
  FROM documents d WHERE d.source = '{_DSIR_TARGET}'
),
tf_r AS (SELECT term, COUNT(*) AS cr FROM tok GROUP BY 1),
tf_t AS (SELECT term, COUNT(*) AS ct FROM tgt_tok GROUP BY 1),
tot AS (
  SELECT (SELECT COUNT(*) FROM tok) AS nr,
         (SELECT COUNT(*) FROM tgt_tok) AS nt,
         (SELECT COUNT(*) FROM tf_r) AS v
),
lm AS (
  SELECT r.term,
         FLOOR(LN(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / (tot.nt + tot.v)) * 1e9)
           - FLOOR(LN(CAST(r.cr + 1 AS DOUBLE) / (tot.nr + tot.v)) * 1e9) AS dq
  FROM tf_r r LEFT JOIN tf_t t ON r.term = t.term, tot
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       FLOOR(SUM(dq) / (COUNT(*) * 1000.0) + 0.5) / 1e6 AS logweight_per_token,
       SUM(dq) > 0 AS selected
FROM tok JOIN lm USING (term)
GROUP BY doc_id
""",
    tags=("sampling", "llm", "text"),
    doc=(
        "L6: DSIR importance weights — per-doc Σ[ln p_target − ln p_raw] "
        "over Laplace-smoothed unigram LMs (target = one source's docs), "
        "1e-9 integer grid, selection on the exact integer sum's sign."
    ),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )
    tf_r = tok.groupBy("term").agg(F.count("*").alias("cr"))
    tf_t = (
        tok.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("term")
        .agg(F.count("*").alias("ct"))
    )
    tot = (
        tok.agg(F.count("*").alias("nr"))
        .crossJoin(tok.filter(F.col("source") == _DSIR_TARGET).agg(F.count("*").alias("nt")))
        .crossJoin(tf_r.agg(F.count("*").alias("v")))
    )
    dq = (
        F.floor(
            F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double") / (F.col("nt") + F.col("v")))
            * 1e9
        )
        - F.floor(F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + F.col("v"))) * 1e9)
    ).cast("bigint")
    lm = (
        tf_r.join(tf_t, "term", "left")
        .crossJoin(F.broadcast(tot))
        .select("term", dq.alias("dq"))
    )
    # Per-token mean rounded to 6dp WITHOUT either engine's ROUND(double)
    # — those are different library functions and can disagree at a
    # half-way boundary (ADVICE r6).  Instead: exact bigint sum → one
    # correctly-rounded IEEE division → +0.5 → FLOOR → /1e6.  Every op
    # is a deterministic IEEE primitive with identical semantics in
    # Spark and DuckDB, so the emitted double is bit-identical.
    micro = F.floor(F.sum("dq") / (F.count("*") * 1000.0) + 0.5)
    return (
        tok.join(F.broadcast(lm), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (micro / 1e6).alias("logweight_per_token"),
            (F.sum("dq") > 0).alias("selected"),
        )
    )


# --------------------------------------------------------------------------
# L6e (round 8): WEIGHTED reservoir sampling without replacement
# (Efraimidis–Spirakis A-Res): each item draws u ∈ (0, 1] and ranks by
# u^(1/w); the top-k per group is a w-weighted sample.  One pass, no
# global sort, mergeable (take the per-partition top-k, then re-take) —
# the one-scan way to draw "sample ∝ length" from a 100 TB corpus.
# Portability: raw pow/ln keys are libm-dependent, so the rank key is
# rebuilt on the repo's integer grid — u from md5 (+1 so u > 0),
# a = FLOOR(ln(u)·1e9) (the proven ln-grid), and the A-Res order
# u^(1/w) ≡ ln(u)/w realized as CAST(a AS DOUBLE)/w — a single IEEE
# division of exact integers, which IS correctly rounded and therefore
# bit-identical in both engines (pow is not).
# --------------------------------------------------------------------------

_ARES_K = 10


@register(
    "weighted_reservoir_sample",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, GREATEST(n_chars, 1) AS w,
         FLOOR(LN((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                  / 4294967296.0) * 1e9) AS a
  FROM documents
),
r AS (
  SELECT source, doc_id, w,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(a AS DOUBLE) / w DESC, doc_id
         ) AS rn
  FROM d
)
SELECT source, rn, doc_id, w AS weight FROM r WHERE rn <= {_ARES_K}
""",
    tags=("sampling", "llm"),
    doc=(
        "L6: Efraimidis–Spirakis A-Res weighted reservoir — top-10 per "
        "source by ln(u)/w on the integer ln-grid (u from md5, w = doc "
        "length); a one-pass mergeable weighted sample."
    ),
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.greatest(F.col("n_chars"), F.lit(1)).alias("w")
    )
    unit = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        + 1
    ) / F.lit(4294967296.0)
    keyed = docs.withColumn("a", F.floor(F.log(unit) * 1e9))
    w = Window.partitionBy("source").orderBy(
        (F.col("a").cast("double") / F.col("w")).desc(), F.asc("doc_id")
    )
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ARES_K)
        .select("source", "rn", "doc_id", F.col("w").alias("weight"))
    )


# --------------------------------------------------------------------------
# L6b (round 8): Pareto / skyline selection — the data-selection frontier:
# documents not DOMINATED in (length, char entropy), i.e. for every token
# budget, the highest-entropy docs available.  Skyline is a classic
# relational operator Spark has no primitive for; the textbook definition
# is the O(n²) NOT-EXISTS anti-join (exactly what the oracle runs).  The
# engine computes it in O(n) + O(|distinct lengths|): one hash agg to the
# per-length entropy maximum (the frame is DOMAIN-bounded — doc length,
# ≤ a few thousand distinct values at any corpus size — so the frontier
# window runs on a broadcast-scale frame, never the corpus), a strict
# prefix-max window over that tiny frame, and one broadcast join back.
# --------------------------------------------------------------------------


@register(
    "pareto_frontier_docs",
    oracle="""
WITH base AS (
  SELECT doc_id, string_split(text, '') AS cs, string_split(text, ' ') AS ws
  FROM documents WHERE LENGTH(text) > 0
),
f AS (
  SELECT doc_id,
         CAST(LEN(ws) AS BIGINT) AS n_tokens,
         CAST(FLOOR(-CAST(list_sum(list_transform(
                list_transform(list_distinct(cs),
                               u -> CAST(LEN(list_filter(cs, c -> c = u)) AS BIGINT)),
                k -> k * CAST(FLOOR(ln(CAST(k AS DOUBLE) / LEN(cs)) * 1e9) AS BIGINT)))
              AS BIGINT) / (LEN(cs) * 1000.0) + 0.5) AS BIGINT) AS ce_micro
  FROM base
)
SELECT doc_id, n_tokens, ce_micro
FROM f a
WHERE NOT EXISTS (
  SELECT 1 FROM f b
  WHERE b.n_tokens >= a.n_tokens AND b.ce_micro >= a.ce_micro
    AND (b.n_tokens > a.n_tokens OR b.ce_micro > a.ce_micro)
)
""",
    tags=("sampling", "llm", "quality"),
    doc=(
        "L6b: 2-D skyline (Pareto frontier) over (n_tokens, char "
        "entropy) — docs undominated in length × quality.  Engine: "
        "per-length max-entropy hash agg (domain-bounded frame) + "
        "strict prefix-max window + broadcast join-back; oracle: the "
        "textbook O(n²) NOT-EXISTS dominance anti-join."
    ),
)
def pareto_frontier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .textops import _entropy_micro

    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # single-file fixture: spread the interpreted entropy fold across
    # tasks before computing it (same pattern as the dedup family)
    docs = docs.repartition(shuffle_parts(docs), F.col("doc_id"))
    cs = F.split("text", "")
    ws = F.split("text", " ")
    feats = docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_tokens"),
        _entropy_micro(cs).alias("ce_micro"),
    )
    # two consumers (per-length agg + join-back) of an interpreted
    # higher-order fold — materialize once (the r8 rule, ARCHITECTURE.md)
    feats = feats.localCheckpoint(eager=False)
    gx = feats.groupBy("n_tokens").agg(F.max("ce_micro").alias("ymax"))
    # frame = distinct doc lengths only — domain-bounded, so the
    # unpartitioned window is a deliberate bounded-scalar construct
    # (same class as the ≤K-row windows the plan audit sanctions)
    w = Window.orderBy(F.desc("n_tokens")).rangeBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        gx.withColumn("prev_max", F.max("ymax").over(w))
        .filter(F.col("ymax") > F.coalesce(F.col("prev_max"), F.lit(-1)))
        # rename: frontier descends from feats, so keeping the original
        # attribute would make the join-back an ambiguous self-join
        .select(F.col("n_tokens").alias("fx"), F.col("ymax").alias("fy"))
    )
    return (
        feats.join(
            F.broadcast(frontier),
            (F.col("n_tokens") == F.col("fx")) & (F.col("ce_micro") == F.col("fy")),
        )
        .select("doc_id", "n_tokens", "ce_micro")
    )
