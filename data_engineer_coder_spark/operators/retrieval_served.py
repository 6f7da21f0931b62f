"""ANN-SERVED retrieval pools (round 12, VERDICT r11 #2): MMR and
hybrid-RRF candidate generation from the standing bucketed ANN index
instead of exact broadcast corpus scans.

The round-11 retrieval family's vector legs scan the whole corpus per
probe (``similarity.py::_rrf_fused``, ``mmr_diversified_topk``) —
corpus-linear per query.  The serving path a 100 TB corpus needs is the
one ``ann_index_bucket_probe`` proves: assign the corpus ONCE to a
hash-seeded IVF quantizer, lay the index out by cell bucket, and let a
probe read only its nprobe cells' buckets (manifest-pruned,
harness-audited).  Here that pool — exact cosine re-rank over the
probed cells' candidates, raw vectors stored per cell for the re-rank —
feeds the UNCHANGED downstream logic:

- ``mmr_diversified_topk_served`` — the shared greedy loop
  (``_mmr_greedy`` / ``_sql_mmr_steps``) over the ANN-served pool.
- ``hybrid_rrf_retrieval_served`` — RRF fusion of the ANN-served
  vector leg with the lexical leg read from the STANDING postings
  index (``streaming/bm25_ingest``), token-bucket-pruned.
- ``hybrid_served_recall_check`` — the quality gate: retention of the
  exact-scan hybrid top-5 by the served top-5, recall_e4 PINNED by the
  driver hash (either approximation drifting fails the gate).

Every query is FULLY oracle-replayed: the quantizer is hash-seeded and
trained on the deterministic ``vec_id % 10 = 0`` bootstrap slice, so a
probe's candidate pool is a pure function of the corpus — DuckDB
replays training, assignment, cell probing, pool ranking, the greedy /
fusion logic, and the final ranking exactly.

Scale shape: index build is the one-time corpus pass (its streamed
maintenance is ``stream_ann_index_ingest``); a served query reads
≤ nprobe cell buckets (vector leg) + its terms' token buckets (lexical
leg) — probe-local, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register
from .similarity import (
    _IVF_NPROBE,
    _MMR_K,
    _MMR_POOL,
    _MMR_PROBES,
    _RRF_K,
    _RRF_POOL,
    _RRF_PROBES,
    _SQL_DOT,
    _SQL_NORM,
    _SQL_QVEC,
    _cosine,
    _dot,
    _ivf_cents,
    _mmr_greedy,
    _qvec,
    _sql_ivf_cents,
    _sql_ivf_params,
    _sql_mmr_steps,
    _sql_two_level,
    _two_level_assign,
)

_CELL_BUCKETS = 16


def _sql_cos(a: str, b: str, na: str, nb: str) -> str:
    return (
        f"CAST({_SQL_DOT.format(a=a, b=b)} AS DOUBLE)"
        f" / (SQRT(CAST({na} AS DOUBLE)) * SQRT(CAST({nb} AS DOUBLE)))"
    )


def _sql_served_pool(
    src: str, probes: str, pid: str, pool: int, out: str = "cand"
) -> str:
    """CTE chain (nb → params/cents → asg → pcell → ``{out}``): the
    ANN-served candidate pool — bootstrap-trained quantizer, two-level
    assignment of the whole corpus, top-``_IVF_NPROBE`` cells per
    probe, exact cosine re-rank of the probed cells' members.
    ``{src}`` must expose (vec_id, qv, nrm), ``{probes}``
    ({pid}, pqv, pnrm)."""
    pcos = _sql_cos("p.pqv", "c.cqv", "p.pnrm", "c.cnrm")
    qcos = _sql_cos("p.pqv", "a.qv", "p.pnrm", "a.nrm")
    return f"""nb AS MATERIALIZED (SELECT * FROM {src} WHERE vec_id % 10 = 0),
{_sql_ivf_params('nb')},
{_sql_ivf_cents('nb')},
{_sql_two_level('cents', 'asg', src)},
pcell AS (
  SELECT {pid}, centroid_id FROM (
    SELECT p.{pid}, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.{pid} ORDER BY {pcos} DESC, c.centroid_id
           ) AS crn
    FROM {probes} p CROSS JOIN cents c
  ) WHERE crn <= {_IVF_NPROBE}
),
{out} AS MATERIALIZED (
  SELECT {pid}, vec_id, qv, nrm, qsim FROM (
    SELECT pc.{pid}, a.vec_id, a.qv, a.nrm, {qcos} AS qsim,
           ROW_NUMBER() OVER (
             PARTITION BY pc.{pid} ORDER BY {qcos} DESC, a.vec_id
           ) AS rn
    FROM pcell pc
    JOIN asg a ON a.centroid_id = pc.centroid_id AND a.vec_id <> pc.{pid}
    JOIN {probes} p ON p.{pid} = pc.{pid}
  ) WHERE rn <= {pool}
)"""


def _ann_candidate_pool(
    spark: SparkSession,
    nv: DataFrame,
    probes: DataFrame,
    pool: int,
    tmp: str,
) -> DataFrame:
    """Spark twin of :func:`_sql_served_pool`: build the standing
    bucketed index once (raw vectors per cell for exact re-rank), probe
    each query's top-``_IVF_NPROBE`` cells through the MANIFEST-PRUNED
    read (single-probe pruning audited), return the exact-re-ranked
    pool (probe_id, vec_id, qv, nrm, qsim), ≤ ``pool`` per probe."""
    import os

    from ..io.acid_table import current_manifest, read_table, replace_partitions

    index_root = os.path.join(tmp, "ann_index")
    boot = nv.filter(F.pmod("vec_id", F.lit(10)) == 0)
    cents = _ivf_cents(boot).localCheckpoint(eager=False)
    idx_rows = _two_level_assign(nv, cents).select(
        "vec_id", "centroid_id", "qv", "nrm"
    ).withColumn("cell_bucket", F.pmod("centroid_id", F.lit(_CELL_BUCKETS)))
    replace_partitions(idx_rows, index_root, ["cell_bucket"], "bulk-load")

    w_cent = Window.partitionBy("probe_id").orderBy(
        F.desc("c_sim"), F.asc("centroid_id")
    )
    probe_cells = (
        cents.drop("stride", "cstride")
        .crossJoin(F.broadcast(probes))
        .select(
            "probe_id",
            "centroid_id",
            _cosine(
                _dot(F.col("pqv"), F.col("cqv")), F.col("pnrm"), F.col("cnrm")
            ).alias("c_sim"),
        )
        .withColumn("crn", F.row_number().over(w_cent))
        .filter(F.col("crn") <= _IVF_NPROBE)
        .select("probe_id", "centroid_id")
        .localCheckpoint()
    )
    allowed = {
        str(r["b"])
        for r in probe_cells.select(
            F.pmod("centroid_id", F.lit(_CELL_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    }
    idx = read_table(
        spark,
        index_root,
        partition_filter=lambda kv: kv["cell_bucket"] in allowed,
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.col("qv").cast("array<bigint>").alias("qv"),
        F.col("nrm").cast("long").alias("nrm"),
    )
    # single-probe pruning audit (the ann_index_bucket_probe convention)
    one = probe_cells.orderBy("probe_id").limit(_IVF_NPROBE)
    one_buckets = {
        str(r["b"])
        for r in one.select(
            F.pmod("centroid_id", F.lit(_CELL_BUCKETS)).alias("b")
        ).collect()
    }
    all_parts = list(current_manifest(index_root)["partitions"])
    one_parts = [
        p for p in all_parts
        if dict(s.split("=", 1) for s in p.split("/"))["cell_bucket"]
        in one_buckets
    ]
    if len(one_parts) > _IVF_NPROBE or (
        len(all_parts) > _IVF_NPROBE and len(one_parts) >= len(all_parts)
    ):
        raise RuntimeError(
            f"cell-bucket pruning ineffective: one probe touches "
            f"{len(one_parts)} of {len(all_parts)} partitions"
        )
    w_pool = Window.partitionBy("probe_id").orderBy(
        F.desc("qsim"), F.asc("vec_id")
    )
    return (
        F.broadcast(probes)
        .join(probe_cells, "probe_id")
        .join(idx, "centroid_id")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "qv",
            "nrm",
            _cosine(
                _dot(F.col("pqv"), F.col("qv")), F.col("pnrm"), F.col("nrm")
            ).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(w_pool))
        .filter(F.col("rn") <= pool)
        .drop("rn")
        .localCheckpoint()
    )


# --------------------------------------------------------------------------
# MMR over the ANN-served pool
# --------------------------------------------------------------------------


def _sql_mmr_served() -> str:
    unions = "\nUNION ALL ".join(
        f"SELECT probe_id, vec_id AS neighbor_id, {k} AS step, mmr AS mmr_score FROM s{k}"
        for k in range(1, _MMR_K + 1)
    )
    return f"""
WITH q AS (
  SELECT vec_id, {_SQL_QVEC.format(e='embedding')} AS qv FROM embeddings
),
n AS MATERIALIZED (SELECT vec_id, qv, {_SQL_NORM.format(a='qv')} AS nrm FROM q),
probes AS (
  SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm FROM n
  WHERE vec_id < {_MMR_PROBES}
),
{_sql_served_pool('n', 'probes', 'probe_id', _MMR_POOL)},
{_sql_mmr_steps()}
{unions}
"""


@register(
    "mmr_diversified_topk_served",
    oracle=_sql_mmr_served(),
    tags=("similarity", "llm", "topk", "iterative", "ann", "acid"),
    doc=(
        "L3 SERVED: MMR diversification whose relevance pool comes "
        "from the standing bucketed ANN index (nprobe cells read, "
        "pruning audited, exact re-rank inside the cells) instead of "
        "an exact corpus scan; the greedy loop is the SHARED "
        "``_mmr_greedy`` chain.  Fully oracle-replayed — training, "
        "assignment, probing, pool and all 5 greedy steps."
    ),
)
def mmr_diversified_topk_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("qv")
    )
    nv = emb.select(
        "vec_id", "qv", _dot(F.col("qv"), F.col("qv")).alias("nrm")
    )
    probes = nv.filter(F.col("vec_id") < _MMR_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("qv").alias("pqv"),
        F.col("nrm").alias("pnrm"),
    )
    tmp = tempfile.mkdtemp(prefix="mmrserve_")
    try:
        cand = _ann_candidate_pool(spark, nv, probes, _MMR_POOL, tmp)
        out = _mmr_greedy(cand).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# hybrid RRF with both legs served from standing artifacts
# --------------------------------------------------------------------------


def _sql_rrf_served_chain() -> str:
    """Served-vector-leg CTE chain over the in-scope ``n``/``probes``
    of ``_sql_rrf_core`` (which also supplies the lexical ``lrank``):
    svnv → pool ``svcand`` → ``svvrank`` → ``svfused``.  Emitted
    alongside the exact core so the recall gate can rank both."""
    pool = _sql_served_pool("svnv", "probes", "pid", _RRF_POOL, out="svcand")
    # _sql_served_pool emits probe columns as (pid, pqv, pnrm) — the
    # rrf core's probes CTE already matches that shape.
    return f"""svnv AS MATERIALIZED (SELECT id AS vec_id, qv, nrm FROM n),
{pool},
svvrank AS (
  SELECT pid, vec_id AS id,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY qsim DESC, vec_id) AS vr
  FROM svcand
),
svfused AS (
  SELECT COALESCE(v.pid, l.pid) AS pid,
         COALESCE(v.id, l.id) AS id,
         COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + v.vr), CAST(0.0 AS DOUBLE))
           + COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + l.lr), CAST(0.0 AS DOUBLE))
           AS rrf
  FROM svvrank v
  FULL OUTER JOIN lrank l ON l.pid = v.pid AND l.id = v.id
)"""


def _sql_rrf_served() -> str:
    from .similarity import _sql_rrf_core

    return f"""{_sql_rrf_core()},
{_sql_rrf_served_chain()}
SELECT pid AS probe_id, id AS doc_id, rn, rrf AS rrf_score
FROM (
  SELECT pid, id, rrf,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY rrf DESC, id) AS rn
  FROM svfused
)
WHERE rn <= 5
"""


def _rrf_served_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The served fused hybrid ranking (pid, id, rrf): vector leg from
    the standing ANN index pool, lexical leg from the standing
    token-bucketed postings — both manifest-pruned reads."""
    import os
    import shutil
    import tempfile

    from ..io.acid_table import read_table
    from ..streaming.bm25_ingest import (
        _TOK_BUCKETS,
        _build_standing_index,
    )
    from ._helpers import md5_bucket

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), _qvec("embedding").alias("qv")
    )
    n = (
        emb.join(docs, emb["id"] == docs["doc_id"])
        .select(
            "id",
            "qv",
            _dot(F.col("qv"), F.col("qv")).alias("nrm"),
            F.split("text", " ").alias("ws"),
        )
        .localCheckpoint(eager=False)
    )
    nv = n.select(F.col("id").alias("vec_id"), "qv", "nrm")
    probes = n.filter(F.col("id") < _RRF_PROBES).select(
        F.col("id").alias("probe_id"),
        F.col("qv").alias("pqv"),
        F.col("nrm").alias("pnrm"),
        F.col("ws").alias("pws"),
    ).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="rrfserve_")
    try:
        # VECTOR LEG: the ANN-served pool, exact-re-ranked
        cand = _ann_candidate_pool(
            spark, nv, probes.drop("pws"), _RRF_POOL, tmp
        )
        vrank = (
            cand.select(
                F.col("probe_id").alias("pid"),
                F.col("vec_id").alias("id"),
                "qsim",
            )
            .withColumn(
                "vr",
                F.row_number().over(
                    Window.partitionBy("pid").orderBy(
                        F.desc("qsim"), F.asc("id")
                    )
                ),
            )
            .select("pid", "id", "vr")
        )
        # LEXICAL LEG: the standing postings, token-bucket-pruned
        post_roots = _build_standing_index(spark, sf_dir, os.path.join(tmp, "lex"))
        ptok = (
            probes.select(
                F.col("probe_id").alias("pid"), F.explode("pws").alias("tok")
            )
            .distinct()
            .localCheckpoint()
        )
        lex_allowed = {
            str(r["b"])
            for r in ptok.select(
                F.pmod(md5_bucket("tok"), F.lit(_TOK_BUCKETS)).alias("b")
            )
            .distinct()
            .collect()
        }
        post = read_table(
            spark,
            post_roots["postings"],
            partition_filter=lambda kv: kv["tok_bucket"] in lex_allowed,
        ).select(
            F.col("doc_id").cast("long").alias("id"),
            F.col("tok").cast("string").alias("tok"),
        )
        ov = (
            F.broadcast(ptok)
            .join(post, "tok")
            .filter(F.col("id") != F.col("pid"))
            # the vector corpus view: docs without embeddings never rank
            .join(nv.select(F.col("vec_id").alias("id")), "id", "left_semi")
            .groupBy("pid", "id")
            .agg(F.count("*").alias("novl"))
        )
        lrank = (
            ov.withColumn(
                "lr",
                F.row_number().over(
                    Window.partitionBy("pid").orderBy(
                        F.desc("novl"), F.asc("id")
                    )
                ),
            )
            .filter(F.col("lr") <= _RRF_POOL)
            .select("pid", "id", "lr")
        )
        one = F.lit(1.0)
        zero = F.lit(0.0)
        fused = (
            vrank.join(lrank, ["pid", "id"], "full")
            .select(
                "pid",
                "id",
                (
                    F.coalesce(one / (F.lit(_RRF_K) + F.col("vr")), zero)
                    + F.coalesce(one / (F.lit(_RRF_K) + F.col("lr")), zero)
                ).alias("rrf"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return fused


@register(
    "hybrid_rrf_retrieval_served",
    oracle=_sql_rrf_served(),
    tags=("similarity", "text", "llm", "topk", "ann", "acid"),
    doc=(
        "L32 SERVED: hybrid RRF whose vector leg probes the standing "
        "bucketed ANN index (nprobe cells, exact re-rank, pruning "
        "audited) and whose lexical leg reads the standing "
        "token-bucketed postings — per-query cost probe-local in both "
        "legs.  Fully oracle-replayed end to end."
    ),
)
def hybrid_rrf_retrieval_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    fused = _rrf_served_fused(spark, sf_dir)
    w = Window.partitionBy("pid").orderBy(F.desc("rrf"), F.asc("id"))
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            F.col("pid").alias("probe_id"),
            F.col("id").alias("doc_id"),
            "rn",
            F.col("rrf").alias("rrf_score"),
        )
    )


def _sql_rrf_served_recall() -> str:
    from .similarity import _sql_rrf_core

    return f"""{_sql_rrf_core()},
{_sql_rrf_served_chain()},
extop AS (
  SELECT pid, id FROM (
    SELECT pid, id,
           ROW_NUMBER() OVER (PARTITION BY pid ORDER BY rrf DESC, id) AS rn
    FROM fused
  ) WHERE rn <= 5
),
svtop AS (
  SELECT pid, id FROM (
    SELECT pid, id,
           ROW_NUMBER() OVER (PARTITION BY pid ORDER BY rrf DESC, id) AS rn
    FROM svfused
  ) WHERE rn <= 5
),
hits AS (
  SELECT s.pid, s.id,
         CASE WHEN t.id IS NULL THEN 0 ELSE 1 END AS hit
  FROM svtop s LEFT JOIN extop t ON t.pid = s.pid AND t.id = s.id
)
SELECT CAST(SUM(hit) AS BIGINT) AS n_hits,
       COUNT(*) AS n_slots,
       CAST((10000 * CAST(SUM(hit) AS BIGINT)) // COUNT(*) AS BIGINT) AS recall_e4
FROM hits
"""


@register(
    "hybrid_served_recall_check",
    oracle=_sql_rrf_served_recall(),
    tags=("similarity", "text", "llm", "quality-gate", "ann"),
    doc=(
        "L32 SERVED quality gate: retention of the exact-scan hybrid "
        "top-5 by the ANN-served hybrid top-5 (recall_e4).  The hash "
        "gate PINS the measured trade — the nprobe cell probing "
        "drifting (or the lexical leg diverging from the standing "
        "postings) fails the driver, the convention of "
        "hybrid_recall_check / pq_ann_recall_check."
    ),
)
def hybrid_served_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _rrf_fused

    def top5(fused: DataFrame) -> DataFrame:
        w = Window.partitionBy("pid").orderBy(F.desc("rrf"), F.asc("id"))
        return (
            fused.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("pid", "id")
        )

    served = top5(_rrf_served_fused(spark, sf_dir))
    exact = top5(_rrf_fused(spark, sf_dir)).withColumnRenamed("id", "tid")
    hits = served.join(
        exact,
        (exact["pid"] == served["pid"]) & (exact["tid"] == served["id"]),
        "left",
    ).select(
        F.when(F.col("tid").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("hit")
    )
    return hits.agg(
        F.sum("hit").cast("bigint").alias("n_hits"),
        F.count("*").alias("n_slots"),
        F.expr("CAST(10000 * sum(hit) AS BIGINT) div count(*)").alias(
            "recall_e4"
        ),
    )
