"""T8i (round 11): the UNIFIED CURATION INGEST PIPELINE through the
driver gate — the three proven ingest gates (T8e near-dup screen, T8h
decontamination, the T8d-style ledger) composed over ONE arriving
stream under ONE per-epoch transaction (``core.write_stream_curation_gate``).

The registered query drives the REAL stream — the train slice of the
documents table (doc_id % 97 != 0; the held-out slice builds the
standing eval 8-gram index first) split into 3 deterministic epochs —
and returns the PER-DOC VERDICT table: every arriving doc's fate
(``rejected_neardup_index`` / ``rejected_neardup_batch`` /
``quarantined_contaminated`` / ``accepted``) exactly as the gate
committed it.  The oracle replays EVERY decision in plain SQL: the
MinHash/band/agreement chain unrolled over the 3 epochs with the index
evolving as the ACCEPTED sets, and the eval-gram contamination probe —
so the driver's value hash certifies the composed pipeline end to end,
not just its counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register


def _curation_oracle() -> str:
    from ..operators.dedup import _MERSENNE, _PERM_A, _PERM_B, _ROWS
    from ..operators.textops import _DECON_MOD, _DECON_N

    perm_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    sql = f"""
WITH tr AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE doc_id % {_DECON_MOD} <> 0
),
w AS (SELECT doc_id, ws FROM tr WHERE LEN(ws) >= 3),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, LEN(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
    FROM w
  )
),
perms AS (SELECT * FROM (VALUES {perm_rows}) AS p(j, a, b)),
hv AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(s), 1, 15))::UBIGINT % 2147483648 AS BIGINT) AS h
  FROM sh
),
sig AS (
  SELECT doc_id, p.j, MIN((p.a * hv.h + p.b) % {_MERSENNE}) AS m
  FROM hv CROSS JOIN perms p GROUP BY 1, 2
),
bands AS (
  SELECT doc_id,
         CAST(j // {_ROWS} AS VARCHAR) || '_'
           || string_agg(CAST(m AS VARCHAR), '_' ORDER BY j) AS band_key
  FROM sig GROUP BY doc_id, j // {_ROWS}
),
pair AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id <> b.doc_id
),
agree AS (
  SELECT p.da, p.db, COUNT(*) FILTER (WHERE sa.m = sb.m) AS k
  FROM pair p
  JOIN sig sa ON sa.doc_id = p.da
  JOIN sig sb ON sb.doc_id = p.db AND sb.j = sa.j
  GROUP BY 1, 2
),
m2 AS (SELECT da, db FROM agree WHERE k >= 16),
ev AS (
  SELECT DISTINCT array_to_string(list_slice(ws, i, i + {_DECON_N - 1}), ' ') AS g
  FROM (SELECT string_split(text, ' ') AS ws
        FROM documents WHERE doc_id % {_DECON_MOD} = 0),
       unnest(range(1, LEN(ws) - {_DECON_N - 2})) AS u(i)
),
contam AS (
  SELECT DISTINCT t.doc_id
  FROM tr t, unnest(range(1, LEN(t.ws) - {_DECON_N - 2})) AS u(i)
  WHERE array_to_string(list_slice(t.ws, i, i + {_DECON_N - 1}), ' ')
          IN (SELECT g FROM ev)
),
ep AS (SELECT doc_id, doc_id % 3 AS e FROM tr),
e0 AS (SELECT doc_id FROM ep WHERE e = 0),
e1 AS (SELECT doc_id FROM ep WHERE e = 1),
e2 AS (SELECT doc_id FROM ep WHERE e = 2),
rb0 AS (
  SELECT DISTINCT m.da AS doc_id FROM m2 m
  JOIN e0 x ON x.doc_id = m.da JOIN e0 y ON y.doc_id = m.db
  WHERE m.db < m.da
),
s0 AS (SELECT doc_id FROM e0 WHERE doc_id NOT IN (SELECT doc_id FROM rb0)),
q0 AS (SELECT doc_id FROM s0 WHERE doc_id IN (SELECT doc_id FROM contam)),
a0 AS (SELECT doc_id FROM s0 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
ri1 AS (
  SELECT DISTINCT m.da AS doc_id FROM m2 m
  JOIN e1 x ON x.doc_id = m.da JOIN a0 y ON y.doc_id = m.db
),
rb1 AS (
  SELECT DISTINCT m.da AS doc_id FROM m2 m
  JOIN e1 x ON x.doc_id = m.da JOIN e1 y ON y.doc_id = m.db
  WHERE m.db < m.da AND m.da NOT IN (SELECT doc_id FROM ri1)
),
s1 AS (
  SELECT doc_id FROM e1
  WHERE doc_id NOT IN (SELECT doc_id FROM ri1 UNION SELECT doc_id FROM rb1)
),
q1 AS (SELECT doc_id FROM s1 WHERE doc_id IN (SELECT doc_id FROM contam)),
a1 AS (SELECT doc_id FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
idx2 AS (SELECT doc_id FROM a0 UNION SELECT doc_id FROM a1),
ri2 AS (
  SELECT DISTINCT m.da AS doc_id FROM m2 m
  JOIN e2 x ON x.doc_id = m.da JOIN idx2 y ON y.doc_id = m.db
),
rb2 AS (
  SELECT DISTINCT m.da AS doc_id FROM m2 m
  JOIN e2 x ON x.doc_id = m.da JOIN e2 y ON y.doc_id = m.db
  WHERE m.db < m.da AND m.da NOT IN (SELECT doc_id FROM ri2)
),
s2 AS (
  SELECT doc_id FROM e2
  WHERE doc_id NOT IN (SELECT doc_id FROM ri2 UNION SELECT doc_id FROM rb2)
),
q2 AS (SELECT doc_id FROM s2 WHERE doc_id IN (SELECT doc_id FROM contam)),
a2 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM contam))
SELECT doc_id, 0 AS epoch, 'rejected_neardup_batch' AS verdict FROM rb0
UNION ALL SELECT doc_id, 0, 'quarantined_contaminated' FROM q0
UNION ALL SELECT doc_id, 0, 'accepted' FROM a0
UNION ALL SELECT doc_id, 1, 'rejected_neardup_index' FROM ri1
UNION ALL SELECT doc_id, 1, 'rejected_neardup_batch' FROM rb1
UNION ALL SELECT doc_id, 1, 'quarantined_contaminated' FROM q1
UNION ALL SELECT doc_id, 1, 'accepted' FROM a1
UNION ALL SELECT doc_id, 2, 'rejected_neardup_index' FROM ri2
UNION ALL SELECT doc_id, 2, 'rejected_neardup_batch' FROM rb2
UNION ALL SELECT doc_id, 2, 'quarantined_contaminated' FROM q2
UNION ALL SELECT doc_id, 2, 'accepted' FROM a2
"""
    # multi-referenced heavy CTEs: DuckDB inlines per reference and the
    # epoch recursion references sig/m2/contam many times (the r10
    # MATERIALIZED rule — bpe_learn_iterative / cms-gate pattern)
    for cte in ("hv", "sig", "m2", "ev", "contam"):
        sql = sql.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (", 1)
    return sql


@register(
    "stream_curation_ingest",
    oracle=_curation_oracle(),
    tags=(
        "streaming", "pipeline", "dedup", "decontamination", "llm",
        "acid", "real-stream",
    ),
    doc=(
        "T8i real stream: 3 ordered micro-batches of training documents "
        "through the UNIFIED curation gate — near-dup screen against the "
        "evolving accepted-docs index, then eval 8-gram decontamination "
        "of the survivors, docs/quarantine/index/verdicts/ledger all "
        "committed under ONE epoch txid.  Returns the per-doc verdict "
        "table; oracle = full SQL replay of every verdict across the "
        "3 epochs."
    ),
)
def stream_curation_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..io.acid_table import read_table, replace_partitions
    from ..operators.textops import _DECON_MOD, _DECON_N, ngram_array
    from .core import write_stream_curation_gate
    from .windows import _await_gate, _ordered_epoch_stream

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    is_eval = F.pmod("doc_id", F.lit(_DECON_MOD)) == 0
    train = docs.filter(~is_eval)
    tmp = tempfile.mkdtemp(prefix="crgate_")
    try:
        # the standing eval index, built once before the stream starts
        # (hash-bucketed build; whole-table broadcast per epoch — an
        # eval set is small by construction)
        ev = (
            docs.filter(is_eval)
            .select(
                F.explode(
                    ngram_array(F.split("text", " "), _DECON_N)
                ).alias("g")
            )
            .distinct()
            .withColumn("b", F.pmod(F.xxhash64("g"), F.lit(8)))
        )
        roots = {
            n: os.path.join(tmp, n)
            for n in ("eval", "sigs", "docs", "quarantine", "verdicts", "stats")
        }
        replace_partitions(
            ev.repartition(F.col("b")), roots["eval"], ["b"], "eval-build"
        )
        sdf = _ordered_epoch_stream(spark, train, tmp)
        key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(key)
        spark.conf.set(key, "8")
        try:
            q = write_stream_curation_gate(
                sdf, roots["eval"], roots["sigs"], roots["docs"],
                roots["quarantine"], roots["verdicts"], roots["stats"],
            )
            _await_gate(q)
        finally:
            spark.conf.set(key, prev)
        ledger = [
            (int(r["epoch"]), r["n_arrived"], r["arrived_id_sum"],
             r["n_rejected_index"], r["n_rejected_batch"],
             r["n_quarantined"], r["n_accepted"])
            for r in read_table(spark, roots["stats"]).collect()
        ]
        # Loud determinism guard: epoch membership must match the
        # doc_id % 3 split of the TRAIN slice.
        want = {
            int(r["e"]): (r["n"], int(r["ids"] or 0))
            for r in train.groupBy(F.pmod("doc_id", F.lit(3)).alias("e"))
            .agg(F.count("*").alias("n"), F.sum("doc_id").alias("ids"))
            .collect()
        }
        got = {e: (n, ids) for e, n, ids, _, _, _, _ in ledger}
        if got != want:
            raise RuntimeError(
                f"epoch membership drifted from the doc_id%3 split: {got} != {want}"
            )
        # CONSERVATION: each epoch's four verdict buckets partition its
        # arrivals, and the standing tables reconcile with the ledger.
        for e, n, _, ri, rb, nq, na in ledger:
            if ri + rb + nq + na != n:
                raise RuntimeError(
                    f"epoch {e}: verdicts {ri}+{rb}+{nq}+{na} != arrived {n}"
                )
        n_docs = read_table(spark, roots["docs"]).count()
        try:
            n_quar = read_table(spark, roots["quarantine"]).count()
        except ValueError:
            n_quar = 0
        if n_docs != sum(r[6] for r in ledger) or n_quar != sum(
            r[5] for r in ledger
        ):
            raise RuntimeError(
                "docs/quarantine tables disagree with the ledger — the "
                "gate lost or duplicated rows"
            )
        verdicts = [
            (int(r["doc_id"]), int(r["epoch"]), r["verdict"])
            for r in read_table(spark, roots["verdicts"]).collect()
        ]
        if len(verdicts) != sum(r[1] for r in ledger):
            raise RuntimeError("verdict rows != arrivals — audit trail broken")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        verdicts, "doc_id long, epoch int, verdict string"
    )
