"""Graph analytics over TPC-H-derived graphs (SURVEY.md §2 L-family
extensions): PageRank as a fixed-iteration power method.

Complements the iterative-algorithm coverage in ``dedup.py``
(``dedup_clusters`` = convergence-checked label propagation, a driver
loop with per-round jobs): a FIXED iteration count needs no driver loop
at all — the three rounds unroll into ONE lazy plan that Catalyst
executes as a single job.  The edge list is materialized once
(``localCheckpoint``) so the mining join never re-runs per round.

Determinism contract: ranks are integer micro-units and every update is
exact bigint arithmetic (``r div deg``, ``(s * 85) div 100``), so Spark
and the DuckDB oracle agree bit-for-bit — no float summation order to
worry about (the same quantized-int posture as ``similarity.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import table
from ..registry import register

# damping 0.85 in integer micro-units: r' = 150_000 + (Σ contrib * 85) div 100
_R0 = 1_000_000
_TELEPORT = 150_000
_PR_ITERS = 3


def _pr_round(edges: DataFrame, state: DataFrame) -> DataFrame:
    """One power-iteration round: per-edge contribution ``r div deg`` of
    the source, summed per destination.  Undirected edges stored in both
    directions mean every node receives >= 1 contribution, so no
    dangling-node fixup is needed.  One shuffle per round (the sum);
    the edges⋈state join co-partitions on the node key."""
    contribs = (
        edges.join(state, edges.src == state.node)
        .select(F.col("dst"), F.expr("r div d").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    return contribs.select(
        F.col("dst").alias("node"),
        (F.lit(_TELEPORT) + F.expr("s * 85 div 100")).cast("bigint").alias("r"),
    )


@register(
    "pagerank_trade_graph",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT 2 * c AS src, 2 * s + 1 AS dst FROM pairs
  UNION ALL
  SELECT 2 * s + 1 AS src, 2 * c AS dst FROM pairs
),
deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY 1),
r0 AS (SELECT node, CAST({_R0} AS BIGINT) AS r, d FROM deg),
r1 AS (
  SELECT e.dst AS node,
         CAST({_TELEPORT} + (SUM(p.r // p.d) * 85) // 100 AS BIGINT) AS r
  FROM edges e JOIN r0 p ON e.src = p.node GROUP BY e.dst
),
r1d AS (SELECT r1.node, r1.r, deg.d FROM r1 JOIN deg ON r1.node = deg.node),
r2 AS (
  SELECT e.dst AS node,
         CAST({_TELEPORT} + (SUM(p.r // p.d) * 85) // 100 AS BIGINT) AS r
  FROM edges e JOIN r1d p ON e.src = p.node GROUP BY e.dst
),
r2d AS (SELECT r2.node, r2.r, deg.d FROM r2 JOIN deg ON r2.node = deg.node),
r3 AS (
  SELECT e.dst AS node,
         CAST({_TELEPORT} + (SUM(p.r // p.d) * 85) // 100 AS BIGINT) AS r
  FROM edges e JOIN r2d p ON e.src = p.node GROUP BY e.dst
)
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       CAST(node // 2 AS BIGINT) AS entity_key,
       r AS rank_micro
FROM r3
ORDER BY rank_micro DESC, node ASC
LIMIT 20
""",
    tags=("graph", "iterative", "join", "agg"),
    doc=(
        "Graph: 3 PageRank power iterations over the undirected customer-"
        "supplier trade graph (distinct orders⋈lineitem pairs).  Integer "
        "micro-unit ranks -> exact cross-engine math; fixed iteration "
        "count -> one lazy unrolled plan, zero driver loops."
    ),
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes of the customer↔supplier graph by 3-round PageRank.

    Scale posture: the edge list is checkpointed once (mining join runs
    once, not per round); each round is one co-partitioned join + one
    sum shuffle over edges — the exact shape GraphX/Pregel lowers to.
    State is (node, rank, degree): carrying the degree avoids a per-
    round re-join against a separate degree table.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    c = (F.col("o_custkey").cast("bigint") * 2).alias("src")
    s = (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("dst")
    edges = (
        pairs.select(c, s)
        .unionByName(
            pairs.select(
                (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("src"),
                (F.col("o_custkey").cast("bigint") * 2).alias("dst"),
            )
        )
        .localCheckpoint()  # mine the graph once, not once per round
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d")).select(
        F.col("src").alias("node"), "d"
    )
    state = deg.select("node", F.lit(_R0).cast("bigint").alias("r"), "d")
    for _ in range(_PR_ITERS):
        ranks = _pr_round(edges, state)
        state = ranks.join(deg, "node").select("node", "r", "d")
    return (
        state.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").cast("bigint").alias("entity_key"),
            F.col("r").alias("rank_micro"),
            F.col("node").alias("_n"),
        )
        .orderBy(F.desc("rank_micro"), F.asc("_n"))
        .limit(20)
        .drop("_n")
    )
