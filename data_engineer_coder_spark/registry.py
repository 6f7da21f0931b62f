"""Query registry — the engine's public query surface.

Every operator from SURVEY.md §2 lands here as a named query: a pure
function ``(SparkSession, sf_dir) -> DataFrame`` plus (when expressible)
an ANSI-SQL oracle string that DuckDB runs on the same parquet tables.
``__spark_entry__.py`` re-exports this registry to the driver.

Contract notes (SURVEY.md §5.2):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing);
- float aggregates are rounded *inside both* query and oracle so the
  order-insensitive value hash is stable across engines;
- temporal outputs are emitted as strings (``yyyy-MM-dd ...``) in both
  engines to dodge timestamp-representation mismatches.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "data_engineer_coder_spark.operators.relational",
    "data_engineer_coder_spark.operators.joins",
    "data_engineer_coder_spark.operators.aggregates",
    "data_engineer_coder_spark.operators.windows",
    "data_engineer_coder_spark.operators.setops",
    "data_engineer_coder_spark.operators.scalar_functions",
    "data_engineer_coder_spark.operators.airquality",
    "data_engineer_coder_spark.operators.misc",
    "data_engineer_coder_spark.operators.udfs",
    "data_engineer_coder_spark.operators.analytics",
    "data_engineer_coder_spark.operators.multijoin",
    "data_engineer_coder_spark.operators.tpch_extra",
    "data_engineer_coder_spark.operators.dedup",
    "data_engineer_coder_spark.operators.graph",
    "data_engineer_coder_spark.operators.similarity",
    "data_engineer_coder_spark.operators.retrieval_served",
    "data_engineer_coder_spark.operators.retrieval_delete",
    "data_engineer_coder_spark.operators.textops",
    "data_engineer_coder_spark.operators.multimodal",
    "data_engineer_coder_spark.operators.sampling",
    "data_engineer_coder_spark.operators.packing",
    "data_engineer_coder_spark.operators.fileformats",
    "data_engineer_coder_spark.operators.pipelines",
    "data_engineer_coder_spark.operators.cdc",
    "data_engineer_coder_spark.sources.custom",
    "data_engineer_coder_spark.streaming.windows",
    "data_engineer_coder_spark.streaming.curation",
    "data_engineer_coder_spark.streaming.ann_ingest",
    "data_engineer_coder_spark.streaming.bm25_ingest",
    "data_engineer_coder_spark.streaming.stateful",
    "data_engineer_coder_spark.streaming.joins",
)

_loaded = False

# Names whose implementation or oracle changed AFTER the driver recorded a
# row for them: always re-checked first, regardless of recorded status.
# Prune when the post-change round records a fresh green row.
_FORCE_RECHECK: tuple[str, ...] = (
    # (round-13 cohort — rag_chunk_pipeline rank-normalization + the
    # nprobe=12 served re-pin — pruned: all 5 re-proven green in
    # CORRECTNESS_r13.)
    # round 14: the compaction audit now covers all three lexical
    # tables (oracle re-derived: tbl column + forward/tokstats dir
    # ledgers), and the delete audit routes through
    # propagate_retrieval_delete (tokstats df corrections, layout from
    # table metadata) — implementations/oracles changed post-green.
    "bm25_index_compaction_audit",
    "retrieval_index_delete_audit",
    # round 14: the two-stage serve's stage-0 dfreq now drops df<=0
    # tokens and reads the persisted tokstats layout; the retention
    # gate shares the path.
    "bm25_longdoc_two_stage_served",
    "bm25_two_stage_retention_check",
    # round 14: served/standing-index reads derive bucket layouts from
    # table _config.json (VERDICT r13 #1) and the curation gate commits
    # its BM25 ledger last (ADVICE r13) — recorded hashes predate that.
    "bm25_topk_served",
    "bm25_rm3_expansion_served",
    "stream_bm25_index_ingest",
    "stream_curation_searchable",
    # round 14: the served ANN pools now probe adaptively
    # (similarity.served_nprobe; VERDICT r13 #2) — identical to the old
    # literal at driver scales by construction, but the implementation
    # changed post-green, so re-prove the two verdict-named gates.
    "hybrid_served_recall_check",
    "retrieval_rank_metrics_served",
)

# (The round-3/4 _CHECK_FIRST backlog queue is gone: every registered query
# now has a green CORRECTNESS row, so the never-checked tier is empty except
# for genuinely new queries, which sort ahead automatically.)


def _driver_checked(root: str | None = None) -> dict[str, int]:
    """name → last round whose CORRECTNESS_r*.json recorded a *green* row.

    Green means the value hash actually matched (``hash_match`` true) — a
    row that ran but mismatched must NOT retire the query from the check
    prefix, or a known-failing query would be hidden from every future
    round; such names map to ``-1`` (reached but never green).  Rows with
    ``err == "no_oracle"`` are rows-only by design (approximate/stateful):
    the driver can never hash-match them, so they count as green rather
    than permanently occupying prefix slots.

    The round number drives the staleness rotation in ``_check_order``.
    """
    import glob
    import json
    import os
    import re

    repo_root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or row.get("err") == "no_oracle"
            if ok:
                seen[name] = max(seen.get(name, -1), rnd)
            else:
                seen.setdefault(name, -1)
    return seen


def _check_order(names: list[str]) -> list[str]:
    """Order queries for the external driver's 50-slot correctness prefix.

    Tiers (earlier = checked sooner):
      0. _FORCE_RECHECK — implementation/oracle changed after its last green
         row, so that row is stale; always re-verify first.
      1. never reached by any driver gate (new queries).
      2. reached but never green (must stay visible until a green lands).
      3. green — STALENESS ROTATION: oldest last-green round first, so with
         ~219 queries and a 50-slot gate every query gets re-proven roughly
         every 5 rounds even with zero manual curation.  Ties (same round)
         break by registration order, which interleaves modules.
    """
    force = {n: i for i, n in enumerate(_FORCE_RECHECK)}
    reg = {n: i for i, n in enumerate(names)}
    seen = _driver_checked()

    def key(n: str):
        if n in force:
            return (0, 0, force[n])  # changed post-green — always re-verify
        if n not in seen:
            return (1, 0, reg[n])  # never reached by the driver gate
        if seen[n] < 0:
            return (2, 0, reg[n])  # reached but errored — needs a fresh row
        return (3, seen[n], reg[n])  # green: oldest round first

    return sorted(names, key=key)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — skip, don't break
            # the whole registry.
            missing = e.name or ""
            if not mod.startswith(missing):
                raise
    _loaded = True


def all_queries() -> dict[str, QuerySpec]:
    load_all()
    return {name: _REGISTRY[name] for name in _check_order(list(_REGISTRY))}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle}
