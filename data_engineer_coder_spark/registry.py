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
    "data_engineer_coder_spark.operators.dedup",
    "data_engineer_coder_spark.operators.similarity",
    "data_engineer_coder_spark.operators.textops",
    "data_engineer_coder_spark.operators.multimodal",
    "data_engineer_coder_spark.streaming.windows",
    "data_engineer_coder_spark.streaming.stateful",
)

_loaded = False


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
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle}
