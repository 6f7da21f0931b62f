"""User-facing engine facade.

A user of the reference project interacts with three things: tables,
ad-hoc transformations, and the named pipeline products.  ``Engine``
packages those: fixture tables by name, the full named-query registry,
arbitrary SQL over registered views, and the composable pipeline.

    eng = Engine(spark, "/root/testdata/sf0.01")
    eng.table("lineitem").filter(...)
    eng.query("pricing_summary")            # any registry query
    eng.sql("SELECT COUNT(*) FROM orders")  # SQL API over the views
    eng.names()                             # discoverability
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import registry
from .config import EngineConfig, set_config
from .io.tables import TABLES, register_views, table
from .operators.misc import pipeline  # noqa: F401  (re-export)


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        config: EngineConfig | None = None,
    ):
        """``config`` sets the process-wide scale knobs (shuffle widths,
        candidate budgets — sizing rules in ``config.py``); when it
        carries ``auto_broadcast_mb`` the session threshold is written
        here too, since that one lives in Spark conf, not in plans."""
        self.spark = spark
        self.sf_dir = sf_dir
        self._views_registered = False
        if config is not None:
            set_config(config)
            if config.auto_broadcast_mb is not None:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold",
                    str(config.auto_broadcast_mb * 1024 * 1024),
                )

    def table(self, name: str) -> DataFrame:
        return table(self.spark, self.sf_dir, name)

    def tables(self) -> tuple[str, ...]:
        return TABLES

    def query(self, name: str) -> DataFrame:
        """Run a named query from the registry (SURVEY §2 inventory)."""
        return registry.queries()[name](self.spark, self.sf_dir)

    def names(self) -> list[str]:
        return sorted(registry.queries())

    def oracle(self, name: str) -> str | None:
        return registry.oracle_sql().get(name)

    def sql(self, query: str) -> DataFrame:
        """SQL API: all fixture tables are available as views."""
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    def describe(self, name: str) -> dict:
        """One query's metadata: doc line, tags, oracle availability."""
        spec = registry.all_queries()[name]
        return {
            "name": name,
            "doc": spec.doc,
            "tags": list(spec.tags),
            "has_oracle": spec.oracle is not None,
        }

    def search(self, tag: str) -> list[str]:
        """Registry names carrying ``tag`` (e.g. 'dedup', 'ann',
        'streaming') — the discoverability path into 250+ queries."""
        return sorted(
            n for n, s in registry.all_queries().items() if tag in s.tags
        )

    def explain(self, name: str) -> str:
        """The FORMATTED physical plan for a named query — the review
        surface this repo's plan-first rules are enforced against
        (PLANS.md is the full-registry audit of exactly this output)."""
        df = self.query(name)
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
