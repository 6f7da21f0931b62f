"""data_engineer_coder_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL project (``franfurey/data-engineer-coder``,
surveyed in ``SURVEY.md``), extended with the relational / streaming /
LLM-data-pipeline operator inventory of SURVEY.md §2.

Design stance (SURVEY.md §7): lazy DataFrame plans end-to-end, explicit
schemas, Catalyst does the optimizing, every operator is a small pure
function ``(SparkSession, sf_dir) -> DataFrame`` registered into the
query registry with a DuckDB-runnable oracle SQL twin.
"""

__version__ = "0.1.0"

from .registry import all_queries, oracle_sql, queries  # noqa: F401
