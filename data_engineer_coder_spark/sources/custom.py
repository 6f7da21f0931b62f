"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The reference's only source is an HTTP fetch glued to pandas
(``/root/reference/dags/my_data_pipeline.py:22-48``); the Spark-native
generalization of "bring your own source" is a registered DataSource
whose partitions the scheduler distributes like any other scan.  This
one generates a deterministic synthetic document-stats table — the
pattern (``partitions()`` → per-partition ``read()`` generator) is
exactly what a production connector (REST cursor pages, Kafka offset
ranges, object-store listings) plugs into.

Scale posture: one ``InputPartition`` per shard, read lazily on the
executors — the driver never materializes rows; shard count is the
parallelism knob.  Values are pure integer arithmetic on (shard, row),
so the output is bit-reproducible anywhere, which is what makes the
DuckDB oracle possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

_MULT = 2654435761  # Knuth multiplicative-hash constant (public domain)


class SyntheticDocsDataSource:
    """Lazily-imported DataSource subclass factory.

    ``pyspark.sql.datasource`` exists only in Spark >= 4.0; wrapping the
    subclass in a function keeps this module importable elsewhere.
    """

    def __new__(cls):
        from pyspark.sql.datasource import DataSource

        class _SyntheticDocs(DataSource):
            @classmethod
            def name(cls) -> str:
                return "synthetic_docs"

            def schema(self) -> str:
                return "doc_id bigint, shard int, token_count bigint"

            def reader(self, schema):
                return _reader(self.options)

            def simpleStreamReader(self, schema):
                return _stream_reader(self.options)

        return _SyntheticDocs


def _reader(options):
    from pyspark.sql.datasource import DataSourceReader, InputPartition

    class _Reader(DataSourceReader):
        def __init__(self):
            self.rows = int(options.get("rows_per_shard", 100))
            self.shards = int(options.get("shards", 8))

        def partitions(self):
            return [InputPartition(i) for i in range(self.shards)]

        def read(self, partition):
            shard = partition.value
            base = shard * self.rows
            for r in range(self.rows):
                doc_id = base + r
                yield (doc_id, shard, (doc_id * _MULT) % 97 + 3)

    return _Reader()


def _stream_reader(options):
    """Micro-batch half of the source: offsets are plain row counters, a
    batch is the deterministic rows in [start, min(start+batch, total)).
    A FINITE total makes tests (and availableNow-style draining) exact:
    once exhausted, every batch is empty with an unchanged offset.  The
    offset dict is what Spark checkpoints — restart-safe for free."""
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class _StreamReader(SimpleDataSourceStreamReader):
        def __init__(self):
            self.batch = int(options.get("rows_per_batch", 50))
            self.total = int(options.get("total_rows", 200))

        def initialOffset(self):
            return {"offset": 0}

        def read(self, start):
            off = int(start["offset"])
            end = min(off + self.batch, self.total)
            # materialized list, not a generator: the runtime caches and
            # copies the returned iterator for readBetweenOffsets replay
            rows = [(i, 0, (i * _MULT) % 97 + 3) for i in range(off, end)]
            return iter(rows), {"offset": end}

        def readBetweenOffsets(self, start, end):
            return iter(
                [
                    (i, 0, (i * _MULT) % 97 + 3)
                    for i in range(int(start["offset"]), int(end["offset"]))
                ]
            )

    return _StreamReader()


@register(
    "custom_source_scan",
    oracle=f"""
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(token_count) AS BIGINT) AS total_tokens
FROM (
  SELECT s.range AS shard,
         (s.range * 100 + r.range) AS doc_id,
         ((s.range * 100 + r.range) * {_MULT}) % 97 + 3 AS token_count
  FROM range(8) s, range(100) r
)
GROUP BY shard
""",
    tags=("source", "custom"),
    doc=(
        "S8: custom Python Data Source (Spark 4 API) — 8 deterministic "
        "shards read executor-side, aggregated per shard."
    ),
)
def custom_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register + scan the synthetic source; per-shard aggregate."""
    spark.dataSource.register(SyntheticDocsDataSource())
    df = (
        spark.read.format("synthetic_docs")
        .option("rows_per_shard", "100")
        .option("shards", "8")
        .load()
    )
    return df.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("token_count").alias("total_tokens")
    )
