"""Structured Streaming plumbing (SURVEY.md §2.9 T1/T8).

The reference's "stream" is a daily Airflow re-ingest of the same feed
(``/root/reference/dags/airflow_dag.py:27``, ``catchup=False`` ``:29``).
Structured Streaming generalizes it: ``readStream`` over a landing
directory with ``trigger(availableNow=True)`` IS the daily batch run,
and the same code keeps working at second-level latency.

Batch-first design: every transformation in ``windows.py``/``stateful.py``
is a pure ``DataFrame → DataFrame`` — callers pass either
``spark.read`` or ``spark.readStream`` input, Catalyst plans both.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import _nanos_as_long


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events table (micro-batch parquet source).

    Mirrors ``io.tables.table``'s TIMESTAMP(NANOS) handling: the stream
    reader needs an explicit schema, so we take the raw (nanos-as-long)
    schema from a static read and convert ts to a real timestamp.
    """
    path = os.path.join(sf_dir, "events.parquet")
    with _nanos_as_long(spark):
        raw_schema = spark.read.parquet(path).schema
        # The file-stream source wants a directory: stream the sf_dir with a
        # glob pinned to the events file.
        sdf = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if dict((f.name, f.dataType.simpleString()) for f in raw_schema.fields).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return sdf


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "complete",
    timeout_s: int = 300,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink contents as a batch DataFrame.

    The memory sink is a test/driver harness: production sinks are
    ``foreachBatch`` → JDBC (S4 twin) or files (T8).
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    if not finished:
        # Timed out: reading the sink now would silently return a partial
        # (or empty) mid-stream snapshot. Stop the query and fail loudly.
        q.stop()
        err = q.exception()
        raise TimeoutError(
            f"streaming query {name!r} did not finish within {timeout_s}s"
            + (f"; underlying error: {err}" if err else "")
        )
    spark = sdf.sparkSession
    return spark.table(name)


def write_foreach_batch(
    sdf: DataFrame,
    batch_fn,
    checkpoint: str | None = None,
    output_mode: str = "update",
):
    """T8: ``foreachBatch`` streaming sink — each micro-batch DataFrame is
    handed to ``batch_fn(df, epoch_id)`` (e.g. a JDBC append, matching
    the reference's per-run table load, my_data_pipeline.py:163-176).

    ``output_mode``: 'update' for keyed upsert sinks, 'complete' for
    full-rewrite sinks, 'append' only for non-aggregated or watermarked
    plans (Spark rejects append on unwatermarked aggregations).
    """
    ckpt = checkpoint or tempfile.mkdtemp(prefix="ckpt_")
    return (
        sdf.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
