"""Sinks S4–S7 (SURVEY.md §2.1).

- JDBC: replaces the reference's hand-built DDL + row-tuple INSERT loop
  (``/root/reference/dags/my_data_pipeline.py:91-116``) with
  ``df.write.jdbc`` — Spark derives DDL, batches, and runs one
  transaction per partition in parallel (the reference is single-
  connection sequential, ``:135,173-175``).
- Parquet: the 100 TB-native sink — date-partitioned columnar files so
  downstream scans get partition pruning.
- Report: the email summary (``:178-231``) as a pure text renderer over
  a collected summary DataFrame + an injectable transport (no hardcoded
  SMTP creds; the reference reads them from env at ``:183-184``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

# The reference's pandas-dtype→SQL-type map (my_data_pipeline.py:101):
# {'int64': 'INT', 'float64': 'FLOAT', 'object': 'VARCHAR(50)', ...}.
# Spark equivalent: per-column overrides for the JDBC writer.  We widen
# VARCHAR(50) → VARCHAR(256): silent 50-char truncation is a reference
# bug, not a feature.
#
# NOTE: createTableColumnTypes is parsed by SPARK's DDL parser before the
# JDBC dialect translates it for the target database — entries must be
# valid Spark SQL types ("DOUBLE", not the ANSI "DOUBLE PRECISION";
# r5 fix, caught by the Derby e2e once a double column was exercised).
_SPARK_TO_SQL = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "float": "REAL",
    "double": "DOUBLE",
    "string": "VARCHAR(256)",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",  # parquet without isAdjustedToUTC (Spark 4)
    "date": "DATE",
}


def jdbc_column_types(df: DataFrame) -> str:
    """Build ``createTableColumnTypes`` from the DataFrame schema."""
    parts = [
        f"{name} {_SPARK_TO_SQL[dtype]}"
        for name, dtype in df.dtypes
        if dtype in _SPARK_TO_SQL
    ]
    return ", ".join(parts)


def jdbc_options_from_env(env: dict | None = None) -> dict:
    """S5: connection options from the environment (the reference reads
    DB_HOST/DB_NAME/DB_USER/DB_PORT and a password file,
    my_data_pipeline.py:119-140; it also hardcodes an API token at :34 —
    never replicated here).  Returns JDBC options; raises KeyError on
    missing required vars rather than silently connecting wrong."""
    import os as _os

    e = env if env is not None else _os.environ
    host, name, user, port = e["DB_HOST"], e["DB_NAME"], e["DB_USER"], e.get("DB_PORT", "5432")
    opts = {
        "url": f"jdbc:postgresql://{host}:{port}/{name}",
        "user": user,
    }
    pw_file = e.get("DB_PASSWORD_FILE")
    if pw_file:
        with open(pw_file) as fh:
            opts["password"] = fh.read().strip()
    elif "DB_PASSWORD" in e:
        opts["password"] = e["DB_PASSWORD"]
    return opts


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict | None = None,
    batchsize: int = 10_000,
) -> None:
    """S4: JDBC sink.  DDL/batching/transactions handled per partition by
    Spark — no psycopg2 row loops (my_data_pipeline.py:112-115)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("createTableColumnTypes", jdbc_column_types(df))
        .options(**(properties or {}))
        .mode(mode)
        .save()
    )


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """The scale-native sink: partition directories give downstream
    readers static + dynamic partition pruning for free."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_compacted_parquet(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Small-files-safe sink: bound file sizes from above with
    ``maxRecordsPerFile`` (Spark splits a task's output into multiple
    files once the cap is hit) and, optionally, from below by coalescing
    to ``num_partitions`` first.  At 100 TB the failure mode is millions
    of KB-sized files (one per task of an over-parallel stage) — listing
    and opening them dominates the NEXT job's runtime, so compaction
    belongs in the sink, not in a cleanup pass."""
    out = df.coalesce(num_partitions) if num_partitions else df
    (
        out.write.option("maxRecordsPerFile", max_records_per_file)
        .mode(mode)
        .parquet(path)
    )


def render_report(title: str, summaries: dict[str, list[tuple]]) -> str:
    """S6: plain-text summary report (the email body of
    my_data_pipeline.py:199-216), rendered from already-collected rows —
    the ONLY place engine data reaches the driver."""
    lines = [title, "=" * len(title), ""]
    for table_name, rows in summaries.items():
        lines.append(f"-- {table_name} --")
        for row in rows:
            lines.append("  " + " | ".join(str(v) for v in row))
        lines.append("")
    return "\n".join(lines)


def file_transport(directory: str) -> Callable[[str, str], None]:
    """S6 dev-default transport: each report lands as a file named after
    the recipient under ``directory`` (mkdir'd on first use) — the
    maildir-style stand-in for the reference's SMTP send
    (my_data_pipeline.py:190-194) in environments with no mail relay.
    Production injects an smtplib/API closure instead."""
    import os as _os
    import re as _re

    def _send(recipient: str, body: str) -> None:
        _os.makedirs(directory, exist_ok=True)
        fname = _re.sub(r"[^A-Za-z0-9_.@-]", "_", recipient) + ".txt"
        with open(_os.path.join(directory, fname), "w") as fh:
            fh.write(f"To: {recipient}\n\n{body}")

    return _send


def smtp_transport(
    host: str,
    port: int = 25,
    sender: str = "reports@localhost",
) -> Callable[[str, str], None]:
    """S6 production transport: an smtplib closure for :func:`send_report`
    (the reference sends via SMTP inside the DAG, my_data_pipeline.py:
    190-194 — here the relay endpoint is injected, never hardcoded, and
    credentials stay out of the engine entirely: wrap this closure if the
    relay needs auth, sourcing secrets from env/secret stores).  The
    message is a minimal RFC-5322 text mail whose subject is the first
    body line."""
    import smtplib
    from email.message import EmailMessage

    def _send(recipient: str, body: str) -> None:
        msg = EmailMessage()
        msg["From"] = sender
        msg["To"] = recipient
        msg["Subject"] = (body.splitlines() or ["report"])[0][:120]
        msg.set_content(body)
        with smtplib.SMTP(host, port, timeout=30) as relay:
            relay.send_message(msg)

    return _send


def send_report(
    body: str,
    recipient: str,
    transport: Callable[[str, str], None] | None = None,
) -> None:
    """S6: transport is injected (tests pass a collector; production
    passes an smtplib closure with env-sourced credentials;
    ``file_transport`` is the no-relay dev default)."""
    if transport is None:
        raise NotImplementedError(
            "no default transport: inject an smtplib/API closure or "
            "file_transport(dir) (credentials from env, never literals)"
        )
    transport(recipient, body)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Layout-optimized sink: range-partition on the cluster keys, sort
    rows within each output task, write one file per range.  Each file
    then holds a narrow, near-disjoint key range, so parquet row-group
    min/max statistics prune most files for selective key-range scans —
    the poor-engine's Z-order, and the difference between touching 1/N
    and N/N of a 100 TB table on a range predicate."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value(xcol, ycol, bits: int = 21):
    """Interleave the low ``bits`` of two non-negative integer columns
    into a Z-order (Morton) value — bit i of x lands at 2i, bit i of y
    at 2i+1.  Pure JVM-side bit arithmetic (a fixed sum of shift/mask
    terms, whole-stage-codegen friendly)."""
    from pyspark.sql import functions as F

    x = xcol.cast("long")
    y = ycol.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int = 8,
    grid_bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Two-dimensional layout-optimized sink: range-partition + sort on
    the Z-order (Morton) interleaving of two keys, so EVERY file holds a
    small rectangle of the (x, y) key space and parquet min/max stats
    prune files for selective predicates on EITHER column — the property
    a single-column sort only gives to its leading key.  The standard
    lakehouse OPTIMIZE ZORDER BY technique, from first principles on
    plain parquet.

    Both columns are min-max normalized onto the same ``grid_bits`` grid
    before interleaving — raw interleaving of unequal-width domains
    degenerates to a sort on whichever key has the spare high bits (the
    reason production Z-ORDER implementations interleave range-partition
    ids, not raw values).  The min/max stats pass is one broadcast-scalar
    aggregate.  Caller contract: numeric columns."""
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(x_col).cast("double").alias("_xmin"),
        F.max(x_col).cast("double").alias("_xmax"),
        F.min(y_col).cast("double").alias("_ymin"),
        F.max(y_col).cast("double").alias("_ymax"),
    )
    top = (1 << grid_bits) - 1

    def scale(col, lo, hi):
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1.0))
        return F.floor((col.cast("double") - F.col(lo)) * top / span).cast("long")

    with_z = df.crossJoin(F.broadcast(stats)).withColumn(
        "_z",
        zorder_value(
            scale(F.col(x_col), "_xmin", "_xmax"),
            scale(F.col(y_col), "_ymin", "_ymax"),
            bits=grid_bits,
        ),
    )
    (
        with_z.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", "_xmin", "_xmax", "_ymin", "_ymax")
        .write.mode(mode)
        .parquet(path)
    )
