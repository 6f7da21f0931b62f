"""ACID-ish parquet table: exactly-once append / overwrite-by-partition.

The reference's load step is ``CREATE TABLE IF NOT EXISTS`` + blind
append (``/root/reference/dags/my_data_pipeline.py:106-115``): a daily
rerun inserts the same rows twice — the duplication bug SURVEY.md §2.7
documents, and the one ``dedup_exact`` exists to repair after the fact.
This module replaces that story at the SINK: a re-run of the same
logical write is a no-op, a crashed write is invisible, and readers
never observe a half-written table.

Protocol (single-writer per table, with commit-race rebasing; the
public Delta/Iceberg idea re-derived on nothing but parquet + POSIX
rename — no extra jars):

    root/
      _manifests/v000001.json     <- the COMMIT POINT (atomic rename)
      _staging/<txid>/day=.../    <- parquet data, invisible until
                                     a manifest references it

1. ``replace_partitions(df, root, cols, txid)`` /
   ``append_partitions(df, root, cols, txid)`` write df (hive-
   partitioned by ``cols``) under ``_staging/<txid>/`` — crash here
   leaves orphan files no manifest references: invisible.
2. They then commit manifest v(N+1).  Each manifest maps every live
   partition to the LIST of staging directories that make it up:
   *replace* resets a partition's list to this write's directory,
   *append* adds to it — so a multi-epoch streaming append never
   erases earlier epochs that touched the same partition value.  The
   manifest lands via write-to-temp + ``os.link`` (EEXIST on
   collision).  On a collision the loser RE-READS the newest manifest
   and re-merges its own delta on top before retrying, so two racing
   writers both land and neither's partitions/txids are lost.
3. If ``txid`` is already in the committed set, the call returns
   without writing anything — EXACTLY-ONCE under retries: the Airflow
   "task succeeded but the scheduler retried it anyway" rerun that
   duplicates the reference's table becomes a no-op here.

Each manifest also records the write's SCHEMA (json) — later writes
may add columns (schema evolution; ``read_table`` unions by name with
nulls for missing columns) — and every version stays on disk, so
``read_table(..., version=N)`` is a pinned time-travel read and
``table_history`` exposes the commit log as a DataFrame.

``read_table`` resolves the requested manifest and reads ONLY the
referenced directories (manifest-level partition pruning: a
``partition_filter`` skips directories before any file is listed —
at 100 TB the manifest is a few KB while the table is billions of
files).  ``vacuum`` deletes data directories the current manifest no
longer references (orphans from crashes + replaced partition
versions); vacuuming invalidates time travel to versions that needed
the removed files, same trade Delta's ``VACUUM`` makes.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_STAGING_DIR = "_staging"
_V_RE = re.compile(r"^v(\d{6})\.json$")


def _manifest_versions(root: str) -> list[tuple[int, str]]:
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        m = _V_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(mdir, name)))
    return sorted(out)


def _empty_manifest() -> dict:
    return {"version": 0, "partitions": {}, "txids": []}


def manifest_at(root: str, version: int | None = None) -> dict:
    """Manifest at ``version`` (newest when None), or the empty state."""
    versions = _manifest_versions(root)
    if not versions:
        if version not in (None, 0):
            raise ValueError(f"no manifest v{version} at {root}")
        return _empty_manifest()
    if version is None:
        path = versions[-1][1]
    else:
        by_v = dict(versions)
        if version == 0:
            return _empty_manifest()
        if version not in by_v:
            raise ValueError(f"no manifest v{version} at {root}")
        path = by_v[version]
    with open(path) as fh:
        return json.load(fh)


def current_manifest(root: str) -> dict:
    """Newest committed manifest, or the empty table state."""
    return manifest_at(root, None)


def _dirs(val) -> list[str]:
    """Partition-map values: list of staging dirs (legacy str accepted)."""
    return [val] if isinstance(val, str) else list(val)


def _discover_partition_dirs(base: str, n_cols: int) -> list[str]:
    """Relative hive-style partition paths (``a=1/b=2``) under ``base``."""
    found: list[str] = []

    def walk(cur: str, rel: list[str], depth: int) -> None:
        if depth == n_cols:
            found.append("/".join(rel))
            return
        for name in sorted(os.listdir(cur)):
            if "=" in name and os.path.isdir(os.path.join(cur, name)):
                walk(os.path.join(cur, name), rel + [name], depth + 1)

    walk(base, [], 0)
    return found


def _merge(prev: dict, new_parts: list[str], stage_rel: str, txid: str,
           mode: str, partition_cols: list[str], schema_json: str) -> dict:
    """Build the next manifest from ``prev`` + this transaction's delta."""
    partitions = {k: _dirs(v) for k, v in prev["partitions"].items()}
    for p in new_parts:
        loc = f"{stage_rel}/{p}"
        if mode == "replace":
            partitions[p] = [loc]
        else:  # append: accumulate epochs, never erase earlier ones
            partitions.setdefault(p, []).append(loc)
    return {
        "version": prev["version"] + 1,
        "partitions": partitions,
        "txids": prev["txids"] + [txid],
        "partition_cols": partition_cols,
        "schema": schema_json,
    }


def _commit(root: str, prev: dict, new_parts: list[str], stage_rel: str,
            txid: str, mode: str, partition_cols: list[str],
            schema_json: str) -> dict:
    """Atomically publish the next manifest version.

    Write to a temp file, hard-link to the final name (fails with
    EEXIST if another writer claimed the version), unlink the temp —
    readers always see a complete file.  On a version collision the
    loser RE-READS the newest manifest and re-merges this
    transaction's delta on top of it (a rebase that keeps BOTH
    writers' partitions and txids), rather than re-publishing a
    manifest built from stale state.
    """
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    while True:
        if txid in prev["txids"]:
            return prev  # a racing retry of the same txid already landed
        manifest = _merge(prev, new_parts, stage_rel, txid, mode,
                          partition_cols, schema_json)
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        final = os.path.join(mdir, f"v{manifest['version']:06d}.json")
        try:
            os.link(tmp, final)
            os.unlink(tmp)
            return manifest
        except FileExistsError:
            os.unlink(tmp)
            prev = current_manifest(root)  # rebase on the racing winner


def _stage_and_commit(
    df: DataFrame,
    root: str,
    partition_cols: list[str],
    txid: str,
    mode: str,
    _crash_before_commit: Callable[[], None] | None,
) -> dict:
    if not partition_cols:
        raise ValueError("at least one partition column is required")
    prev = current_manifest(root)
    if txid in prev["txids"]:
        return prev  # re-run of a committed write: exactly-once no-op
    stage_rel = f"{_STAGING_DIR}/{txid}"
    stage_abs = os.path.join(root, stage_rel)
    (
        df.write.partitionBy(*partition_cols)
        .mode("overwrite")  # a re-STAGE after a pre-commit crash restages cleanly
        .parquet(stage_abs)
    )
    new_parts = _discover_partition_dirs(stage_abs, len(partition_cols))
    if _crash_before_commit is not None:
        _crash_before_commit()
    schema_json = df.drop(*partition_cols).schema.json()
    return _commit(root, prev, new_parts, stage_rel, txid, mode,
                   partition_cols, schema_json)


def replace_partitions(
    df: DataFrame,
    root: str,
    partition_cols: list[str],
    txid: str,
    _crash_before_commit: Callable[[], None] | None = None,
) -> dict:
    """Exactly-once OVERWRITE of the partitions present in ``df``.

    Every partition value appearing in ``df`` maps to this write's
    directory alone afterwards; untouched partitions keep their data.
    Returns the committed manifest (or the already-committed one if
    ``txid`` was seen before — the idempotent re-run path).
    ``_crash_before_commit`` is a test seam: raising from it simulates
    a writer dying after staging but before the commit rename.
    """
    return _stage_and_commit(df, root, partition_cols, txid, "replace",
                             _crash_before_commit)


def append_partitions(
    df: DataFrame,
    root: str,
    partition_cols: list[str],
    txid: str,
    _crash_before_commit: Callable[[], None] | None = None,
) -> dict:
    """Exactly-once APPEND: this write's rows ADD to each partition.

    The manifest accumulates one staging directory per transaction per
    partition value, so epoch N+1 of a streaming append never erases
    epoch N's rows for a partition value both contain — the semantics a
    micro-batch sink needs (``write_stream_exactly_once``).  Idempotent
    under txid replay exactly like :func:`replace_partitions`.
    """
    return _stage_and_commit(df, root, partition_cols, txid, "append",
                             _crash_before_commit)


def read_table(
    spark: SparkSession,
    root: str,
    partition_filter: Callable[[dict[str, str]], bool] | None = None,
    version: int | None = None,
) -> DataFrame:
    """Read the table at a committed version (newest when ``version``
    is None — pass an older number for a pinned time-travel read).

    ``partition_filter`` receives each partition's ``{col: value}``
    dict (hive-encoded strings) and prunes AT THE MANIFEST — directories
    it rejects are never listed, let alone scanned.  Partition columns
    come back as string columns (cast downstream as needed).  Reads
    union by name with null fill, so versions written before a column
    was added surface it as null — add-column schema evolution.
    """
    man = manifest_at(root, version)
    parts = []
    for pkey, val in sorted(man["partitions"].items()):
        kv = dict(seg.split("=", 1) for seg in pkey.split("/"))
        if partition_filter is not None and not partition_filter(kv):
            continue
        for rel in _dirs(val):
            pdf = spark.read.parquet(os.path.join(root, rel))
            for col, v in kv.items():
                pdf = pdf.withColumn(col, F.lit(v))
            parts.append(pdf)
    if not parts:
        raise ValueError(f"no partitions selected from {root} (v{man['version']})")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def table_history(spark: SparkSession, root: str) -> DataFrame:
    """The commit log as a DataFrame: one row per manifest version with
    the committing txid, live-partition count, total staging-dir count,
    and the number of columns in the committed schema — the
    ``DESCRIBE HISTORY`` surface of this table format."""
    rows = []
    for v, path in _manifest_versions(root):
        with open(path) as fh:
            man = json.load(fh)
        schema_fields = None
        if man.get("schema"):
            schema_fields = len(json.loads(man["schema"]).get("fields", []))
        rows.append(
            (
                v,
                man["txids"][-1] if man["txids"] else None,
                len(man["partitions"]),
                sum(len(_dirs(x)) for x in man["partitions"].values()),
                schema_fields,
            )
        )
    return spark.createDataFrame(
        rows, "version int, txid string, n_partitions int, n_dirs int, n_cols int"
    )


def vacuum(root: str) -> list[str]:
    """Delete staging directories the CURRENT manifest doesn't reference
    (crash orphans + superseded partition versions).  Returns the
    removed relative paths.  Safe only under the single-writer
    assumption; invalidates time travel to versions whose data lived
    only in the removed directories (the Delta ``VACUUM`` trade)."""
    import shutil

    man = current_manifest(root)
    live = {
        rel.split("/")[1]
        for val in man["partitions"].values()
        for rel in _dirs(val)
        if rel.startswith(_STAGING_DIR)
    }
    sdir = os.path.join(root, _STAGING_DIR)
    removed = []
    if os.path.isdir(sdir):
        for txdir in sorted(os.listdir(sdir)):
            if txdir not in live:
                shutil.rmtree(os.path.join(sdir, txdir))
                removed.append(f"{_STAGING_DIR}/{txdir}")
    return removed
