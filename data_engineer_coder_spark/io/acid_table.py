"""ACID-ish parquet table: exactly-once overwrite-by-partition.

The reference's load step is ``CREATE TABLE IF NOT EXISTS`` + blind
append (``/root/reference/dags/my_data_pipeline.py:106-115``): a daily
rerun inserts the same rows twice — the duplication bug SURVEY.md §2.7
documents, and the one ``dedup_exact`` exists to repair after the fact.
This module replaces that story at the SINK: a re-run of the same
logical write is a no-op, a crashed write is invisible, and readers
never observe a half-written table.

Protocol (single-writer per table; the public Delta/Iceberg idea
re-derived on nothing but parquet + POSIX rename — no extra jars):

    root/
      _manifests/v000001.json     <- the COMMIT POINT (atomic rename)
      _staging/<txid>/day=.../    <- parquet data, invisible until
                                     a manifest references it

1. ``replace_partitions(df, root, cols, txid)`` writes df (hive-
   partitioned by ``cols``) under ``_staging/<txid>/`` — crash here
   leaves orphan files no manifest references: invisible.
2. It then writes manifest v(N+1): previous partition map, minus the
   partitions present in this write, plus the new mappings; records
   ``txid`` in the committed set.  The manifest lands via write-to-temp
   + ``os.replace`` — atomic on POSIX, so a reader sees either v(N) or
   v(N+1), never a torn state.  Version claiming uses ``os.link``
   (EEXIST on collision) so two racing writers cannot silently clobber
   one another's commit.
3. If ``txid`` is already in the committed set, the call returns
   without writing anything — EXACTLY-ONCE under retries: the Airflow
   "task succeeded but the scheduler retried it anyway" rerun that
   duplicates the reference's table becomes a no-op here.

``read_table`` resolves the newest manifest and reads ONLY the
referenced directories (manifest-level partition pruning: a
``partition_filter`` skips directories before any file is listed —
at 100 TB the manifest is a few KB while the table is billions of
files).  ``vacuum`` deletes data directories the current manifest no
longer references (orphans from crashes + replaced partition versions).
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


def current_manifest(root: str) -> dict:
    """Newest committed manifest, or the empty table state."""
    versions = _manifest_versions(root)
    if not versions:
        return {"version": 0, "partitions": {}, "txids": []}
    with open(versions[-1][1]) as fh:
        return json.load(fh)


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


def _commit(root: str, manifest: dict) -> None:
    """Atomically publish ``manifest`` as the next version.

    Write to a temp file, hard-link to the final name (fails with
    EEXIST if another writer claimed the version — retry on the next
    number), unlink the temp.  Readers always see a complete file.
    """
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    version = manifest["version"]
    while True:
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        final = os.path.join(mdir, f"v{version:06d}.json")
        try:
            os.link(tmp, final)
            os.unlink(tmp)
            return
        except FileExistsError:
            # another writer claimed this version: rebase on top of it
            os.unlink(tmp)
            version += 1
            manifest["version"] = version


def replace_partitions(
    df: DataFrame,
    root: str,
    partition_cols: list[str],
    txid: str,
    _crash_before_commit: Callable[[], None] | None = None,
) -> dict:
    """Exactly-once overwrite of the partitions present in ``df``.

    Returns the committed manifest (or the already-committed one if
    ``txid`` was seen before — the idempotent re-run path).
    ``_crash_before_commit`` is a test seam: raising from it simulates
    a writer dying after staging but before the commit rename.
    """
    if not partition_cols:
        raise ValueError("replace_partitions requires at least one partition column")
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
    partitions = dict(prev["partitions"])
    for p in new_parts:
        partitions[p] = f"{stage_rel}/{p}"
    manifest = {
        "version": prev["version"] + 1,
        "partitions": partitions,
        "txids": prev["txids"] + [txid],
        "partition_cols": partition_cols,
    }
    _commit(root, manifest)
    return manifest


def read_table(
    spark: SparkSession,
    root: str,
    partition_filter: Callable[[dict[str, str]], bool] | None = None,
) -> DataFrame:
    """Read the table at its newest committed version.

    ``partition_filter`` receives each partition's ``{col: value}``
    dict (hive-encoded strings) and prunes AT THE MANIFEST — directories
    it rejects are never listed, let alone scanned.  Partition columns
    come back as string columns (cast downstream as needed).
    """
    man = current_manifest(root)
    parts = []
    for pkey, rel in sorted(man["partitions"].items()):
        kv = dict(seg.split("=", 1) for seg in pkey.split("/"))
        if partition_filter is not None and not partition_filter(kv):
            continue
        pdf = spark.read.parquet(os.path.join(root, rel))
        for col, val in kv.items():
            pdf = pdf.withColumn(col, F.lit(val))
        parts.append(pdf)
    if not parts:
        raise ValueError(f"no partitions selected from {root} (v{man['version']})")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def vacuum(root: str) -> list[str]:
    """Delete staging directories the CURRENT manifest doesn't reference
    (crash orphans + superseded partition versions).  Returns the
    removed relative paths.  Safe only under the single-writer
    assumption this table makes everywhere else."""
    import shutil

    man = current_manifest(root)
    live = {rel.split("/")[1] for rel in man["partitions"].values() if rel.startswith(_STAGING_DIR)}
    sdir = os.path.join(root, _STAGING_DIR)
    removed = []
    if os.path.isdir(sdir):
        for txdir in sorted(os.listdir(sdir)):
            if txdir not in live:
                shutil.rmtree(os.path.join(sdir, txdir))
                removed.append(f"{_STAGING_DIR}/{txdir}")
    return removed
