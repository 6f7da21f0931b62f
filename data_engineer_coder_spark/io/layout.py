"""Persisted physical-layout records for bucketed standing tables.

A hash-bucketed table's bucket count is baked into its standing rows:
every writer, reader, delete, and compaction must derive the SAME
count, or manifest-level pruning silently reads (or rewrites) the wrong
directories.  Round 13 shipped that count as module constants duplicated
across three modules (`streaming/bm25_ingest._TOK_BUCKETS`,
`streaming/core._BM25_TOK_BUCKETS`, `operators/retrieval_delete` — the
VERDICT r13 #1 hazard); this module makes the layout TABLE METADATA
instead, extending the ``_df_table_buckets`` precedent (ADVICE r10, the
exact-df matview) to every bucketed retrieval artifact:

- ``table_config(root, defaults)`` — read the table's ``_config.json``
  sidecar, creating it atomically from ``defaults`` on first write.
  Creation is write-to-temp + ``os.replace`` (atomic like the manifest
  commit); a concurrent creator losing the race re-reads the winner.
- ``read_table_config(root)`` — read-only lookup for paths that must
  never create a table (readers, deletes); raises if the table has no
  layout record, because GUESSING a bucket count is exactly the silent
  wrong-prune failure this module exists to kill.
- ``pow2_buckets(n_rows, target_rows)`` — the corpus-scaled default: a
  power of two sized so each bucket holds ≈ ``target_rows``.  Power of
  two keeps layouts comparable across decades and makes the min/max
  clamps explicit.  At the driver fixture scales (sf ≤ 0.1) the clamp
  floor keeps every layout at the oracle-replayable 16, so DuckDB
  oracles that hash ``% 16`` stay valid; the scale path (ov-sf1+) gets
  wider layouts, which is what lets a takedown's partition_filter prune
  instead of rewriting 16/16 buckets (VERDICT r13 tenth campaign).
"""

from __future__ import annotations

import json
import os
import tempfile

_CONFIG = "_config.json"


def table_config(root: str, defaults: dict) -> dict:
    """The table's layout record, creating it from ``defaults`` if the
    table has none yet.  Existing records win entirely — a caller
    re-tuning a default across restarts cannot re-split standing rows
    across two layouts.  New keys in ``defaults`` that an existing
    record lacks are added (schema-evolving the sidecar is safe; the
    keys a layout already pinned never change)."""
    cfg_path = os.path.join(root, _CONFIG)
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        missing = {k: v for k, v in defaults.items() if k not in cfg}
        if missing:
            cfg.update(missing)
            _atomic_write(root, cfg_path, cfg)
        return cfg
    os.makedirs(root, exist_ok=True)
    _atomic_write(root, cfg_path, dict(defaults))
    with open(cfg_path) as f:  # re-read: a racing creator may have won
        return json.load(f)


def _atomic_write(root: str, cfg_path: str, cfg: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=root, prefix="_config.")
    with os.fdopen(fd, "w") as f:
        json.dump(cfg, f, indent=1, sort_keys=True)
    if os.path.exists(cfg_path):
        os.unlink(tmp)  # lost the race — the winner's layout stands
    else:
        os.replace(tmp, cfg_path)


def read_table_config(root: str) -> dict:
    """Read-only layout lookup for readers/deletes/compactions: the
    table must already have a record (its creator wrote one), because a
    guessed bucket count prunes the wrong directories SILENTLY."""
    cfg_path = os.path.join(root, _CONFIG)
    if not os.path.exists(cfg_path):
        raise ValueError(
            f"no _config.json layout record at {root} — the table was "
            "written without persisting its bucket layout; readers must "
            "not guess one"
        )
    with open(cfg_path) as f:
        return json.load(f)


def align_bucketed_write(df, bucket_cols, sort_cols, parts: int,
                         n_buckets: int | None = None):
    """Co-locate each hive-partition value into as few tasks as possible
    before a ``partitionBy(bucket_cols)`` write.

    A partitioned write over a frame whose tasks each hold rows of MANY
    bucket values emits one file per (task × bucket) — at a
    corpus-scaled layout that is tasks × thousands of small files per
    commit, and both the write and every later whole-table read pay for
    each one.  Two alignment strategies, picked by the parts/buckets
    ratio:

    - ``parts <= n_buckets`` (one file per bucket suffices): HASH
      repartition on the bucket columns.  Every bucket's rows land in
      exactly one task, the write stages exactly one file per bucket,
      and ``sortWithinPartitions`` makes that file's footer cover the
      bucket's full ``sort_cols`` range — the same files a range
      partition would produce, for ONE evaluation of the input instead
      of two (``repartitionByRange`` first evaluates the whole frame
      again just to sample range boundaries; for the postings bulk
      build that sampling pass is a second full corpus tokenization —
      guide §2.4: remove shuffles/passes outright).  Because the
      bucket count scales with the corpus (``pow2_buckets``) while
      ``write_parts`` floors at it, this is the taken path at every
      measured decade (sf0.001 → ov-sf100).
    - ``parts > n_buckets`` (buckets outgrow the target file size —
      past the ``pow2_buckets`` hi clamp): range-partition on
      (bucket, sort) so the extra splits land INSIDE buckets as
      disjoint ``sort_cols`` ranges, which is exactly the file-level
      zone-map tier the serving reads prune on.

    ``parts`` should scale with the frame's SIZE (rows /
    target-file-rows), never with cluster width alone.  Callers that
    do not know the bucket count keep the (always-correct) range
    path."""
    cols = [*bucket_cols, *sort_cols]
    parts = max(1, int(parts))
    if n_buckets is not None and parts <= int(n_buckets):
        return df.repartition(parts, *bucket_cols).sortWithinPartitions(*cols)
    return df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)


def align_epoch_append(df, bucket_cols, sort_cols, parts: int):
    """Append-side twin of :func:`align_bucketed_write` for the small
    per-epoch frames streaming gates commit: HASH-repartition on the
    bucket columns (no range-sampling pass over the frame), so every
    bucket's batch rows land in exactly one task and the append stages
    exactly one file per TOUCHED bucket — instead of one per
    (task × bucket), which at a corpus-scaled layout multiplies every
    epoch's file count by the task count.  Rows sort by ``sort_cols``
    within the task so each staged file still carries usable footer
    stats."""
    return (
        df.repartition(max(1, int(parts)), *bucket_cols)
        .sortWithinPartitions(*bucket_cols, *sort_cols)
    )


def write_parts(n_rows: int, n_buckets: int, rows_per_file: int = 2_000_000) -> int:
    """Task count for :func:`align_bucketed_write`: enough splits that
    no file exceeds ≈ ``rows_per_file`` rows, floored at the bucket
    count so every bucket can get its own task (and its own file) once
    the corpus outgrows a single file per bucket."""
    return max(int(n_buckets), -(-int(n_rows) // int(rows_per_file)))


def pow2_buckets(n_rows: int, target_rows: int, lo: int = 16, hi: int = 4096) -> int:
    """Smallest power of two ≥ ``n_rows / target_rows``, clamped to
    [lo, hi].  ``lo`` pins the driver-fixture scales to the
    oracle-replayable layout; ``hi`` bounds per-commit directory count
    (a commit writes ≤ one dir per bucket)."""
    want = max(1, -(-int(n_rows) // int(target_rows)))
    b = 1
    while b < want:
        b <<= 1
    return max(lo, min(hi, b))
