#!/usr/bin/env python
"""Measure the two round-8 lakehouse table services at sf1.

1. ZONE MAPS: documents written id-range-clustered (repartitionByRange
   on doc_id, hive-partitioned by lang).  A 10%-of-ids range read with
   ``stats_filter`` should touch ~10% of the files; compare wall time
   and files-read vs the same logical read without skipping.
2. COMPACTION: the same table written as N_EPOCHS append epochs (the
   streaming small-files shape), full-scan timed before and after
   ``compact_partitions``.

Prints one JSON line for BASELINE.md.  Usage:
    python scripts/lakehouse_bench.py [src_parquet_dir] [n_epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineer_coder_spark.io.acid_table import (  # noqa: E402
    compact_partitions,
    current_manifest,
    files_selected,
    read_table,
    replace_partitions,
)
from data_engineer_coder_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 3)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "perfdata/sf1"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark("lakehouse-bench", cpus="32")
    docs = spark.read.parquet(os.path.join(src, "documents.parquet")).select(
        "doc_id", "lang", "text"
    )
    n = docs.count()
    lo, hi = int(n * 0.45), int(n * 0.55) - 1  # 10% id band
    base = tempfile.mkdtemp(prefix="lakehouse_bench_")
    out: dict = {"metric": "lakehouse_services", "src": src, "n_docs": n}
    try:
        # --- zone maps -------------------------------------------------
        zm_root = os.path.join(base, "zm")
        replace_partitions(
            docs.repartitionByRange(32, "doc_id"), zm_root, ["lang"], "t1"
        )

        def pred(stats):
            s = stats.get("doc_id")
            return s is None or (s[1] >= lo and s[0] <= hi)

        sel = files_selected(zm_root, stats_filter=pred)
        n_files = sum(len(fs) for fs in sel.values())
        n_read = sum(1 for fs in sel.values() for _, k in fs if k)
        # warm both paths once (JIT/footer cache), then measure
        for _ in range(1):
            read_table(spark, zm_root).filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
            ).agg(F.sum(F.length("text"))).collect()
        full, t_full = timed(
            lambda: read_table(spark, zm_root)
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
            .agg(F.sum(F.length("text")))
            .collect()[0][0]
        )
        skip, t_skip = timed(
            lambda: read_table(spark, zm_root, stats_filter=pred)
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
            .agg(F.sum(F.length("text")))
            .collect()[0][0]
        )
        assert full == skip, (full, skip)
        out["zone_maps"] = {
            "files_total": n_files,
            "files_read": n_read,
            "t_no_skip_s": t_full,
            "t_skip_s": t_skip,
        }
        # --- compaction ------------------------------------------------
        cp_root = os.path.join(base, "cp")
        from data_engineer_coder_spark.io.acid_table import append_partitions

        for e in range(n_epochs):
            append_partitions(
                docs.filter(F.col("doc_id") % n_epochs == e),
                cp_root,
                ["lang"],
                f"e{e}",
            )
        man = current_manifest(cp_root)
        dirs_before = sum(len(v) for v in man["partitions"].values())
        pre, t_pre = timed(
            lambda: read_table(spark, cp_root)
            .agg(F.sum(F.length("text")))
            .collect()[0][0]
        )
        _, t_compact = timed(lambda: compact_partitions(spark, cp_root, "c1"))
        man2 = current_manifest(cp_root)
        dirs_after = sum(len(v) for v in man2["partitions"].values())
        post, t_post = timed(
            lambda: read_table(spark, cp_root)
            .agg(F.sum(F.length("text")))
            .collect()[0][0]
        )
        assert pre == post, (pre, post)
        out["compaction"] = {
            "n_epochs": n_epochs,
            "dirs_before": dirs_before,
            "dirs_after": dirs_after,
            "t_scan_before_s": t_pre,
            "t_scan_after_s": t_post,
            "t_compact_s": t_compact,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
