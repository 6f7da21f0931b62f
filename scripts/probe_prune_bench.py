#!/usr/bin/env python
"""Probe-pruning decade: does the ingest gate's per-epoch index probe
cost track INDEX size or BATCH size?

Builds the gate's band-key index (same write path: bj-partitioned,
range-split files of ~``--file-rows`` rows, sorted by band_key) from N
docs at two fixture scales, then probes it with FIXED small batches and
reports, per (scale, probe size):

    total index files  |  files the probe READS (footer-range pruning)
    wall time of the pruned read

The claim under test (VERDICT r9 #1): with fine-grained files, files
read ∝ probe keys × epoch generations — INDEPENDENT of how many files
(and docs) the index holds, i.e. per-epoch probe cost stops tracking
corpus size in the continuous-ingestion regime (batch ≪ index).

Usage: python scripts/probe_prune_bench.py [small_dir big_dir [file_rows]]
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
    append_partitions,
    current_manifest,
    files_selected,
    read_table,
)
from data_engineer_coder_spark.io.tables import table  # noqa: E402
from data_engineer_coder_spark.operators.dedup import (  # noqa: E402
    band_key_array,
    minhash_signatures,
)
from data_engineer_coder_spark.session import get_spark  # noqa: E402
from data_engineer_coder_spark.streaming.core import band_range_hits  # noqa: E402

PROBE_DOCS = (2, 20)  # fixed probe batch sizes (docs)
EPOCHS = 3            # index generations, mirroring the gate harness


def build_bands_index(spark, sf_dir: str, root: str, file_rows: int) -> None:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = minhash_signatures(docs).localCheckpoint()
    bands = (
        sig.select("doc_id", F.explode(band_key_array()).alias("band_key"))
        .withColumn("bj", F.split("band_key", "_").getItem(0).cast("int"))
    )
    for e in range(EPOCHS):
        part = bands.filter(F.pmod("doc_id", F.lit(EPOCHS)) == e)
        nf = max(1, -(-part.count() // file_rows))
        append_partitions(
            part.repartitionByRange(nf, F.col("bj"), F.col("band_key"))
            .sortWithinPartitions("bj", "band_key"),
            root, ["bj"], f"epoch-{e}",
        )


def probe_keys(spark, sf_dir: str, n_docs: int) -> list[str]:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # deterministic small batch: the n LOWEST doc ids with a signature
    sig = minhash_signatures(docs).orderBy("doc_id").limit(n_docs)
    return sorted(
        r["band_key"]
        for r in sig.select(F.explode(band_key_array()).alias("band_key"))
        .distinct()
        .collect()
    )


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "perfdata/ov-sf1"
    big = sys.argv[2] if len(sys.argv) > 2 else "perfdata/ov-sf10"
    file_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    spark = get_spark("probe_prune_bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    rows = []
    for sf_dir in (small, big):
        tmp = tempfile.mkdtemp(prefix="ppb_")
        root = os.path.join(tmp, "bands")
        try:
            build_bands_index(spark, sf_dir, root, file_rows)
            man = current_manifest(root)
            n_files = sum(len(v) for v in man["dir_files"].values())
            n_rows = sum(f["rows"] for v in man["dir_files"].values() for f in v)
            for nd in PROBE_DOCS:
                keys = probe_keys(spark, sf_dir, nd)
                hit = band_range_hits(keys)("band_key")
                sel = files_selected(root, stats_filter=hit)
                n_read = sum(k for files in sel.values() for _, k in files)
                t0 = time.time()
                got = (
                    read_table(spark, root, stats_filter=hit)
                    .filter(F.col("band_key").isin(keys))
                    .count()
                )
                dt = time.time() - t0
                rows.append({
                    "fixture": os.path.basename(sf_dir),
                    "index_rows": n_rows,
                    "index_files": n_files,
                    "probe_docs": nd,
                    "probe_keys": len(keys),
                    "files_read": n_read,
                    "read_frac": round(n_read / n_files, 4),
                    "pruned_read_s": round(dt, 2),
                    "collisions": got,
                })
                print(json.dumps(rows[-1]))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print("\n| fixture | index rows | index files | probe docs | probe keys | files read | read frac | pruned read s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['fixture']} | {r['index_rows']} | {r['index_files']} | "
              f"{r['probe_docs']} | {r['probe_keys']} | {r['files_read']} | "
              f"{r['read_frac']} | {r['pruned_read_s']} |")
    print(json.dumps({"metric": "probe_prune_bench", "rows": rows}))


if __name__ == "__main__":
    main()
