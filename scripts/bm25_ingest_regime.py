#!/usr/bin/env python
"""Continuous-ingestion regime point for the streaming BM25 index gate.

The ninth campaign's t_build column measures the bulk regime (every
epoch ∝ corpus).  THIS script measures the claim that matters at
100 TB: with the batch size FIXED, per-epoch ingest cost must not grow
with the size of the standing postings/forward/ledger tables, because
the gate reads NO standing rows — each epoch is one tokenize+tf pass
over the batch plus appends (the ann_ingest_regime method, lexical
twin).

Method: bulk-load two standing indexes — the ov-sf1 documents (~50k)
and the ov-sf10 documents (~500k) — then stream the SAME fixed probe
epoch (the first 2 000 ov-sf1 docs re-keyed) into each and report
min-of-N wall seconds.  Flat ⇒ measured, not argued.

Usage: python scripts/bm25_ingest_regime.py [small_dir big_dir [passes]]
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

from data_engineer_coder_spark.io.tables import table  # noqa: E402
from data_engineer_coder_spark.session import get_spark  # noqa: E402
from data_engineer_coder_spark.streaming.bm25_ingest import (  # noqa: E402
    _build_standing_index,
)
from data_engineer_coder_spark.streaming.core import (  # noqa: E402
    write_stream_bm25_index_gate,
)


def _timed_probe_epoch(spark, probe, roots) -> float:
    src = tempfile.mkdtemp(prefix="bm25probe_")
    try:
        part = os.path.join(src, "part")
        probe.coalesce(1).write.parquet(part)
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        sdir = os.path.join(src, "stream")
        os.makedirs(sdir)
        os.rename(os.path.join(part, f), os.path.join(sdir, "p0.parquet"))
        schema = spark.read.parquet(sdir).schema
        t0 = time.time()
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(sdir)
        )
        q = write_stream_bm25_index_gate(
            sdf, roots["postings"], roots["forward"], roots["stats"]
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("probe epoch did not finish")
        return time.time() - t0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "perfdata/ov-sf1"
    big = sys.argv[2] if len(sys.argv) > 2 else "perfdata/ov-sf10"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("bm25-regime", cpus="32", driver_memory="32g")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # the fixed probe epoch: the first 2 000 small-corpus docs re-keyed
    probe = (
        table(spark, small, "documents")
        .filter(F.col("doc_id") < 2000)
        .select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text")
        .localCheckpoint()
    )

    def scenario(sf_dir: str) -> tuple[int, float]:
        tmp = tempfile.mkdtemp(prefix="bm25regime_")
        try:
            roots = _build_standing_index(spark, sf_dir, tmp)
            n = table(spark, sf_dir, "documents").count()
            return int(n), _timed_probe_epoch(spark, probe, roots)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    scenario(small)  # JIT/stream-machinery warmup, discarded
    out = {}
    for tag, sf_dir in (("small", small), ("big", big)):
        best, n_docs = float("inf"), 0
        for _ in range(passes):
            n_docs, t = scenario(sf_dir)
            best = min(best, t)
        out[tag] = {"standing_docs": n_docs, "t_probe_epoch": round(best, 2)}
        print(f"  [{tag}] {out[tag]}", flush=True)
    out["ratio"] = round(
        out["big"]["t_probe_epoch"] / out["small"]["t_probe_epoch"], 2
    )
    print(json.dumps({"metric": "bm25_ingest_fixed_batch", **out}))


if __name__ == "__main__":
    main()
