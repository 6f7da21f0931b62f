#!/usr/bin/env python
"""Continuous-ingestion regime point for the streaming ANN index gate.

The bulk-load decade (scale_bench over ov-sf1 → ov-sf10) measures total
work when every epoch is corpus/3 — the Θ(corpus) regime any correct
pipeline shares.  THIS script measures the claim that actually matters
at 100 TB: with the batch size FIXED, per-epoch ingest cost must not
grow with the size of the standing index, because the gate reads no
standing index rows at all (assignment and encoding run against the
broadcast bootstrap artifacts; the index is append-only).

Method: train the quantizer once on the ov-sf1 bootstrap slice, bulk
load two standing indexes — the remaining ov-sf1 vectors (~18k rows)
and the remaining ov-sf10 vectors (~180k rows) — then stream the SAME
fixed probe epoch (the ov-sf1 bootstrap ids re-tagged, ~2k vectors)
into each and report min-of-N wall seconds.  Flat ⇒ the per-epoch cost
claim is measured, not argued.

Usage: python scripts/ann_ingest_regime.py [small_dir big_dir [passes]]
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
    replace_partitions,
)
from data_engineer_coder_spark.io.tables import table  # noqa: E402
from data_engineer_coder_spark.operators.similarity import (  # noqa: E402
    _PQ_SUBS,
    _cb_row_from_entries,
    _dot,
    _ivf_cents,
    _pq_code_for,
    _pq_seed_row,
    _pq_train_entries,
    _qvec,
    _two_level_assign,
)
from data_engineer_coder_spark.session import get_spark  # noqa: E402
from data_engineer_coder_spark.streaming.core import (  # noqa: E402
    write_stream_ann_index_gate,
)


def _vecs(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("qv")
    )
    return emb.withColumn("nrm", _dot(F.col("qv"), F.col("qv")))


def _bulk_load(spark, n, cents, cb_row, index_root, txid):
    """Batch twin of the gate's per-epoch work: load ``n`` as standing
    index rows under one txid (same layout, no stream overhead)."""
    asg = _two_level_assign(n, cents).select(
        "vec_id",
        "centroid_id",
        F.floor((F.col("c_sim") + 1) * 1e6).cast("bigint").alias("sim_e6"),
        "qv",
    )
    enc = (
        asg.crossJoin(F.broadcast(cb_row))
        .select(
            "vec_id", "centroid_id", "sim_e6",
            F.array(*[_pq_code_for(F.lit(s)) for s in range(_PQ_SUBS)]).alias("codes"),
        )
        .withColumn("epoch", F.lit(-1))
        .withColumn("cell_bucket", F.pmod("centroid_id", F.lit(16)))
    )
    append_partitions(enc, index_root, ["cell_bucket"], txid)


def _timed_probe_epoch(spark, probe, roots):
    """Stream the fixed probe epoch into the standing index, once.

    One run per standing-index build: a replayed run against the same
    roots would hit the exactly-once ledger (txid ``epoch-0`` already
    committed) and measure the no-op path.  Min-of-N comes from
    re-building the scenario (fresh roots) in ``main``; JIT warmth
    from the explicit warmup scenario that runs first."""
    src = tempfile.mkdtemp(prefix="annprobe_")
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
        q = write_stream_ann_index_gate(
            sdf, roots["cents"], roots["codebook"],
            roots["index"], roots["stats"],
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
    spark = get_spark("ann-regime", cpus="32", driver_memory="32g")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    n_small = _vecs(spark, small)
    boot = n_small.filter(F.pmod("vec_id", F.lit(10)) == 0).localCheckpoint()
    # the fixed probe epoch: the bootstrap vectors re-tagged with fresh ids
    probe = boot.withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000)).localCheckpoint()

    cents = _ivf_cents(boot).localCheckpoint(eager=False)
    cb_entries = _pq_train_entries(
        boot.select("vec_id", "qv"), _pq_seed_row(boot.select("vec_id", "qv"))
    ).localCheckpoint()
    cb_row = _cb_row_from_entries(cb_entries)

    def scenario(sf_dir):
        """Fresh roots → bulk-load the standing index → one timed probe."""
        tmp = tempfile.mkdtemp(prefix="annregime_")
        try:
            roots = {
                nm: os.path.join(tmp, nm)
                for nm in ("cents", "codebook", "index", "stats")
            }
            cents_df = _ivf_cents(boot).withColumn(
                "b", F.pmod("centroid_id", F.lit(4))
            )
            replace_partitions(cents_df, roots["cents"], ["b"], "quantizer-build")
            replace_partitions(cb_entries, roots["codebook"], ["s"], "quantizer-build")
            standing = _vecs(spark, sf_dir).filter(
                F.pmod("vec_id", F.lit(10)) != 0
            )
            _bulk_load(spark, standing, cents, cb_row,
                       roots["index"], "bulk-load")
            n_rows = sum(
                f["rows"] for files in
                current_manifest(roots["index"]).get("dir_files", {}).values()
                for f in files
            )
            return int(standing.count()), n_rows, _timed_probe_epoch(spark, probe, roots)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    scenario(small)  # JIT/stream-machinery warmup, discarded

    out = {}
    for tag, sf_dir in (("small", small), ("big", big)):
        best, n_standing, n_rows = float("inf"), 0, 0
        for _ in range(passes):
            n_standing, n_rows, t = scenario(sf_dir)
            best = min(best, t)
        out[tag] = {"standing_rows": n_standing, "t_probe_epoch": round(best, 2)}
        print(f"  [{tag}] standing={n_standing} probe-epoch={out[tag]['t_probe_epoch']}s "
              f"(index manifest rows={n_rows})", flush=True)
    out["ratio"] = round(out["big"]["t_probe_epoch"] / out["small"]["t_probe_epoch"], 2)
    print(json.dumps({"metric": "ann_ingest_fixed_batch", **out}))


if __name__ == "__main__":
    main()
