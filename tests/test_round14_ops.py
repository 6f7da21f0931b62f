"""Round-14 operators: manifest-recorded commit neutrality (the serving
pin no longer trusts txid naming), zero-doc ledger snapshots, persisted
corpus-scaled bucket layouts, delete propagation to the tokstats vocab
table, full-family compaction, and the cost-based BM25 serve dispatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# ADVICE r13: neutrality is an explicit manifest flag, not a txid prefix
# --------------------------------------------------------------------------


def test_serving_pin_ignores_compact_prefix_on_row_changing_writes(spark, tmp_path):
    from data_engineer_coder_spark.io.acid_table import (
        append_partitions,
        compact_partitions,
        current_manifest,
        latest_consistent_version,
    )

    root = str(tmp_path / "t")
    append_partitions(
        spark.createDataFrame([(1, 0), (2, 1)], "id long, b int"),
        root, ["b"], "epoch-0",
    )
    append_partitions(
        spark.createDataFrame([(3, 0)], "id long, b int"), root, ["b"], "epoch-0b"
    )
    ledger = {"epoch-0", "epoch-0b"}
    assert latest_consistent_version(root, ledger) == 2

    # A ROW-CHANGING write that borrows the compact- prefix must BLOCK
    # the pin: nothing enforced neutrality for it, so exempting it would
    # serve rows the ledger doesn't account for.
    append_partitions(
        spark.createDataFrame([(4, 1)], "id long, b int"),
        root, ["b"], "compact-evil",
    )
    man = current_manifest(root)
    assert "compact-evil" in man["txids"]
    assert "compact-evil" not in man.get("neutral_txids", [])
    assert latest_consistent_version(root, ledger) == 2  # pinned BEFORE it

    # A real compaction records its neutrality at commit time and the
    # pin advances over it without a ledger entry.
    ledger2 = ledger | {"compact-evil"}
    assert latest_consistent_version(root, ledger2) == 3
    compact_partitions(spark, root, "compact-real")
    man2 = current_manifest(root)
    assert "compact-real" in man2["neutral_txids"]
    assert latest_consistent_version(root, ledger2) == man2["version"]


def test_ledger_snapshot_zero_docs(spark, tmp_path):
    from data_engineer_coder_spark.io.acid_table import append_partitions
    from data_engineer_coder_spark.streaming.bm25_ingest import _ledger_snapshot

    roots = {"stats": str(tmp_path / "stats")}
    # a first epoch that accepted nothing still writes its stats row,
    # and a delete correction can net the corpus to zero
    append_partitions(
        spark.createDataFrame([(0, 0, 0)], "epoch int, n_docs long, len_sum long"),
        roots["stats"], ["epoch"], "epoch-0",
    )
    n, avglen, txids = _ledger_snapshot(spark, roots)
    assert (n, avglen, txids) == (0, 0.0, {"epoch-0"})
    append_partitions(
        spark.createDataFrame(
            [(1, 5, 100), (-2, -5, -100)], "epoch int, n_docs long, len_sum long"
        ),
        roots["stats"], ["epoch"], "epoch-1",
    )
    n2, avglen2, _ = _ledger_snapshot(spark, roots)
    assert (n2, avglen2) == (0, 0.0)


# --------------------------------------------------------------------------
# VERDICT r13 #1: bucket layouts are TABLE metadata — persisted at
# creation, read back by every reader, immune to caller re-tuning
# --------------------------------------------------------------------------


def test_pow2_buckets_scaling():
    from data_engineer_coder_spark.io.layout import pow2_buckets

    assert pow2_buckets(1, 65_536) == 16          # lo clamp (driver scales)
    assert pow2_buckets(275_000, 65_536) == 16    # sf0.1 stays oracle-16
    assert pow2_buckets(2_750_000, 65_536) == 64  # ov-sf1
    assert pow2_buckets(27_500_000, 65_536) == 512
    assert pow2_buckets(10**12, 65_536) == 4096   # hi clamp


def test_bm25_layout_persisted_and_wins_over_caller(spark, tmp_path):
    from data_engineer_coder_spark.io.acid_table import replace_partitions
    from data_engineer_coder_spark.io.layout import read_table_config
    from data_engineer_coder_spark.streaming.bm25_ingest import (
        _served_scores,
        read_pruned_postings,
    )
    from data_engineer_coder_spark.streaming.core import (
        bm25_index_batch_frames,
        bm25_table_layout,
    )

    roots = {n: str(tmp_path / n) for n in ("postings", "forward", "stats")}
    # creation at 32 buckets
    tokb, fwdb = bm25_table_layout(
        roots["postings"], roots["forward"], tok_buckets=32, fwd_buckets=8
    )
    assert (tokb, fwdb) == (32, 8)
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common word{i}") for i in range(40)],
        "doc_id long, text string",
    )
    fr = bm25_index_batch_frames(docs, tokb, fwdb)
    replace_partitions(
        fr["postings"].withColumn("epoch", F.lit(-1)),
        roots["postings"], ["tok_bucket"], "bulk-load",
    )
    replace_partitions(
        fr["forward"].withColumn("epoch", F.lit(-1)),
        roots["forward"], ["doc_bucket"], "bulk-load",
    )
    st = fr["dl"].agg(F.count("*").alias("n"), F.sum("len").alias("l")).collect()[0]
    replace_partitions(
        spark.createDataFrame(
            [(-1, int(st["n"]), int(st["l"]))], "epoch int, n_docs long, len_sum long"
        ),
        roots["stats"], ["epoch"], "bulk-load",
    )
    # a restart passing DIFFERENT counts must get the persisted layout
    # back, not re-split standing tokens (the r13 three-constant hazard)
    tokb2, fwdb2 = bm25_table_layout(
        roots["postings"], roots["forward"], tok_buckets=16, fwd_buckets=16
    )
    assert (tokb2, fwdb2) == (32, 8)
    assert read_table_config(roots["postings"])["tok_buckets"] == 32
    # the serve-side reader derives 32 from the table and still returns
    # exactly the term's postings (wrong layout would prune to nothing)
    got = read_pruned_postings(spark, roots["postings"], ["common"]).select(
        "doc_id"
    ).count()
    assert got == 40
    q = spark.createDataFrame([(999, "common")], "pid long, tok string")
    sc = _served_scores(spark, roots, q.withColumn("w", F.lit(1.0)), "bm25_e9")
    assert sc.count() == 40


def test_delete_propagation_uses_table_layout_and_corrects_tokstats(
    spark, tmp_path
):
    from data_engineer_coder_spark.io.acid_table import (
        read_table,
        replace_partitions,
    )
    from data_engineer_coder_spark.operators.retrieval_delete import (
        propagate_retrieval_delete,
    )
    from data_engineer_coder_spark.streaming.bm25_ingest import (
        _ledger_snapshot,
    )
    from data_engineer_coder_spark.streaming.core import (
        bm25_index_batch_frames,
        bm25_table_layout,
    )

    roots = {
        n: str(tmp_path / n) for n in ("postings", "forward", "stats", "tokstats")
    }
    tokb, fwdb = bm25_table_layout(
        roots["postings"], roots["forward"], roots["tokstats"],
        tok_buckets=32, fwd_buckets=8,
    )
    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa dd"), (3, "ee ff gg hh")],
        "doc_id long, text string",
    )
    fr = bm25_index_batch_frames(docs, tokb, fwdb)
    replace_partitions(
        fr["postings"].withColumn("epoch", F.lit(-1)),
        roots["postings"], ["tok_bucket"], "bulk-load",
    )
    replace_partitions(
        fr["forward"].withColumn("epoch", F.lit(-1)),
        roots["forward"], ["doc_bucket"], "bulk-load",
    )
    replace_partitions(
        fr["postings"].groupBy("tok", "tok_bucket").agg(F.count("*").alias("df"))
        .withColumn("epoch", F.lit(-1)),
        roots["tokstats"], ["tok_bucket"], "bulk-load",
    )
    replace_partitions(
        spark.createDataFrame([(-1, 3, 9)], "epoch int, n_docs long, len_sum long"),
        roots["stats"], ["epoch"], "bulk-load",
    )
    touched = propagate_retrieval_delete(spark, roots, [1], "maint-del")
    assert touched["n_del"] == 1 and touched["len_del"] == 3
    # postings/forward no longer hold doc 1
    assert read_table(spark, roots["postings"]).filter(
        F.col("doc_id") == 1
    ).count() == 0
    # tokstats NETS to the reduced-corpus df: aa → 1 (doc 2 still has it),
    # bb/cc → 0; doc 3's tokens untouched
    net = {
        r["tok"]: int(r["df"])
        for r in read_table(spark, roots["tokstats"])
        .groupBy("tok").agg(F.sum(F.col("df").cast("long")).alias("df"))
        .collect()
    }
    assert net == {"aa": 1, "bb": 0, "cc": 0, "dd": 1,
                   "ee": 1, "ff": 1, "gg": 1, "hh": 1}
    # ledger correction landed LAST under the same txid
    n, avglen, txids = _ledger_snapshot(spark, roots)
    assert n == 2 and "maint-del" in txids
    assert avglen == (9 - 3) / 2


def test_pca_gram_partials_match_exploded_outer_product(spark):
    """r14 optimization: the PCA moment matrix is computed by per-task
    numpy Gram partials (mapInArrow) instead of exploding Θ(n·d²) outer-
    product rows — the summed int64 cells must equal the exploded plan
    exactly (integer addition is order-free, so any partitioning gives
    the same cells)."""
    from pyspark.sql import functions as F

    from data_engineer_coder_spark.operators import similarity as sim

    rows = [([float(i % 7) / 7.0 - 0.4 + 0.01 * d for d in range(sim._DIMS)],)
            for i in range(37)]
    df = spark.createDataFrame(rows, "embedding array<double>").repartition(5)
    q = df.select(
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * sim._PCA_SCALE + F.lit(0.5)).cast("bigint"),
        ).alias("qv")
    )
    idx = F.sequence(F.lit(1), F.lit(sim._DIMS))
    outer = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                idx,
                lambda j: F.struct(
                    i.alias("i"), j.alias("j"),
                    (F.element_at(F.col("qv"), i)
                     * F.element_at(F.col("qv"), j)).alias("p"),
                ),
            ),
        )
    )
    want = {
        (int(r["i"]), int(r["j"])): int(r["c"])
        for r in q.select(F.explode(outer).alias("c"))
        .select("c.i", "c.j", "c.p")
        .groupBy("i", "j").agg(F.sum("p").alias("c")).collect()
    }

    def _gram(batches):
        import numpy as np
        import pyarrow as pa
        dims = sim._DIMS
        acc = np.zeros((dims, dims), dtype=np.int64)
        seen = False
        for b in batches:
            flat = b.column(0).flatten().to_numpy(zero_copy_only=False)
            m = flat.astype(np.int64, copy=False).reshape(-1, dims)
            acc += m.T @ m
            seen = True
        if seen:
            i = np.repeat(np.arange(1, dims + 1, dtype=np.int32), dims)
            j = np.tile(np.arange(1, dims + 1, dtype=np.int32), dims)
            yield pa.RecordBatch.from_arrays(
                [pa.array(i, pa.int32()), pa.array(j, pa.int32()),
                 pa.array(acc.reshape(-1), pa.int64())],
                names=["i", "j", "p"],
            )

    got = {
        (int(r["i"]), int(r["j"])): int(r["c"])
        for r in q.mapInArrow(_gram, "i int, j int, p long")
        .groupBy("i", "j").agg(F.sum("p").alias("c")).collect()
    }
    assert got == want and len(got) == sim._DIMS * sim._DIMS
