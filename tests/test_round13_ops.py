"""Round-13 operators: serving-side snapshot pinning for the standing
BM25 artifacts, the adopt_partitions schema guard, postings compaction,
delete propagation to the standing retrieval indexes, and the
searchable curation gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# ADVICE r12: adopt_partitions must not flip the declared schema over
# retained old-schema partitions
# --------------------------------------------------------------------------


def test_adopt_partitions_schema_guard(spark, tmp_path):
    from data_engineer_coder_spark.io.acid_table import (
        adopt_partitions,
        current_manifest,
        replace_partitions,
    )

    dst = str(tmp_path / "dst")
    replace_partitions(
        spark.createDataFrame([(1, "a", 0), (2, "b", 1)], "id long, v string, b int"),
        dst, ["b"], "t0",
    )
    # schema-evolved staging table covering only bucket 0 → must refuse
    src1 = str(tmp_path / "src1")
    replace_partitions(
        spark.createDataFrame([(1, "a", 7, 0)], "id long, v string, extra int, b int"),
        src1, ["b"], "s0",
    )
    with pytest.raises(ValueError, match="schema differs"):
        adopt_partitions(src1, dst, ["b"], "swap-bad")
    # same staging schema covering EVERY dst partition → allowed (the
    # staged-re-encode full swap), and the declared schema follows src
    src2 = str(tmp_path / "src2")
    replace_partitions(
        spark.createDataFrame(
            [(1, "a", 7, 0), (2, "b", 8, 1)], "id long, v string, extra int, b int"
        ),
        src2, ["b"], "s1",
    )
    man = adopt_partitions(src2, dst, ["b"], "swap-ok")
    assert man["schema"] == current_manifest(src2)["schema"]
    # partition-column mismatch on the dst side → must refuse
    with pytest.raises(ValueError, match="partition columns differ"):
        adopt_partitions(src2, dst, ["other"], "swap-cols")


# --------------------------------------------------------------------------
# ADVICE r12: BM25 serving pins postings/forward to the ledger-consistent
# version — a crash between the gate's table commits can't serve torn stats
# --------------------------------------------------------------------------


def test_bm25_serving_pins_to_ledger_snapshot(spark, tmp_path):
    from data_engineer_coder_spark.io.acid_table import (
        append_partitions,
        latest_consistent_version,
        version_with_txid,
    )
    from data_engineer_coder_spark.streaming.bm25_ingest import (
        _ledger_snapshot,
        _served_scores,
    )
    from data_engineer_coder_spark.streaming.core import bm25_index_batch_frames

    roots = {n: str(tmp_path / n) for n in ("postings", "forward", "stats")}

    def _commit_epoch(rows, epoch, *, ledger=True):
        txid = f"epoch-{epoch}"
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fr = bm25_index_batch_frames(df)
        append_partitions(
            fr["postings"].withColumn("epoch", F.lit(epoch)),
            roots["postings"], ["tok_bucket"], txid,
        )
        append_partitions(
            fr["forward"].withColumn("epoch", F.lit(epoch)),
            roots["forward"], ["doc_bucket"], txid,
        )
        if ledger:
            st = fr["dl"].agg(
                F.count("*").alias("n"), F.sum("len").alias("lens")
            ).collect()[0]
            led = spark.createDataFrame(
                [(epoch, int(st["n"]), int(st["lens"]), 0, 0, 0)],
                "epoch int, n_docs long, len_sum long, doc_id_sum long, "
                "n_postings long, tf_sum long",
            )
            append_partitions(led, roots["stats"], ["epoch"], txid)

    _commit_epoch([(1, "spark writes parquet"), (2, "commit log")], 0)
    # epoch 1 CRASHES between the forward commit and the ledger commit:
    # postings+forward hold doc 3, the ledger's N/avglen exclude it
    _commit_epoch([(3, "spark spark spark torn snapshot")], 1, ledger=False)

    n, avglen, txids = _ledger_snapshot(spark, roots)
    assert (n, txids) == (2, {"epoch-0"})
    assert version_with_txid(roots["postings"], "epoch-0") == 1
    assert version_with_txid(roots["postings"], "epoch-1") == 2
    assert version_with_txid(roots["postings"], "epoch-nope") is None
    # the serving pin stops BEFORE the torn epoch-1 commit...
    assert latest_consistent_version(roots["postings"], txids) == 1
    # ...but a logically-neutral compact-* commit would not block it
    assert latest_consistent_version(
        roots["postings"], txids | {"epoch-1"}
    ) == 2

    q = spark.createDataFrame([(0, "spark")], "pid long, tok string")
    sc = _served_scores(
        spark, roots, q.withColumn("w", F.lit(1.0)), "bm25_e9"
    ).collect()
    # doc 3 matches 'spark' but sits in the torn epoch → must be invisible
    assert {int(r["id"]) for r in sc} == {1}
    # replaying the crashed epoch (now with its ledger row) converges
    _commit_epoch([(3, "spark spark spark torn snapshot")], 1)
    sc2 = _served_scores(
        spark, roots, q.withColumn("w", F.lit(1.0)), "bm25_e9"
    ).collect()
    assert {int(r["id"]) for r in sc2} == {1, 3}
