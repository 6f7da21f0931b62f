"""Round-12 operators: the standing BM25 lexical index (ingest gate +
served retrieval), ANN-served retrieval pools, staged ANN retrain, and
the CDF-driven incremental rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# standing BM25 index: gate semantics
# --------------------------------------------------------------------------


def _two_epoch_src(spark, tmp_path, epochs):
    """Write the given row lists as ordered single-file stream epochs."""
    import os as _os
    import time as _time

    src = str(tmp_path / "src")
    _os.makedirs(src)
    now = _time.time()
    for i, rows in enumerate(epochs):
        part = str(tmp_path / f"p{i}")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(part)
        f = next(x for x in _os.listdir(part) if x.endswith(".parquet"))
        dst = _os.path.join(src, f"e{i}.parquet")
        _os.rename(_os.path.join(part, f), dst)
        _os.utime(dst, (now + 30 * i, now + 30 * i))
    return src, spark.read.parquet(src).schema


def test_bm25_gate_matches_batch_and_replay_noop(spark, tmp_path):
    """T8k: the streaming BM25 gate must (a) commit exactly the
    (doc, tok, tf, len) postings one batch tokenize pass computes,
    (b) lay postings out by md5 token bucket and the forward index by
    doc bucket, (c) keep a ledger the tables reconcile with, and
    (d) stay exactly-once across a full stream replay."""
    import hashlib

    from data_engineer_coder_spark.io.acid_table import (
        current_manifest,
        read_table,
    )
    from data_engineer_coder_spark.streaming.core import (
        write_stream_bm25_index_gate,
    )

    e0 = [(10, "spark spark parquet"), (12, "manifest commit")]
    e1 = [(21, "parquet snapshot snapshot snapshot")]
    src, schema = _two_epoch_src(spark, tmp_path, (e0, e1))
    roots = {n: str(tmp_path / n) for n in ("postings", "forward", "stats")}

    def _run():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = write_stream_bm25_index_gate(
            sdf, roots["postings"], roots["forward"], roots["stats"]
        )
        q.awaitTermination(300)

    _run()
    post = {
        (int(r["doc_id"]), r["tok"]): r
        for r in read_table(spark, roots["postings"]).collect()
    }
    want = {
        (10, "spark"): (2, 3), (10, "parquet"): (1, 3),
        (12, "manifest"): (1, 2), (12, "commit"): (1, 2),
        (21, "parquet"): (1, 4), (21, "snapshot"): (3, 4),
    }
    assert {k: (int(r["tf"]), int(r["len"])) for k, r in post.items()} == want
    for (doc, tok), r in post.items():
        b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % 16
        assert int(r["tok_bucket"]) == b, tok
        assert int(r["epoch"]) == (0 if doc < 20 else 1)
    fwd = {
        (int(r["doc_id"]), r["tok"]): (int(r["tf"]), int(r["doc_bucket"]))
        for r in read_table(spark, roots["forward"]).collect()
    }
    assert fwd == {k: (v[0], k[0] % 16) for k, v in want.items()}
    ledger = {
        int(r["epoch"]): (
            int(r["n_docs"]), int(r["len_sum"]), int(r["doc_id_sum"]),
            int(r["n_postings"]), int(r["tf_sum"]),
        )
        for r in read_table(spark, roots["stats"]).collect()
    }
    assert ledger == {0: (2, 5, 22, 4, 5), 1: (1, 4, 21, 2, 4)}

    v_before = {n: current_manifest(roots[n])["version"] for n in roots}
    _run()  # fresh checkpoint → full replay of both epochs
    for n, ver in v_before.items():
        assert current_manifest(roots[n])["version"] == ver, n
    assert read_table(spark, roots["postings"]).count() == 6


def test_bm25_gate_crash_mid_epoch_converges(spark, tmp_path, monkeypatch):
    """T8k under a torn epoch: crash AFTER the postings append but
    BEFORE the forward/ledger commits, restart with a fresh checkpoint
    — the replayed epoch no-ops the durable postings append (same
    txid) and completes the missing tables."""
    import data_engineer_coder_spark.io.acid_table as at
    from data_engineer_coder_spark.io.acid_table import read_table
    from data_engineer_coder_spark.streaming.core import (
        write_stream_bm25_index_gate,
    )

    e0 = [(10, "alpha beta beta"), (12, "gamma alpha")]
    src, schema = _two_epoch_src(spark, tmp_path, (e0,))
    roots = {n: str(tmp_path / n) for n in ("postings", "forward", "stats")}

    def _run():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = write_stream_bm25_index_gate(
            sdf, roots["postings"], roots["forward"], roots["stats"]
        )
        q.awaitTermination(300)

    real = at.append_partitions
    calls = {"n": 0}

    def flaky(df, root, cols, txid, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # the forward-index commit of epoch 0
            raise RuntimeError("injected crash mid-epoch")
        return real(df, root, cols, txid, *a, **k)

    monkeypatch.setattr(at, "append_partitions", flaky)
    try:
        _run()
        raise AssertionError("injected crash did not surface")
    except Exception as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(at, "append_partitions", real)

    # torn state: postings durable, forward/ledger missing
    assert read_table(spark, roots["postings"]).count() == 4
    for n in ("forward", "stats"):
        try:
            cnt = read_table(spark, roots[n]).count()
        except ValueError:
            cnt = 0
        assert cnt == 0, n

    _run()  # replay: postings append no-ops, forward/ledger complete
    assert read_table(spark, roots["postings"]).count() == 4
    assert read_table(spark, roots["forward"]).count() == 4
    ledger = read_table(spark, roots["stats"]).collect()
    assert len(ledger) == 1
    assert (int(ledger[0]["n_docs"]), int(ledger[0]["tf_sum"])) == (2, 5)


def test_bm25_served_ranking_matches_inplan_on_controlled_corpus(
    spark, tmp_path
):
    """End-to-end served-vs-in-plan parity on a controlled corpus: the
    served query (standing bucketed postings + ledger stats) must
    return exactly the in-plan ``bm25_topk`` ranking — the harness's
    bit-parity assert and the bucket-pruning audit both run inside."""
    from data_engineer_coder_spark.operators.textops import bm25_topk
    from data_engineer_coder_spark.streaming.bm25_ingest import (
        bm25_topk_served,
    )

    rows = [
        (0, "zebra quartz common common"),
        (11, "zebra common"),
        (12, "common common"),
        (13, "zebra quartz"),
        (14, " ".join(["common"] * 50)),
        (15, "unrelated words entirely different"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        sf + "/documents.parquet"
    )
    served = {
        (int(r["probe_id"]), int(r["rn"])): (int(r["doc_id"]), int(r["bm25_e9"]))
        for r in bm25_topk_served(spark, sf).collect()
    }
    inplan = {
        (int(r["probe_id"]), int(r["rn"])): (int(r["doc_id"]), int(r["bm25_e9"]))
        for r in bm25_topk(spark, sf).collect()
    }
    # doc 15 shares no query token → 4 scored candidates, not 5
    assert served == inplan and len(served) == 4
    # BM25 semantics survive the serving path: two rare terms beat one,
    # saturation keeps the tf-spam doc below any rare match
    ranks = {doc: rn for (p, rn), (doc, _) in served.items() if p == 0}
    assert ranks[13] < ranks[11] < ranks[12]


# --------------------------------------------------------------------------
# ANN-served retrieval pools
# --------------------------------------------------------------------------


def test_mmr_served_shape_and_greedy_invariants(spark, sf_dir):
    """The ANN-served MMR must keep the greedy contract: 5 distinct
    selections per probe, steps numbered 1..5.  (mmr scores are NOT
    monotone across steps: a negative pairwise cosine turns the
    −0.3·max-sim penalty into a bonus, legitimately.)"""
    from data_engineer_coder_spark.operators.retrieval_served import (
        mmr_diversified_topk_served,
    )

    rows = mmr_diversified_topk_served(spark, sf_dir).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(int(r["probe_id"]), []).append(
            (int(r["step"]), int(r["neighbor_id"]))
        )
    assert len(by_probe) == 10
    for pid, sel in by_probe.items():
        sel.sort()
        assert [s for s, _ in sel] == [1, 2, 3, 4, 5], pid
        assert len({n for _, n in sel}) == 5, pid


def test_hybrid_served_recall_floor(spark, sf_dir):
    """The served hybrid must retain a healthy share of the exact-scan
    hybrid top-5 (nprobe=4 cells): the driver hash pins the exact
    value; this test pins a coarse floor so a collapse (e.g. empty
    vector leg) fails loudly even without the oracle."""
    from data_engineer_coder_spark.operators.retrieval_served import (
        hybrid_served_recall_check,
    )

    r = hybrid_served_recall_check(spark, sf_dir).collect()[0]
    assert int(r["n_slots"]) == 50
    assert int(r["recall_e4"]) >= 5000, r


# --------------------------------------------------------------------------
# staged ANN retrain: per-bucket staging + metadata-only swap
# --------------------------------------------------------------------------


def test_staged_reencode_crash_mid_buckets_converges(spark, tmp_path, monkeypatch):
    """VERDICT r11 #3's crash drill: kill the staged re-encode after two
    of four bucket commits, verify the live index is UNTOUCHED (old
    codes still served), then resume — already-staged buckets no-op,
    the rest complete, the metadata-only adopt lands the swap, and the
    pre-swap version still time-travels to the old codes."""
    import data_engineer_coder_spark.io.acid_table as at
    from data_engineer_coder_spark.io.acid_table import (
        adopt_partitions,
        current_manifest,
        read_table,
        replace_partitions,
    )
    from data_engineer_coder_spark.streaming.ann_ingest import _staged_reencode

    def enc(offset):
        return spark.createDataFrame(
            [(i, [i + offset, i * 2 + offset], i % 4) for i in range(16)],
            "vec_id long, codes array<bigint>, b int",
        )

    index_root = str(tmp_path / "index")
    staging_root = str(tmp_path / "staging")
    enc_old, enc_new = enc(0), enc(100)
    replace_partitions(enc_old, index_root, ["b"], "bulk-load")
    v_old = current_manifest(index_root)["version"]

    real = at.replace_partitions
    calls = {"n": 0}

    def flaky(df, root, cols, txid, *a, **k):
        calls["n"] += 1
        if calls["n"] == 3:  # third bucket commit of the staging pass
            raise RuntimeError("injected crash mid-re-encode")
        return real(df, root, cols, txid, *a, **k)

    # _staged_reencode resolves replace_partitions through the acid
    # module at call time, so the injection reaches it
    monkeypatch.setattr(at, "replace_partitions", flaky)
    with pytest.raises(RuntimeError, match="injected crash"):
        _staged_reencode(enc_new, staging_root, n_buckets=4)
    monkeypatch.setattr(at, "replace_partitions", real)

    # torn state: two buckets staged, live index untouched
    staged = current_manifest(staging_root)
    assert len(staged["txids"]) == 2
    assert current_manifest(index_root)["version"] == v_old
    assert {
        int(r["codes"][0]) - int(r["vec_id"])
        for r in read_table(spark, index_root).collect()
    } == {0}

    # resume: staged buckets replay as no-ops, the rest complete
    _staged_reencode(enc_new, staging_root, n_buckets=4)
    txids = current_manifest(staging_root)["txids"]
    assert sorted(txids) == [f"retrain-stage-b{b}" for b in range(4)]

    adopt_partitions(staging_root, index_root, ["b"], "retrain-swap")
    v_new = current_manifest(index_root)["version"]
    got = {
        int(r["vec_id"]): int(r["codes"][0])
        for r in read_table(spark, index_root).collect()
    }
    assert got == {i: i + 100 for i in range(16)}
    # metadata-only: the adopt commit references the staging dirs, and
    # replaying it (or the staging pass) advances nothing
    adopt_partitions(staging_root, index_root, ["b"], "retrain-swap")
    _staged_reencode(enc_new, staging_root, n_buckets=4)
    assert current_manifest(index_root)["version"] == v_new
    # time travel: the pre-swap version still serves the old codes
    old = {
        int(r["vec_id"]): int(r["codes"][0])
        for r in read_table(spark, index_root, version=v_old).collect()
    }
    assert old == {i: i for i in range(16)}


# --------------------------------------------------------------------------
# RAG chunk pipeline
# --------------------------------------------------------------------------


def test_rag_chunk_pipeline_packs_diverse_docs_within_budget(spark, sf_dir):
    """The composed pipeline's two core guarantees: the packed context
    respects the token budget with exact prefix semantics, and the MMR
    stage's same-doc repulsion (inherited embeddings → cosine 1.0)
    keeps any one document from contributing two chunks to a probe's
    context."""
    from data_engineer_coder_spark.operators.retrieval_served import (
        _RAGC_BUDGET,
        rag_chunk_pipeline,
    )

    rows = rag_chunk_pipeline(spark, sf_dir).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(int(r["probe_id"]), []).append(r)
    assert len(by_probe) == 10
    for pid, ctx in by_probe.items():
        ctx.sort(key=lambda r: int(r["step"]))
        # prefix semantics: steps contiguous from 1, cumsum exact
        assert [int(r["step"]) for r in ctx] == list(range(1, len(ctx) + 1)), pid
        run = 0
        for r in ctx:
            run += int(r["n_tokens"])
            assert int(r["cum_tokens"]) == run, pid
        assert run <= _RAGC_BUDGET, pid
        # diversification: no doc contributes two chunks to one context
        docs = [int(r["doc_id"]) for r in ctx]
        assert len(docs) == len(set(docs)), (pid, docs)
        assert pid not in docs, pid


# --------------------------------------------------------------------------
# adopt_partitions semantics + the shared pruned-postings reader
# --------------------------------------------------------------------------


def test_adopt_partitions_rebases_on_racing_commit(spark, tmp_path):
    """The metadata-only adopt must RE-BASE on a racing writer's commit
    rather than clobber it: a partition the destination gained from
    another transaction (outside the adopted set) survives the adopt,
    and the adopt's partitions point at the source's directories
    without any data rewrite."""
    import os

    from data_engineer_coder_spark.io.acid_table import (
        adopt_partitions,
        current_manifest,
        read_table,
        replace_partitions,
    )

    dst = str(tmp_path / "dst")
    src = str(tmp_path / "src")
    base = spark.createDataFrame(
        [(i, i * 10, i % 2) for i in range(8)], "k long, v long, b int"
    )
    replace_partitions(base, dst, ["b"], "load")
    # a racing writer lands a partition the adopt does not touch
    other = spark.createDataFrame([(100, 1000, 7)], "k long, v long, b int")
    replace_partitions(other, dst, ["b"], "racer")
    # the staged source rewrites only buckets 0 and 1
    staged = spark.createDataFrame(
        [(i, i * 10 + 1, i % 2) for i in range(8)], "k long, v long, b int"
    )
    replace_partitions(staged, src, ["b"], "stage")

    adopt_partitions(src, dst, ["b"], "swap")
    man = current_manifest(dst)
    # adopted partitions reference the SOURCE's staging dirs (no copy)
    for p, dirs in man["partitions"].items():
        bval = dict(s.split("=", 1) for s in p.split("/"))["b"]
        if bval in ("0", "1"):
            assert all(".." in d or os.path.isabs(d) for d in dirs), (p, dirs)
    rows = {
        (int(r["k"])): int(r["v"]) for r in read_table(spark, dst).collect()
    }
    want = {i: i * 10 + 1 for i in range(8)}
    want[100] = 1000  # the racer's partition survives
    assert rows == want
    # replayed adopt: version no-op
    v = man["version"]
    adopt_partitions(src, dst, ["b"], "swap")
    assert current_manifest(dst)["version"] == v


def test_read_pruned_postings_skips_files_by_token_range(spark, tmp_path):
    """The shared serve-side reader must actually SKIP files: a
    postings table written token-range-sorted across several files per
    bucket yields per-file [min_tok, max_tok] zone maps, and a
    single-term query's stats filter must drop every file whose range
    excludes the term (files_selected dry-run), while the read still
    returns exactly the term's postings."""
    from data_engineer_coder_spark.io.acid_table import (
        files_selected,
        replace_partitions,
    )
    from data_engineer_coder_spark.streaming.bm25_ingest import (
        _term_range_filter,
        read_pruned_postings,
    )

    import hashlib

    def bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 16

    # 200 tokens that ALL hash to one md5 bucket, so partition pruning
    # can't help — only the zone maps can skip; 4 range-partitioned files
    toks = [t for i in range(4000) if bucket(t := f"w{i:04d}") == 0][:200]
    assert len(toks) == 200
    rows = [(d, t, 1, 50, 0) for d in range(3) for t in toks]
    df = spark.createDataFrame(
        rows, "doc_id long, tok string, tf long, len long, tok_bucket int"
    ).repartitionByRange(4, "tok").sortWithinPartitions("tok")
    root = str(tmp_path / "postings")
    from data_engineer_coder_spark.io.layout import table_config

    table_config(root, {"tok_buckets": 16})  # the reader derives the layout
    replace_partitions(df, root, ["tok_bucket"], "bulk-load")

    probe = [max(toks)]  # lives in the LAST token range only
    audit = files_selected(root, stats_filter=_term_range_filter(probe))
    decisions = [keep for v in audit.values() for _, keep in v]
    assert len(decisions) >= 4
    assert sum(decisions) < len(decisions), audit  # something was skipped
    got = read_pruned_postings(spark, root, probe).select("doc_id", "tok").collect()
    assert sorted((int(r["doc_id"]), r["tok"]) for r in got) == [
        (0, probe[0]), (1, probe[0]), (2, probe[0])
    ]
