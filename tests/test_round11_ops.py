"""Round-11 operator unit tests (beyond the generic oracle sweep):
exact-substring REWRITE semantics, the PQ standing-codebook artifact,
and the funnel-conservation property of the optional rewrite stage in
pretraining_corpus_build."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_exact_substring_rewrite_keep_first_semantics(spark):
    """A >=k-token span duplicated across two docs must survive in the
    FIRST doc and be cut from the second; unrelated text survives; a
    byte-identical later doc is rewritten to empty."""
    from data_engineer_coder_spark.operators.dedup import (
        _SPAN_K,
        exact_substring_rewrite,
    )

    span = " ".join(f"w{i}" for i in range(_SPAN_K))  # exactly k tokens
    head = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tail = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"{head} {span}"),          # first occurrence: keeps the span
        (2, f"{span} {tail}"),          # later copy: span cut, tail kept
        (3, f"{head} {span}"),          # byte-identical to doc 1 → empty
        (4, "short doc under k tokens"),  # no grams → untouched
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_substring_rewrite(docs).collect()}

    # conservation on every row
    for r in out.values():
        assert r["n_removed_tokens"] + r["n_kept_tokens"] == r["n_tokens"]

    # doc 1: head survives; span is ALSO duplicated (docs 2 and 3 carry
    # it) but doc 1 holds the first occurrence of every covering gram
    # EXCEPT those whose first occurrence is doc 1 itself — since doc 3
    # duplicates doc 1 entirely, doc 1 is still the keeper everywhere
    assert out[1]["clean_text"] == f"{head} {span}"
    assert out[1]["n_removed_tokens"] == 0
    # doc 2: the k-token span is a later occurrence → removed; the tail
    # plus any prefix tokens not covered by a repeated window survive
    assert out[2]["clean_text"].endswith(tail)
    assert span not in out[2]["clean_text"]
    assert out[2]["n_removed_tokens"] >= _SPAN_K
    # doc 3: every window duplicates doc 1 → fully removed
    assert out[3]["n_kept_tokens"] == 0
    assert out[3]["clean_text"] == ""
    # doc 4: under k tokens, untouched
    assert out[4]["clean_text"] == rows[3][1]
    assert out[4]["n_removed_tokens"] == 0


def test_exact_substring_rewrite_within_doc_repeat(spark):
    """A >=k span repeated WITHIN one doc keeps only the first copy
    (keeper ordering is (doc_id, pos), so the earlier position wins)."""
    from data_engineer_coder_spark.operators.dedup import (
        _SPAN_K,
        exact_substring_rewrite,
    )

    span = " ".join(f"x{i}" for i in range(_SPAN_K))
    mid = "unrelated filler words in the middle here now okay yes"
    docs = spark.createDataFrame(
        [(7, f"{span} {mid} {span}")], "doc_id long, text string"
    )
    r = exact_substring_rewrite(docs).collect()[0]
    assert r["n_removed_tokens"] == _SPAN_K
    assert r["clean_text"] == f"{span} {mid}"


def test_rewrite_report_consistency(spark, sf_dir):
    """Against the real fixture: removed tokens are a SUBSET of the
    covered tokens the L14b report counts (the report counts every
    covered position, the rewrite keeps each span's first occurrence),
    and conservation holds corpus-wide."""
    from data_engineer_coder_spark.operators.dedup import (
        exact_substring_dedup,
        exact_substring_dedup_rewrite,
    )

    rep = {
        r["doc_id"]: r["n_dup_tokens"]
        for r in exact_substring_dedup(spark, sf_dir).collect()
    }
    rw = exact_substring_dedup_rewrite(spark, sf_dir).collect()
    assert len(rw) == len(rep)
    n_removed_total = 0
    for r in rw:
        assert r["n_removed_tokens"] + r["n_kept_tokens"] == r["n_tokens"]
        assert r["n_removed_tokens"] <= rep[r["doc_id"]]
        n_removed_total += r["n_removed_tokens"]
    # the fixture has real duplication: the transform must actually cut
    assert n_removed_total > 0


def test_corpus_build_substring_stage_conservation(spark, sf_dir):
    """pretraining_corpus_build(substring_dedup=True): per-source funnel
    buckets must still partition n_input, kept token mass can only
    shrink vs the canonical funnel, and the bucket counts outside the
    dedup/kept pair are unchanged (the rewrite only moves docs from
    kept to dup and shrinks texts)."""
    from data_engineer_coder_spark.operators.pipelines import (
        pretraining_corpus_build,
    )

    base = {r["source"]: r for r in pretraining_corpus_build(spark, sf_dir).collect()}
    rw = {
        r["source"]: r
        for r in pretraining_corpus_build(
            spark, sf_dir, substring_dedup=True
        ).collect()
    }
    assert set(base) == set(rw)
    for src, r in rw.items():
        assert (
            r["n_fail_quality"] + r["n_dup"] + r["n_contaminated"] + r["n_kept"]
            == r["n_input"]
        )
        b = base[src]
        assert r["n_input"] == b["n_input"]
        assert r["n_fail_quality"] == b["n_fail_quality"]
        assert r["n_dup"] >= b["n_dup"]  # rewrite-dropped docs land here
        if r["n_contaminated"] == b["n_contaminated"]:
            # same decontamination outcome → cleaning only shrinks text
            assert r["kept_tokens"] <= b["kept_tokens"]
    # the rewrite can also DE-contaminate a doc (the leaked 8-gram sat
    # inside a removed duplicated span) — contamination never grows at
    # this fixture, and the corpus-wide kept token mass shrinks
    assert sum(r["n_contaminated"] for r in rw.values()) <= sum(
        b["n_contaminated"] for b in base.values()
    )
    assert sum(r["kept_tokens"] for r in rw.values()) < sum(
        b["kept_tokens"] for b in base.values()
    )


def test_pq_codebook_artifact_cached_and_bitstable(spark, sf_dir):
    """The standing codebook artifact must equal an in-plan training
    pass bit-for-bit, and the second call must hit the cache (same ACID
    table version — no retrain commit)."""
    import hashlib
    import os
    import tempfile

    from data_engineer_coder_spark.io.acid_table import current_manifest
    from data_engineer_coder_spark.io.tables import table as t
    from data_engineer_coder_spark.operators.similarity import (
        _PQ_K,
        _PQ_SUBDIM,
        _PQ_SUBS,
        _corpus_fingerprint,
        _pq_codebook_row,
        _pq_seed_row,
        _pq_train,
        _qvec,
    )

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("qv")
    )
    fresh = _pq_train(emb, _pq_seed_row(emb)).collect()[0]["cb"]
    stored = _pq_codebook_row(spark, sf_dir).collect()[0]["cb"]
    assert stored == fresh

    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"pq-v1|{_PQ_SUBS}|{_PQ_SUBDIM}|{_PQ_K}|{os.path.realpath(src)}|"
        f"{_corpus_fingerprint(src)}".encode()
    ).hexdigest()
    root = os.path.join(
        tempfile.gettempdir(), "decs_artifacts", "pq_codebook", key
    )
    v1 = current_manifest(root)["version"]
    again = _pq_codebook_row(spark, sf_dir).collect()[0]["cb"]
    assert again == fresh
    assert current_manifest(root)["version"] == v1  # cache hit, no commit


def test_curation_gate_verdicts_and_replay_noop(spark, tmp_path):
    """T8i: the unified curation gate must (a) reject a cross-epoch
    near-dup via the standing index, (b) keep-first within a batch,
    (c) quarantine an eval-contaminated doc WITH its row, (d) accept
    the rest, (e) keep a quarantined doc OUT of the near-dup index (its
    later near-dup is judged by decontamination, not the index), and
    (f) stay exactly-once across a full stream replay — every table's
    version unchanged."""
    import os as _os
    import time as _time

    from data_engineer_coder_spark.io.acid_table import (
        current_manifest,
        read_table,
        replace_partitions,
    )
    from data_engineer_coder_spark.operators.textops import _DECON_N, ngram_array
    from data_engineer_coder_spark.streaming.core import write_stream_curation_gate

    # eval doc: 8+ words → one 8-gram index entry family
    eval_text = "the secret benchmark answer is forty two exactly no more"
    dup = "a perfectly ordinary training document about spark and parquet files"
    uniq = "another unrelated document mentioning manifests commits and snapshots"
    contaminated = f"prefix words here then {eval_text} trailing tail"
    e0 = [(10, dup), (12, contaminated), (14, uniq)]
    e1 = [(21, dup), (23, contaminated)]  # 21 near-dups indexed 10;
    # 23 near-dups QUARANTINED 12 — must be caught by decontamination
    # (12 never entered the index), not accepted
    src = str(tmp_path / "src")
    _os.makedirs(src)
    now = _time.time()
    for i, rows in enumerate((e0, e1)):
        part = str(tmp_path / f"p{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(part)
        f = next(x for x in _os.listdir(part) if x.endswith(".parquet"))
        dst = _os.path.join(src, f"e{i}.parquet")
        _os.rename(_os.path.join(part, f), dst)
        _os.utime(dst, (now + 30 * i, now + 30 * i))
    schema = spark.read.parquet(src).schema

    roots = {
        n: str(tmp_path / n)
        for n in ("eval", "sigs", "docs", "quarantine", "verdicts", "stats")
    }
    ev = (
        spark.createDataFrame([(eval_text,)], "text string")
        .select(F.explode(ngram_array(F.split("text", " "), _DECON_N)).alias("g"))
        .distinct()
        .withColumn("b", F.lit(0))
    )
    replace_partitions(ev, roots["eval"], ["b"], "eval-build")

    def _run():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = write_stream_curation_gate(
            sdf, roots["eval"], roots["sigs"], roots["docs"],
            roots["quarantine"], roots["verdicts"], roots["stats"],
        )
        q.awaitTermination(300)

    _run()
    v = {
        (int(r["doc_id"]), int(r["epoch"])): r["verdict"]
        for r in read_table(spark, roots["verdicts"]).collect()
    }
    assert v[(10, 0)] == "accepted"
    assert v[(12, 0)] == "quarantined_contaminated"
    assert v[(14, 0)] == "accepted"
    assert v[(21, 1)] == "rejected_neardup_index"   # near-dup of indexed 10
    assert v[(23, 1)] == "quarantined_contaminated"  # 12 not in index → decontam catches it
    assert sorted(r["doc_id"] for r in read_table(spark, roots["docs"]).collect()) == [10, 14]
    assert sorted(
        r["doc_id"] for r in read_table(spark, roots["quarantine"]).collect()
    ) == [12, 23]
    # the index holds ONLY accepted docs' signatures
    assert sorted(
        r["doc_id"] for r in read_table(spark, roots["sigs"]).collect()
    ) == [10, 14]
    ledger = {
        int(r["epoch"]): (r["n_arrived"], r["n_rejected_index"],
                          r["n_rejected_batch"], r["n_quarantined"],
                          r["n_accepted"])
        for r in read_table(spark, roots["stats"]).collect()
    }
    assert ledger[0] == (3, 0, 0, 1, 2)
    assert ledger[1] == (2, 1, 0, 1, 0)

    v_before = {n: current_manifest(roots[n])["version"] for n in roots}
    _run()  # fresh checkpoint → full replay of both epochs
    for n, ver in v_before.items():
        assert current_manifest(roots[n])["version"] == ver, n
    assert read_table(spark, roots["verdicts"]).count() == 5


def test_ann_index_gate_matches_batch_and_replay_noop(spark, tmp_path):
    """T8j: the streaming ANN-index gate must (a) produce exactly the
    cell assignment + PQ codes the batch plan computes from the same
    standing artifacts (streaming == batch), (b) lay the index out by
    cell bucket (``centroid_id % index_buckets``), and (c) stay
    exactly-once across a full stream replay — index and ledger
    versions unchanged."""
    import os as _os
    import time as _time

    from data_engineer_coder_spark.io.acid_table import (
        current_manifest,
        read_table,
        replace_partitions,
    )
    from data_engineer_coder_spark.operators.similarity import (
        _PQ_SUBS,
        _cb_row_from_entries,
        _dot,
        _ivf_cents,
        _pq_code_for,
        _pq_seed_row,
        _pq_train_entries,
        _two_level_assign,
    )
    from data_engineer_coder_spark.streaming.core import write_stream_ann_index_gate

    def mk(vid):
        return [((vid * 31 + d * 7) % 100) * 100000 for d in range(64)]

    def df_of(ids):
        d = spark.createDataFrame(
            [(i, mk(i)) for i in ids], "vec_id long, qv array<bigint>"
        )
        return d.withColumn("nrm", _dot(F.col("qv"), F.col("qv")))

    boot = df_of(range(20))  # >= _PQ_K so the 8x16 codebook grid is full
    strm = df_of(range(100, 140))
    roots = {
        n: str(tmp_path / n) for n in ("cents", "codebook", "index", "stats")
    }
    cents = _ivf_cents(boot).withColumn("b", F.pmod("centroid_id", F.lit(4)))
    replace_partitions(cents, roots["cents"], ["b"], "quantizer-build")
    cb_entries = _pq_train_entries(
        boot.select("vec_id", "qv"), _pq_seed_row(boot.select("vec_id", "qv"))
    ).localCheckpoint()
    replace_partitions(cb_entries, roots["codebook"], ["s"], "quantizer-build")

    # two ordered epochs: even vec_ids then odd
    src = str(tmp_path / "src")
    _os.makedirs(src)
    now = _time.time()
    for i, pred in enumerate((F.col("vec_id") % 2 == 0, F.col("vec_id") % 2 == 1)):
        part = str(tmp_path / f"p{i}")
        strm.filter(pred).coalesce(1).write.parquet(part)
        f = next(x for x in _os.listdir(part) if x.endswith(".parquet"))
        dst = _os.path.join(src, f"e{i}.parquet")
        _os.rename(_os.path.join(part, f), dst)
        _os.utime(dst, (now + 30 * i, now + 30 * i))
    schema = spark.read.parquet(src).schema

    def _run():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = write_stream_ann_index_gate(
            sdf, roots["cents"], roots["codebook"],
            roots["index"], roots["stats"],
        )
        q.awaitTermination(300)

    _run()
    idx = {
        int(r["vec_id"]): r
        for r in read_table(spark, roots["index"]).collect()
    }
    assert sorted(idx) == list(range(100, 140))

    # batch twin from the SAME standing artifacts
    cfrm = _ivf_cents(boot).localCheckpoint(eager=False)
    asg = _two_level_assign(strm, cfrm)
    cb_row = _cb_row_from_entries(cb_entries)
    want = {
        int(r["vec_id"]): r
        for r in asg.crossJoin(F.broadcast(cb_row))
        .select(
            "vec_id",
            "centroid_id",
            F.floor((F.col("c_sim") + 1) * 1e6).cast("bigint").alias("sim_e6"),
            F.array(
                *[_pq_code_for(F.lit(s)) for s in range(_PQ_SUBS)]
            ).alias("codes"),
        )
        .collect()
    }
    for vid, got in idx.items():
        assert int(got["centroid_id"]) == int(want[vid]["centroid_id"]), vid
        assert list(got["codes"]) == list(want[vid]["codes"]), vid
        assert int(got["sim_e6"]) == int(want[vid]["sim_e6"]), vid
        # the physical layout key: inverted lists co-locate by bucket
        assert int(got["cell_bucket"]) == int(got["centroid_id"]) % 16, vid
        # epochs were even-then-odd
        assert int(got["epoch"]) == vid % 2, vid

    ledger = {
        int(r["epoch"]): int(r["n_arrived"])
        for r in read_table(spark, roots["stats"]).collect()
    }
    assert ledger == {0: 20, 1: 20}

    v_before = {n: current_manifest(roots[n])["version"] for n in roots}
    _run()  # fresh checkpoint → full replay of both epochs
    for n, ver in v_before.items():
        assert current_manifest(roots[n])["version"] == ver, n
    assert read_table(spark, roots["index"]).count() == 40


def test_curation_gate_crash_mid_epoch_converges(spark, tmp_path, monkeypatch):
    """The multi-table epoch claim under an ACTUAL mid-epoch crash: kill
    the gate AFTER the docs-table commit but BEFORE quarantine/index/
    verdicts/ledger, then restart with a fresh checkpoint.  The replayed
    epoch must no-op the already-committed docs append (same txid) and
    complete the missing tables — converging to exactly the state an
    uncrashed run produces, with no duplicated rows anywhere."""
    import os as _os
    import time as _time

    import data_engineer_coder_spark.io.acid_table as at
    from data_engineer_coder_spark.io.acid_table import (
        read_table,
        replace_partitions,
    )
    from data_engineer_coder_spark.operators.textops import _DECON_N, ngram_array
    from data_engineer_coder_spark.streaming import core as score

    eval_text = "the secret benchmark answer is forty two exactly no more"
    dup = "a perfectly ordinary training document about spark and parquet files"
    uniq = "another unrelated document mentioning manifests commits and snapshots"
    contaminated = f"prefix words here then {eval_text} trailing tail"
    e0 = [(10, dup), (12, contaminated), (14, uniq)]
    e1 = [(21, dup)]  # near-dup of indexed 10 → rejected in epoch 1
    src = str(tmp_path / "src")
    _os.makedirs(src)
    now = _time.time()
    for i, rows in enumerate((e0, e1)):
        part = str(tmp_path / f"p{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(part)
        f = next(x for x in _os.listdir(part) if x.endswith(".parquet"))
        dst = _os.path.join(src, f"e{i}.parquet")
        _os.rename(_os.path.join(part, f), dst)
        _os.utime(dst, (now + 30 * i, now + 30 * i))
    schema = spark.read.parquet(src).schema

    roots = {
        n: str(tmp_path / n)
        for n in ("eval", "sigs", "docs", "quarantine", "verdicts", "stats")
    }
    ev = (
        spark.createDataFrame([(eval_text,)], "text string")
        .select(F.explode(ngram_array(F.split("text", " "), _DECON_N)).alias("g"))
        .distinct()
        .withColumn("b", F.lit(0))
    )
    replace_partitions(ev, roots["eval"], ["b"], "eval-build")

    def _run():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = score.write_stream_curation_gate(
            sdf, roots["eval"], roots["sigs"], roots["docs"],
            roots["quarantine"], roots["verdicts"], roots["stats"],
        )
        q.awaitTermination(300)

    # crash injection: the SECOND standing-table append of epoch 0 (the
    # quarantine commit — docs are already durable by then) blows up
    real = at.append_partitions
    calls = {"n": 0}

    def flaky(df, root, cols, txid, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash mid-epoch")
        return real(df, root, cols, txid, *a, **k)

    monkeypatch.setattr(at, "append_partitions", flaky)
    try:
        _run()
        raise AssertionError("injected crash did not surface")
    except Exception as e:  # StreamingQueryException wraps the injection
        assert "injected crash" in str(e)
    monkeypatch.setattr(at, "append_partitions", real)

    # torn state: docs committed for epoch 0, everything else missing
    assert sorted(r["doc_id"] for r in read_table(spark, roots["docs"]).collect()) == [10, 14]
    for n in ("quarantine", "verdicts", "stats"):
        try:
            cnt = read_table(spark, roots[n]).count()
        except ValueError:
            cnt = 0
        assert cnt == 0, n

    _run()  # fresh checkpoint → full replay; epoch-0 docs append no-ops

    assert sorted(r["doc_id"] for r in read_table(spark, roots["docs"]).collect()) == [10, 14]
    assert [r["doc_id"] for r in read_table(spark, roots["quarantine"]).collect()] == [12]
    v = {
        (int(r["doc_id"]), int(r["epoch"])): r["verdict"]
        for r in read_table(spark, roots["verdicts"]).collect()
    }
    assert v == {
        (10, 0): "accepted",
        (12, 0): "quarantined_contaminated",
        (14, 0): "accepted",
        (21, 1): "rejected_neardup_index",
    }
    ledger = {
        int(r["epoch"]): (r["n_arrived"], r["n_rejected_index"],
                          r["n_rejected_batch"], r["n_quarantined"],
                          r["n_accepted"])
        for r in read_table(spark, roots["stats"]).collect()
    }
    assert ledger == {0: (3, 0, 0, 1, 2), 1: (1, 1, 0, 0, 0)}


def test_ann_index_gate_crash_mid_epoch_converges(spark, tmp_path, monkeypatch):
    """T8j under a torn epoch: crash AFTER the index append but BEFORE
    the ledger commit, restart from a fresh checkpoint, and assert the
    replay no-ops the durable index append and completes the ledger —
    no duplicated index rows, ledger consistent with the index."""
    import os as _os
    import time as _time

    import data_engineer_coder_spark.io.acid_table as at
    from data_engineer_coder_spark.io.acid_table import (
        read_table,
        replace_partitions,
    )
    from data_engineer_coder_spark.operators.similarity import (
        _dot,
        _ivf_cents,
        _pq_seed_row,
        _pq_train_entries,
    )
    from data_engineer_coder_spark.streaming import core as score

    def mk(vid):
        return [((vid * 31 + d * 7) % 100) * 100000 for d in range(64)]

    def df_of(ids):
        d = spark.createDataFrame(
            [(i, mk(i)) for i in ids], "vec_id long, qv array<bigint>"
        )
        return d.withColumn("nrm", _dot(F.col("qv"), F.col("qv")))

    boot = df_of(range(20))
    strm = df_of(range(100, 120))
    roots = {
        n: str(tmp_path / n) for n in ("cents", "codebook", "index", "stats")
    }
    replace_partitions(
        _ivf_cents(boot).withColumn("b", F.pmod("centroid_id", F.lit(4))),
        roots["cents"], ["b"], "quantizer-build",
    )
    replace_partitions(
        _pq_train_entries(
            boot.select("vec_id", "qv"), _pq_seed_row(boot.select("vec_id", "qv"))
        ),
        roots["codebook"], ["s"], "quantizer-build",
    )
    src = str(tmp_path / "src")
    _os.makedirs(src)
    part = str(tmp_path / "p0")
    strm.coalesce(1).write.parquet(part)
    f = next(x for x in _os.listdir(part) if x.endswith(".parquet"))
    _os.rename(_os.path.join(part, f), _os.path.join(src, "e0.parquet"))
    _os.utime(_os.path.join(src, "e0.parquet"), (_time.time(), _time.time()))
    schema = spark.read.parquet(src).schema

    def _run():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = score.write_stream_ann_index_gate(
            sdf, roots["cents"], roots["codebook"],
            roots["index"], roots["stats"],
        )
        q.awaitTermination(300)

    # the one-row ledger commits through the driver-side append_rows
    # fast path (round 15); the index append stays a Spark write — so
    # the torn-epoch seam is: let the index append land, kill the
    # ledger's append_rows commit
    real_rows = at.append_rows

    def flaky_rows(spark_, rows, schema, root, cols, txid, *a, **k):
        raise RuntimeError("injected crash mid-epoch")

    monkeypatch.setattr(at, "append_rows", flaky_rows)
    try:
        _run()
        raise AssertionError("injected crash did not surface")
    except Exception as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(at, "append_rows", real_rows)

    assert read_table(spark, roots["index"]).count() == 20  # durable
    try:
        n_ledger = read_table(spark, roots["stats"]).count()
    except ValueError:
        n_ledger = 0
    assert n_ledger == 0  # torn

    _run()  # replay: index append no-ops, ledger completes

    idx = read_table(spark, roots["index"]).collect()
    assert len(idx) == 20
    assert sorted(int(r["vec_id"]) for r in idx) == list(range(100, 120))
    ledger = read_table(spark, roots["stats"]).collect()
    assert len(ledger) == 1 and int(ledger[0]["n_arrived"]) == 20
    assert int(ledger[0]["arrived_id_sum"]) == sum(range(100, 120))


def test_mmr_diversifies_and_keeps_relevance(spark, sf_dir):
    """MMR property pins on the fixture: (a) the selection's total
    redundancy (mean pairwise within-result sim) is strictly below the
    plain top-5's when summed across probes — the diversification does
    something; (b) every pick comes from the probe's top-20 relevance
    pool (MMR trades rank, never leaves the pool); (c) step 1 equals
    the plain argmax (pure relevance before any redundancy term)."""
    from data_engineer_coder_spark.operators.similarity import (
        mmr_diversified_topk,
        mmr_diversity_check,
    )

    div = mmr_diversity_check(spark, sf_dir).collect()
    assert sum(r["diversity_gain_e6"] for r in div) > 0
    picks = mmr_diversified_topk(spark, sf_dir).collect()
    by_probe = {}
    for r in picks:
        by_probe.setdefault(r["probe_id"], {})[r["step"]] = r["neighbor_id"]
    assert all(len(v) == 5 for v in by_probe.values())

    from pyspark.sql import Window

    from data_engineer_coder_spark.io.tables import table as _table
    from data_engineer_coder_spark.operators.similarity import (
        _MMR_POOL,
        _MMR_PROBES,
        _cosine,
        _dot,
        _qvec,
    )

    emb = _table(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("qv")
    )
    n = emb.select("vec_id", "qv", _dot(F.col("qv"), F.col("qv")).alias("nrm"))
    probes = n.filter(F.col("vec_id") < _MMR_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("qv").alias("pqv"),
        F.col("nrm").alias("pnrm"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("qsim"), F.asc("vec_id"))
    pool = {
        (r["probe_id"], r["vec_id"]): r["rn"]
        for r in F.broadcast(probes)
        .join(n, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            _cosine(
                _dot(F.col("pqv"), F.col("qv")), F.col("pnrm"), F.col("nrm")
            ).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_POOL)
        .collect()
    }
    for pid, steps in by_probe.items():
        for nb in steps.values():
            assert (pid, nb) in pool, (pid, nb)
        # step 1 is the pure-relevance argmax (pool rank 1)
        assert pool[(pid, steps[1])] == 1, pid


def test_bm25_prefers_rare_term_matches(spark):
    """BM25 semantics on a controlled corpus: a candidate matching the
    query's RARE term must outrank one matching only the common term
    (idf dominates), and term-frequency saturation keeps a tf=50 spam
    doc from beating a doc that matches one more distinct rare term."""
    import duckdb

    from data_engineer_coder_spark.registry import oracle_sql

    rows = [
        (0, "zebra quartz common common"),            # the probe (doc_id < 10)
        (11, "zebra common"),                          # rare match
        (12, "common common"),                         # common-only match
        (13, "zebra quartz"),                          # two rare matches
        (14, " ".join(["common"] * 50)),               # tf spam, common only
        (15, "unrelated words entirely different"),
        (16, "another filler document here now"),
    ]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    out = con.execute(oracle_sql()["bm25_topk"]).fetchdf()
    r = {
        int(x.doc_id): int(x.rn)
        for x in out[out.probe_id == 0].itertuples()
    }
    assert r[13] < r[11] < r[12], r   # two rares > one rare > common-only
    assert r[13] < r[14] and r[11] < r[14], r  # saturation beats tf spam
