"""Round-7 operator tests: segment dedup transform, bigram LM score,
Misra-Gries heavy hitters, principal-direction power iteration."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_engineer_coder_spark.io.tables import table


def test_segment_dedup_keeps_each_distinct_segment_once(spark, sf_dir):
    """Keep-first means every distinct 8-word segment survives EXACTLY
    once corpus-wide: Σ n_kept == count(distinct segment)."""
    from data_engineer_coder_spark.operators.dedup import (
        _SEG_WORDS,
        segment_dedup_keep_first,
    )

    out = segment_dedup_keep_first(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents")
    k = _SEG_WORDS
    ws = F.split("text", " ")
    n_full = F.floor(F.size(ws) / k).cast("int")
    segs = F.transform(
        F.when(n_full >= 1, F.sequence(F.lit(1), n_full)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.array_join(F.slice(ws, (i - 1) * k + 1, k), " "),
    )
    n_distinct = (
        docs.select(F.explode(segs).alias("seg")).select("seg").distinct().count()
    )
    assert int(out["n_kept"].sum()) == n_distinct


def test_segment_dedup_clean_hash_for_undeduped_doc(spark, sf_dir):
    """A doc whose segments are all first occurrences must hash to its
    own full segment join."""
    from data_engineer_coder_spark.operators.dedup import (
        _SEG_WORDS,
        segment_dedup_keep_first,
    )

    out = segment_dedup_keep_first(spark, sf_dir).toPandas().set_index("doc_id")
    docs = table(spark, sf_dir, "documents").toPandas().set_index("doc_id")
    k = _SEG_WORDS
    checked = 0
    for doc_id, row in docs.iterrows():
        words = row["text"].split(" ")
        segs = [
            " ".join(words[i * k : (i + 1) * k]) for i in range(len(words) // k)
        ]
        if not segs or doc_id not in out.index:
            continue
        if out.loc[doc_id, "n_kept"] == len(segs):  # nothing was cut
            want = hashlib.md5(" ".join(segs).encode()).hexdigest()
            assert out.loc[doc_id, "clean_hash"] == want
            checked += 1
        if checked >= 25:
            break
    assert checked > 0


def test_bigram_logprob_bounds_and_counts(spark, sf_dir):
    from data_engineer_coder_spark.operators.textops import bigram_logprob_score

    out = bigram_logprob_score(spark, sf_dir).toPandas()
    assert (out["mean_logprob"] <= 0).all()
    docs = table(spark, sf_dir, "documents").toPandas()
    n_words = docs.set_index("doc_id")["text"].str.split(" ").str.len()
    for _, r in out.head(50).iterrows():
        assert r["n_bigrams"] == n_words[r["doc_id"]] - 1


def test_mg_sketch_guarantee_on_synthetic_zipf():
    """Pure-pandas check of the sketch itself under real eviction (the
    parquet fixture's 31-word vocab never evicts): every item with true
    count > N/(k+1) must survive per-partition sketches + the two-level
    tree merge — exactly the stages approx_topk_tokens runs."""
    from data_engineer_coder_spark.operators.textops import (
        _MG_K,
        _mg_merge_pdf,
        _mg_partition_sketch,
    )

    rng = np.random.default_rng(3)
    n = 200_000
    terms = np.where(
        rng.random(n) < 0.4,
        rng.integers(0, 8, n),  # 8 heavy hitters share 40%
        rng.integers(8, 5000, n),  # 5k-term tail
    ).astype(str)
    # pack the stream into 10-token documents across 16 "partitions",
    # each partition fed to the sketch as two Arrow-batch-sized chunks
    docs = [" ".join(terms[i : i + 10]) for i in range(0, n, 10)]
    parts = [docs[p::16] for p in range(16)]
    sketches = []
    for pdocs in parts:
        half = len(pdocs) // 2
        batches = iter(
            [pd.DataFrame({"text": pdocs[:half]}), pd.DataFrame({"text": pdocs[half:]})]
        )
        sketches.extend(_mg_partition_sketch(batches))
    # two-level tree merge: 16 summaries → 4 groups → 1
    level1 = [
        _mg_merge_pdf(pd.concat(sketches[g::4], ignore_index=True)) for g in range(4)
    ]
    merged = _mg_merge_pdf(pd.concat(level1, ignore_index=True))
    true_counts = pd.Series(terms).value_counts()
    heavy = set(true_counts[true_counts > n / (_MG_K + 1)].index)
    assert heavy, "fixture lost its heavy hitters"
    missed = heavy - set(merged["term"])
    assert not missed, f"MG guarantee violated: {missed}"


def test_approx_topk_matches_exact_topk(spark, sf_dir):
    from data_engineer_coder_spark.operators.textops import (
        _MG_TOP,
        approx_topk_tokens,
    )

    got = approx_topk_tokens(spark, sf_dir).toPandas()
    tok = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    want = (
        tok.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(_MG_TOP)
        .toPandas()
    )
    assert got.sort_values("rank")["term"].tolist() == want["term"].tolist()
    assert got.sort_values("rank")["cnt"].tolist() == want["cnt"].tolist()


def test_principal_direction_matches_numpy_replay(spark, sf_dir):
    """Replicate the exact integer pipeline in numpy: identical loadings
    (not approximately — bit-for-bit, that's the whole design)."""
    from data_engineer_coder_spark.operators.similarity import (
        _PCA_GRID,
        _PCA_SCALE,
        embedding_principal_direction,
    )

    out = (
        embedding_principal_direction(spark, sf_dir)
        .toPandas()
        .sort_values("dim")["loading"]
        .to_numpy()
    )
    emb = np.array(
        table(spark, sf_dir, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    q = np.floor(emb * _PCA_SCALE + 0.5).astype(np.int64)
    cells = q.T @ q  # exact in int64 at fixture scale
    m = np.abs(cells).max()
    covq = np.floor(cells.astype(np.float64) / m * _PCA_GRID + 0.5).astype(np.int64)
    v1 = covq.sum(axis=1)
    v1q = np.floor(v1.astype(np.float64) / np.abs(v1).max() * _PCA_GRID + 0.5).astype(
        np.int64
    )
    v2 = covq @ v1q
    v2q = np.floor(v2.astype(np.float64) / np.abs(v2).max() * _PCA_GRID + 0.5).astype(
        np.int64
    )
    assert out.tolist() == v2q.tolist()
    assert np.abs(out).max() == _PCA_GRID  # the peak dim sits on the grid edge


def test_unimax_allocation_waterfill_invariants(spark, sf_dir):
    """Σ allocation ≤ budget with only flooring slack (< #sources), no
    source exceeds its cap, capped sources are exactly the ones under
    the water level."""
    from data_engineer_coder_spark.operators.packing import (
        _UNIMAX_EPOCHS,
        unimax_allocation,
    )

    out = unimax_allocation(spark, sf_dir).toPandas()
    assert (out["allocation"] <= out["tokens"] * _UNIMAX_EPOCHS).all()
    total = int(out["tokens"].sum())
    budget = total * 8 // 10
    allocated = int(out["allocation"].sum())
    assert allocated <= budget
    # θ = floor(avail/r) ⇒ slack = avail − θ·r < r ≤ #sources
    assert budget - allocated < len(out)
    # uncapped sources all share one water level
    uncapped = out[out["allocation"] < out["tokens"] * _UNIMAX_EPOCHS]
    assert uncapped["allocation"].nunique() == 1
    theta = int(uncapped["allocation"].iloc[0])
    capped = out[out["allocation"] == out["tokens"] * _UNIMAX_EPOCHS]
    assert (capped["tokens"] * _UNIMAX_EPOCHS <= theta).all()


def test_ccnet_buckets_are_balanced_terciles(spark, sf_dir):
    from data_engineer_coder_spark.operators.textops import ccnet_perplexity_buckets
    from data_engineer_coder_spark.io.tables import table as t

    out = ccnet_perplexity_buckets(spark, sf_dir).toPandas()
    docs = t(spark, sf_dir, "documents").groupBy("lang").count().toPandas()
    per_lang = out.groupby("lang")["n_docs"].sum().to_dict()
    for _, r in docs.iterrows():
        assert per_lang[r["lang"]] == r["count"]
    for lang, grp in out.groupby("lang"):
        assert set(grp["bucket"]) == {"head", "middle", "tail"}
        assert grp["n_docs"].max() - grp["n_docs"].min() <= 1  # NTILE balance
        # head scores above tail
        h = grp.set_index("bucket")["avg_score_micro"]
        assert h["head"] >= h["middle"] >= h["tail"]


def test_semdedup_greedy_is_maximal_independent_and_superset(spark, sf_dir):
    """True keep-first greedy invariants: within each cluster the kept
    set is a maximal independent set of the cos≥τ graph (no two kept
    are neighbors; every dropped vector has a kept smaller-id
    neighbor), and greedy keeps ⊇ transitive-suppression keeps."""
    import numpy as np

    from data_engineer_coder_spark.operators.similarity import (
        _SEMDEDUP_TAU,
        _semdedup_assign,
        semdedup_greedy_keep_first,
        semdedup_prune,
    )

    greedy = semdedup_greedy_keep_first(spark, sf_dir).toPandas()
    prune = semdedup_prune(spark, sf_dir).toPandas()
    g_kept = set(greedy[greedy.kept].vec_id)
    p_kept = set(prune[prune.kept].vec_id)
    assert p_kept <= g_kept
    assert len(greedy) == len(prune)

    # rebuild the threshold graph per cluster in numpy
    assigned = _semdedup_assign(spark, sf_dir).toPandas()
    by_cluster = assigned.groupby("centroid_id")
    checked_pairs = 0
    for cid, grp in by_cluster:
        ids = grp["vec_id"].to_numpy()
        Q = np.array(grp["qv"].tolist(), dtype=np.float64)
        nrm = grp["nrm"].to_numpy(dtype=np.float64)
        cos = (Q @ Q.T) / np.sqrt(np.outer(nrm, nrm))
        kept_mask = np.isin(ids, list(g_kept))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if cos[i, j] >= _SEMDEDUP_TAU:
                    checked_pairs += 1
                    assert not (kept_mask[i] and kept_mask[j]), (ids[i], ids[j])
        # every dropped vector has a kept smaller-id neighbor
        for j in range(len(ids)):
            if not kept_mask[j]:
                assert any(
                    kept_mask[i] and cos[i, j] >= _SEMDEDUP_TAU and ids[i] < ids[j]
                    for i in range(len(ids))
                ), ids[j]
    assert checked_pairs > 0


def test_curation_funnel_v2_conserves_counts(spark, sf_dir):
    """Funnel ledger conservation: docs kept + tail dropped == corpus;
    kept segments ≤ incoming segments; allocation ≤ clean tokens with
    Σ allocation inside the 0.8 budget."""
    from data_engineer_coder_spark.operators.pipelines import curation_funnel_v2

    out = curation_funnel_v2(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").groupBy("source").count().toPandas()
    per_src = docs.set_index("source")["count"]
    for _, r in out.iterrows():
        assert r["n_docs_kept"] + r["n_tail_dropped"] == per_src[r["source"]]
        assert r["n_segments_kept"] <= r["n_segments_in"]
        assert r["allocation"] <= r["tokens"]
    total = int(out["tokens"].sum())
    assert int(out["allocation"].sum()) <= total * 8 // 10


def test_segment_dedup_keeper_key_survives_1000_segments(spark, tmp_path):
    """ADVICE r7 regression: the old scalar keeper key doc_id*1000+pos
    collides once a doc has ≥1000 segments — (doc 1, pos 1001) and
    (doc 2, pos 1) shared key 2001, so the duplicated segment could be
    kept TWICE and 'first occurrence' could resolve to the wrong doc.
    The struct argmin must keep the shared segment exactly once, in the
    lexicographically-first (doc_id, pos) slot, and still hash-match
    the (also fixed) DuckDB oracle on this adversarial fixture."""
    import os

    import duckdb

    from data_engineer_coder_spark import registry
    from data_engineer_coder_spark.operators.dedup import (
        _SEG_WORDS,
        segment_dedup_keep_first,
    )
    from data_engineer_coder_spark.testing import run_compare

    k = _SEG_WORDS
    # doc 1: 1001 segments; the LAST one (pos 1001) is the shared segment
    shared = " ".join(["x"] * k)
    doc1 = " ".join(f"w{i}" for i in range(1000 * k)) + " " + shared
    # doc 2: shared segment FIRST (pos 1 → old key 2*1000+1 == 1*1000+1001)
    doc2 = shared + " " + " ".join(f"z{i}" for i in range(k))
    fixture = str(tmp_path / "collision")
    os.makedirs(fixture)
    spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id int, text string"
    ).coalesce(1).write.parquet(os.path.join(fixture, "documents.parquet"))

    out = segment_dedup_keep_first(spark, fixture).toPandas().set_index("doc_id")
    assert int(out.loc[1, "n_kept"]) == 1001  # doc 1 keeps everything
    assert int(out.loc[2, "n_kept"]) == 1  # shared segment cut from doc 2

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fixture}/documents.parquet/*.parquet')"
    )
    oracle = registry.oracle_sql()["segment_dedup_keep_first"]
    problems = run_compare(spark, con, segment_dedup_keep_first, oracle, fixture)
    con.close()
    assert not problems, problems
