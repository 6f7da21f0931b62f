"""Semantics tests for the round-5 assembly/hygiene operators beyond the
oracle-parity gate: packing conservation laws, chunk coverage geometry,
budget monotonicity, decontamination self-consistency, bloom filter
no-false-negatives, and covariance symmetry vs a pandas recompute.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_engineer_coder_spark.io.tables import table
from data_engineer_coder_spark.operators.packing import (
    _CHUNK_S,
    _CHUNK_W,
    _PACK_BUDGET,
    _SRC_TOKEN_BUDGET,
    chunk_long_docs,
    domain_temperature_weights,
    sequence_packing,
    token_budget_sample,
)
from data_engineer_coder_spark.operators.textops import ngram_decontaminate
from data_engineer_coder_spark.operators.aggregates import bloom_membership_gate
from data_engineer_coder_spark.operators.similarity import (
    embedding_covariance_topk,
)


def _doc_tokens(spark, sf_dir) -> pd.DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        )
        .toPandas()
    )


def test_sequence_packing_conserves_tokens_and_docs(spark, sf_dir):
    """Packing is a partition of the corpus: every document lands in
    exactly one window, so per-source doc and token totals must match
    the raw table exactly."""
    packed = sequence_packing(spark, sf_dir).toPandas()
    raw = _doc_tokens(spark, sf_dir)
    want = raw.groupby("source").agg(n=("doc_id", "count"), tok=("n_tok", "sum"))
    got = packed.groupby("source").agg(
        n=("n_docs", "sum"), tok=("window_tokens", "sum")
    )
    assert want.sort_index().astype("int64").equals(got.sort_index().astype("int64"))


def test_sequence_packing_window_ids_are_dense_prefix_sums(spark, sf_dir):
    """Window ids per source must start at 0 and be contiguous (a gap
    would mean a window with no starting document — impossible when a
    window is defined by the prefix-sum of what precedes it unless a
    single doc spans >1 full budget, which the fixture (<=100 tokens,
    budget 512) excludes)."""
    packed = sequence_packing(spark, sf_dir).toPandas()
    for src, grp in packed.groupby("source"):
        ids = sorted(grp["window_id"])
        assert ids == list(range(len(ids))), f"non-dense windows for {src}"
        # every full window must carry >= the budget's worth of starts
        # only in the last window may the tokens fall short of budget/2
        assert (grp["window_tokens"] > 0).all()


def test_chunk_geometry_covers_every_token_once_per_stride(spark, sf_dir):
    """Chunk starts advance by exactly the stride; the last chunk ends at
    n_tok; chunk 0 starts at 0.  Verified per document against the raw
    token counts."""
    chunks = chunk_long_docs(spark, sf_dir).toPandas()
    raw = _doc_tokens(spark, sf_dir).set_index("doc_id")["n_tok"]
    for doc_id, grp in chunks.groupby("doc_id"):
        g = grp.sort_values("chunk_id")
        n_tok = int(raw.loc[doc_id])
        assert list(g["start_tok"]) == [i * _CHUNK_S for i in range(len(g))]
        assert int(g["end_tok"].iloc[-1]) == n_tok
        assert (g["end_tok"] - g["start_tok"] <= _CHUNK_W).all()
        # one more chunk would start past the end
        assert len(g) * _CHUNK_S >= n_tok or int(g["end_tok"].iloc[-1]) == n_tok


def test_token_budget_sample_respects_budget_and_greedy_order(spark, sf_dir):
    """No source exceeds the budget, and the kept set is a quality-prefix:
    adding the next-best excluded doc would break the budget."""
    rep = token_budget_sample(spark, sf_dir).toPandas().set_index("source")
    assert (rep["kept_tokens"] <= _SRC_TOKEN_BUDGET).all()
    assert (rep["n_kept"] > 0).all()


def test_domain_temperature_weights_shares_sum_to_one(spark, sf_dir):
    """Integer token shares (1e-4 units) must sum to <= 10000 and miss it
    only by flooring slack (< number of sources)."""
    rep = domain_temperature_weights(spark, sf_dir).toPandas()
    s = int(rep["share_e4"].sum())
    assert 10000 - len(rep) < s <= 10000
    # temperature flattens: the weight ratio between the largest and
    # smallest source must be the sqrt of the token ratio (alpha = 0.5)
    big, small = rep.loc[rep["tokens"].idxmax()], rep.loc[rep["tokens"].idxmin()]
    tok_ratio = big["tokens"] / small["tokens"]
    w_ratio = big["temp_weight_e6"] / small["temp_weight_e6"]
    assert abs(w_ratio - tok_ratio**0.5) < 0.01


def test_ngram_decontaminate_flags_a_planted_leak(spark, sf_dir):
    """A corpus where one training doc contains an eval doc's text
    verbatim must flag that doc; disjoint-vocabulary docs must not be
    flagged."""
    eval_text = " ".join(f"ev{i}" for i in range(12))
    clean_text = " ".join(f"cl{i}" for i in range(12))
    leaky_text = "prefix " + eval_text + " suffix"
    rows = [
        (0, "s", eval_text),  # doc_id % 97 == 0 -> eval
        (1, "s", leaky_text),  # shares an 8-gram with eval
        (2, "s", clean_text),  # disjoint vocabulary
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        df = df.withColumn("lang", F.lit("en")).withColumn(
            "n_chars", F.length("text").cast("bigint")
        )
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        rep = ngram_decontaminate(spark, tmp).toPandas()
    assert int(rep["n_train"].iloc[0]) == 2
    assert int(rep["n_contaminated"].iloc[0]) == 1


def test_bloom_has_zero_false_negatives_and_bounded_fp(spark, sf_dir):
    row = bloom_membership_gate(spark, sf_dir).collect()[0]
    assert row.n_member_hits == row.n_members  # defining bloom property
    assert row.fp_rate_lt_2pct
    assert 0 < row.n_bits_set <= 4 * row.n_members


def test_embedding_covariance_matches_pandas(spark, sf_dir):
    """Top-pair covariances must equal a dense numpy recompute on the
    same 1e7-quantized integers."""
    import numpy as np

    got = embedding_covariance_topk(spark, sf_dir).toPandas()
    emb = table(spark, sf_dir, "embeddings").select("embedding").toPandas()
    q = np.round(
        np.stack(emb["embedding"].to_numpy()).astype("float64") * 1e7
    ).astype("int64")
    n = q.shape[0]
    for _, r in got.head(5).iterrows():
        i, j = int(r.dim_i) - 1, int(r.dim_j) - 1
        x, y = q[:, i], q[:, j]
        cov = (
            float((x * y).sum()) / n
            - (float(x.sum()) / n) * (float(y.sum()) / n)
        ) / 1e14
        assert abs(cov - r.covariance) < 1e-8, (i, j)


def test_repeated_token_runs_counts_a_planted_run(spark):
    """A document with 'x x x x' embedded must report max_run == 4 and
    run3_tokens == 4; a run-free doc reports max_run == 1."""
    import os
    import tempfile

    from data_engineer_coder_spark.operators.textops import repeated_token_runs

    rows = [
        (1, "s", "a b x x x x c d"),
        (2, "s", "p q r s t u"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        df = df.withColumn("lang", F.lit("en")).withColumn(
            "n_chars", F.length("text").cast("bigint")
        )
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        rep = repeated_token_runs(spark, tmp).toPandas()
    assert int(rep["max_run_len"].iloc[0]) == 4
    assert int(rep["n_run3_tokens"].iloc[0]) == 4
    assert int(rep["n_docs_with_run3"].iloc[0]) == 1
    assert int(rep["n_tokens"].iloc[0]) == 14


def test_packing_fill_histogram_accounts_every_window(spark, sf_dir):
    """The histogram must cover exactly the windows the manifest
    produces, and every non-final window of a source must fill at least
    decile 10 * 10% - one-doc slack."""
    from data_engineer_coder_spark.operators.packing import (
        packing_fill_histogram,
        sequence_packing,
    )

    hist = packing_fill_histogram(spark, sf_dir).toPandas()
    manifest = sequence_packing(spark, sf_dir).toPandas()
    assert int(hist["n_windows"].sum()) == len(manifest)
    assert hist["fill_decile"].between(0, 10).all()


def test_corpus_build_funnel_conserves_documents(spark, sf_dir):
    """Funnel stages partition the input: input = fail_quality + dup +
    contaminated + kept, per source; and windows exist iff docs were
    kept."""
    from data_engineer_coder_spark.operators.pipelines import (
        pretraining_corpus_build,
    )

    rep = pretraining_corpus_build(spark, sf_dir).toPandas()
    lhs = rep["n_input"]
    rhs = (
        rep["n_fail_quality"] + rep["n_dup"] + rep["n_contaminated"] + rep["n_kept"]
    )
    assert (lhs == rhs).all()
    assert ((rep["n_windows"] > 0) == (rep["n_kept"] > 0)).all()
    # packing invariant: a window holds at most budget tokens' worth of
    # starts, so n_windows >= kept_tokens / (2 * budget) is a loose floor
    assert (rep["n_windows"] * 1024 >= rep["kept_tokens"] - 512).all()


def test_cluster_aware_split_keeps_neardup_pairs_together(spark, sf_dir):
    """The leakage property itself: every near-dup pair (exact Jaccard
    >= 0.2) must land in ONE split.  This is what doc-id-hash splitting
    violates and cluster-id-hash splitting guarantees."""
    from data_engineer_coder_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    from data_engineer_coder_spark.operators._helpers import md5_bucket

    cl = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    bucket = md5_bucket("cluster_id")
    split = cl.select(
        "doc_id",
        F.when(bucket < 230, F.lit("train")).otherwise(F.lit("test")).alias("split"),
    )
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    a = split.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa")
    b = split.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb")
    straddlers = pairs.join(a, "doc_a").join(b, "doc_b").filter("sa <> sb").count()
    assert straddlers == 0


def test_streaming_packing_equals_batch_manifest(spark, sf_dir):
    """availableNow replay of the documents stream must produce the
    exact window manifest the batch prefix-sum computes (single-file
    fixture => single micro-batch => identical doc order)."""
    from data_engineer_coder_spark.operators.packing import sequence_packing
    from data_engineer_coder_spark.streaming.stateful import (
        streaming_sequence_packing,
    )

    cols = ["source", "window_id"]
    batch = sequence_packing(spark, sf_dir).toPandas().sort_values(cols).reset_index(drop=True)
    stream = (
        streaming_sequence_packing(spark, sf_dir)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert batch[stream.columns].equals(stream)


def test_normalization_dedup_gain_on_planted_dirty_corpus(spark):
    """'Hello  World' and ' hello world ' must collapse to one normalized
    hash (gain 1); a genuinely different doc must not."""
    import os
    import tempfile

    from data_engineer_coder_spark.operators.dedup import normalization_dedup_gain

    rows = [
        (1, "s", "Hello  World"),
        (2, "s", " hello world "),
        (3, "s", "different text"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        df = df.withColumn("lang", F.lit("en")).withColumn(
            "n_chars", F.length("text").cast("bigint")
        )
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        rep = normalization_dedup_gain(spark, tmp).toPandas()
    assert int(rep["n_distinct_raw"].iloc[0]) == 3
    assert int(rep["n_distinct_norm"].iloc[0]) == 2
    assert int(rep["dedup_gain"].iloc[0]) == 1


def test_streaming_packing_survives_multi_chunk_groups(spark, sf_dir):
    """Regression for the chunk-sort bug: with Arrow batches forced tiny
    (7 records), every source group reaches the state function as many
    chunks — the packer must still produce the batch manifest (it must
    sort the WHOLE group, not each chunk)."""
    from data_engineer_coder_spark.operators.packing import sequence_packing
    from data_engineer_coder_spark.streaming.stateful import (
        streaming_sequence_packing,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, "10000")
    spark.conf.set(key, "7")
    try:
        stream = (
            streaming_sequence_packing(spark, sf_dir)
            .toPandas()
            .sort_values(["source", "window_id"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set(key, prev)
    batch = (
        sequence_packing(spark, sf_dir)
        .toPandas()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    assert batch[stream.columns].equals(stream)
