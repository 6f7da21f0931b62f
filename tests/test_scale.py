"""Scale-layout utilities: bucketed co-located joins, salted skew joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_coder_spark.io.tables import table
from data_engineer_coder_spark.plans.scale import (
    salted_groupby_count,
    salted_join_small_skew,
    write_bucketed,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    write_bucketed(o.select("o_orderkey", "o_totalprice"), "orders_b", ["o_orderkey"], 8)
    write_bucketed(li.select("l_orderkey", "l_quantity"), "lineitem_b", ["l_orderkey"], 8)
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).withColumn(
        "v", F.col("o_totalprice") + F.col("l_quantity")
    )
    # Force a merge join so broadcast doesn't mask the bucketing effect.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(ob.join(lb, ob.o_orderkey == lb.l_orderkey))
        assert "Exchange" not in plan, plan
        assert joined.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_groupby_matches_plain(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    got = sorted(map(tuple, salted_groupby_count(ev, "event_type").collect()))
    want = sorted(map(tuple, ev.groupBy("event_type").count().collect()))
    assert got == want


def test_salted_join_matches_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    got = salted_join_small_skew(li, part, "l_partkey")
    want = li.join(part, "l_partkey")
    assert sorted(map(tuple, got.select(sorted(got.columns)).collect())) == sorted(
        map(tuple, want.select(sorted(want.columns)).collect())
    )


def test_ivf_assignment_is_partial_aggregated(spark, sf_dir):
    """The corpus→centroid argmax must partial-aggregate map-side (the
    exchange carries |corpus| rows, not |corpus| × K): plan shows a
    partial HashAggregate below the exchange and a broadcast of the
    centroid set, and no sort-merge join anywhere."""
    from data_engineer_coder_spark.registry import queries

    df = queries()["ivf_ann_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_max_by" in plan.lower() or "partial" in plan.lower(), plan


def test_tfidf_no_corpus_broadcast(spark, sf_dir):
    """tf⋈df joins on the term key; only the 1-row corpus count may
    broadcast — the term-level df table must not be collected driver-side."""
    from data_engineer_coder_spark.registry import queries

    df = queries()["tfidf_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan, plan


def test_decontaminate_probe_side_is_broadcast(spark, sf_dir):
    """The benchmark shingle set must reach the corpus join as a broadcast:
    the corpus side never shuffles for the probe."""
    from data_engineer_coder_spark.operators.dedup import decontaminate_overlap

    plan = _plan(decontaminate_overlap(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_repetition_ratio_has_no_exchange(spark, sf_dir):
    """Per-row array expressions only — a shuffle here would mean the
    operator stopped being embarrassingly parallel."""
    from data_engineer_coder_spark.operators.textops import repetition_ratio

    plan = _plan(repetition_ratio(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_multijoin_date_filters_push_down(spark, sf_dir):
    """Q5's order-date range must reach the parquet scan as PushedFilters,
    and the dims must broadcast."""
    from data_engineer_coder_spark.operators.multijoin import regional_supplier_volume

    plan = _plan(regional_supplier_volume(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan.replace(
        "\n", " "
    ), plan
    assert "BroadcastHashJoin" in plan, plan


def test_moment_agg_is_partial_aggregated(spark, sf_dir):
    """corr_regression_by_flag's moments must partial-aggregate map-side:
    two HashAggregates around one exchange, nothing else."""
    from data_engineer_coder_spark.operators.aggregates import corr_regression_by_flag

    plan = _plan(corr_regression_by_flag(spark, sf_dir))
    assert plan.count("Exchange") <= 2, plan  # agg shuffle (+AQE read)
    assert "HashAggregate" in plan, plan


def test_kmeans_assign_is_two_level(spark, sf_dir):
    """One Lloyd assign pass must use the two-level IVF shape (round 9:
    K ∝ n makes the old flat broadcast-array fold undeliverable — an
    O(n/125)-row broadcast and O(K) flops per row).  Only the ~√K
    coarse set may cross the corpus as a broadcast nested loop; the
    fine set arrives via a coarse_id equi-join."""
    import re

    from pyspark.sql import functions as F

    from data_engineer_coder_spark.io.tables import table
    from data_engineer_coder_spark.operators.similarity import (
        _dot,
        _ivf_cents,
        _qvec,
        _two_level_assign,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("qv")
    )
    n = emb.select("vec_id", "qv", _dot(F.col("qv"), F.col("qv")).alias("nrm"))
    plan = _plan(_two_level_assign(n, _ivf_cents(n)))
    assert "coarse_id" in plan, plan
    nlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    assert nlj <= 5, plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan), plan


def test_countmin_sketch_is_partial_aggregated(spark, sf_dir):
    """The 4096-cell sketch build must partial-aggregate map-side (the
    exchange carries cells, not the token stream) and probe it via
    broadcast."""
    from data_engineer_coder_spark.operators.aggregates import countmin_token_freq

    plan = _plan(countmin_token_freq(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "partial" in plan.lower(), plan


def test_pagerank_unrolls_without_jobs(spark, sf_dir):
    """The 3 fixed power iterations must build ONE lazy plan (no driver
    loop jobs beyond the edge-list checkpoint): the returned frame's
    plan contains all three per-round aggregates."""
    from data_engineer_coder_spark.operators.graph import pagerank_trade_graph

    df = pagerank_trade_graph(spark, sf_dir)
    plan = _plan(df)
    # three rounds → three sum-aggregate pairs over the contribution col
    assert plan.lower().count("partial_sum") >= 3, plan


def test_ngram_decontaminate_eval_side_filters_before_explode(spark, sf_dir):
    """The eval n-gram index must be built from a filtered scan (the
    is_eval predicate evaluates BELOW the Generate) and probed via
    broadcast — the corpus side must never shuffle on the n-gram key."""
    from data_engineer_coder_spark.operators.textops import ngram_decontaminate

    plan = _plan(ngram_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin LeftSemi" in plan, plan
    # no sort-merge join anywhere: every join in this op is broadcast
    assert "SortMergeJoin" not in plan, plan


def test_sequence_packing_is_one_window_one_agg(spark, sf_dir):
    """The packing manifest must not join anything: one exchange for the
    per-source window, one for the final aggregate, nothing else."""
    from data_engineer_coder_spark.operators.packing import sequence_packing

    plan = _plan(sequence_packing(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 1, plan


def test_corpus_build_joins_are_broadcast_sized(spark, sf_dir):
    """Every join in the funnel carries markers (canonical flags,
    contamination ids, eval n-grams, per-source window counts) — none
    may sort-merge the corpus."""
    from data_engineer_coder_spark.operators.pipelines import (
        pretraining_corpus_build,
    )

    plan = _plan(pretraining_corpus_build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_bloom_bits_build_is_partial_aggregated(spark, sf_dir):
    """The set-bits relation is a distinct over positions — it must
    partial-aggregate map-side (HashAggregate below the exchange), the
    property that makes the sketch mergeable."""
    from data_engineer_coder_spark.operators.aggregates import (
        bloom_membership_gate,
    )

    plan = _plan(bloom_membership_gate(spark, sf_dir))
    import re

    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan


def test_shingle_df_cap_has_no_hot_key_window(spark, sf_dir):
    """Round 7: the frequent-shingle cap must be a partial-agg count +
    broadcast anti-join — NOT a count window over the shingle key, which
    single-tasks every row of a hot shingle before the cap can drop it.
    Holds for both base pipelines (exact Jaccard and MinHash)."""
    from data_engineer_coder_spark.operators.dedup import (
        minhash_lsh_neardup,
        ngram_jaccard_pairs,
    )

    for fn in (ngram_jaccard_pairs, minhash_lsh_neardup):
        plan = _plan(fn(spark, sf_dir))
        assert "Window" not in plan, plan
        assert "BroadcastHashJoin LeftAnti" in plan, plan


def test_exact_pair_budget_guard_trips(spark, sf_dir):
    """The exact all-pairs generator must fail fast in-plan when the
    shingle df distribution implies more candidates than the budget —
    it is ground truth for the recall gates, never the production path."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from data_engineer_coder_spark.config import config_overrides
    from data_engineer_coder_spark.operators import dedup

    # the guard reads the LIVE config (r8: the old module constant was
    # the pre-config default and is gone — overriding it did nothing)
    # Spark 4 converts the executor-side USER_RAISED_EXCEPTION to
    # SparkRuntimeException on collect; older paths surfaced the raw
    # Py4JJavaError — the guard tripping is the contract, not the class.
    with config_overrides(exact_pair_budget=1):
        with pytest.raises(
            (Py4JJavaError, SparkRuntimeException), match="candidate budget exceeded"
        ):
            dedup.ngram_jaccard_pairs(spark, sf_dir).collect()


def test_semdedup_assignment_is_two_level(spark, sf_dir):
    """Round 7: semdedup's assignment must be the two-level IVF shape —
    the only set broadcast against the full corpus is the ⌈√K⌉-row
    coarse set; the fine set arrives via a coarse_id equi-join.  The
    flat K-broadcast argmax (n·K flops, Θ(n)-row broadcast at K∝n)
    must be gone: the allowed cross-style joins are the one-row params
    and the ⌈√K⌉-row coarse set (5 per assignment instance), and the
    fine set reaches the corpus only through an equi-join."""
    import re

    from data_engineer_coder_spark.operators.similarity import _semdedup_assign

    plan = _plan(_semdedup_assign(spark, sf_dir))
    assert "coarse_id" in plan, plan
    # params onto n (1, inside cents — duplicated where cents recurs via
    # coarse/cent2coarse) + coarse onto cents + coarse onto the corpus
    # = 5 total; a 6th would mean the fine set crossed the corpus.
    nlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    assert nlj <= 5, plan
    # the fine argmax must arrive via an equi-join on coarse_id
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan), plan


def test_heavy_family_plans_stay_clean(spark, sf_dir):
    """Round 7: enforce the PLANS.md audit rules in CI for the heavy
    operator family (the full-registry audit runs via
    scripts/audit_plans.py per round; this keeps the expensive queries
    honest BETWEEN rounds): no cartesian products, no row-at-a-time
    Python eval, and filter pushdown wherever a plan reads parquet with
    filters."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
    )
    from audit_plans import audit
    from scale_bench import HEAVY

    from data_engineer_coder_spark.registry import all_queries

    specs = all_queries()
    bad = {}
    for name in HEAVY:
        df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(name, plan)
        if a["flags"] != "—":
            bad[name] = a["flags"]
    assert not bad, bad


def test_ivf_cells_scale_with_corpus(spark, sf_dir):
    """Round 9: the family quantizer must produce K ∝ n cells (~125
    vectors each) with bounded imbalance — the property that keeps every
    within-cell self-join (mutual-kNN, CSLS, SemDeDup) linear in n.  A
    fixed-K regression would show up here as avg cell size ∝ n."""
    from pyspark.sql import functions as F

    from data_engineer_coder_spark.io.tables import table
    from data_engineer_coder_spark.operators.similarity import (
        _IVF_CSIZE,
        _dot,
        _ivf_assign,
        _qvec,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("qv")
    )
    n_df = emb.select("vec_id", "qv", _dot(F.col("qv"), F.col("qv")).alias("nrm"))
    n = n_df.count()
    st = (
        _ivf_assign(n_df)
        .groupBy("centroid_id")
        .count()
        .agg(
            F.count("*").alias("k"),
            F.max("count").alias("maxc"),
            F.avg("count").alias("avgc"),
        )
        .collect()[0]
    )
    # K tracks n/125 (MINK floor for tiny corpora), so avg cell ≈ 125
    assert st["k"] >= max(10, 0.6 * n / _IVF_CSIZE), st
    assert st["avgc"] <= 2.2 * _IVF_CSIZE, st
    # geometric imbalance is real but bounded (measured ≤ 12× at 200k
    # vectors, growing ~n^0.25): gate the blow-up case
    assert st["maxc"] <= max(20 * st["avgc"], 200), st


def test_neardup_gate_probe_broadcasts_batch_not_index(spark, sf_dir):
    """T8e scale shape: the ingest gate's index probe must broadcast the
    (small) BATCH side so the standing signature index — which grows
    with the corpus — is scanned map-side and never shuffled or
    broadcast.  Reconstructs the gate's probe plan
    (streaming/core.py: write_stream_neardup_gate step 2) over real
    fixture signatures and pins the join strategy."""
    from data_engineer_coder_spark.operators.dedup import (
        band_key_array,
        minhash_signatures,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    index_sig = minhash_signatures(docs.filter(F.col("doc_id") % 3 == 0))
    batch_sig = minhash_signatures(docs.filter(F.col("doc_id") % 3 == 1))
    bands = batch_sig.select("doc_id", F.explode(band_key_array()).alias("band_key"))
    index_bands = index_sig.select(
        F.col("doc_id").alias("idx_id"), F.explode(band_key_array()).alias("band_key")
    )
    cand = (
        index_bands.join(F.broadcast(bands), "band_key")
        .where(F.col("idx_id") != F.col("doc_id"))
        .select("doc_id", "idx_id")
        .distinct()
    )
    plan = _plan(cand)
    # BuildRight = the right (batch) side is the broadcast build — the
    # index branch stays a streamed probe, never shuffled or broadcast
    assert "BroadcastHashJoin Inner BuildRight" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # exactly one broadcast exchange in the tree (formatted explain
    # repeats each node in the details section — count tree form only)
    assert plan.count("BroadcastExchange (") == 1, plan


def test_neardup_gate_fine_grained_index_prunes_files(spark, sf_dir, tmp_path):
    """T8e probe pruning: with ``index_file_rows`` set, the bands index
    is range-split into narrow-key files, so a SMALL batch's probe opens
    only colliding files — and the gate's accept/reject decisions are
    IDENTICAL to the default one-file-per-(band, epoch) layout (file
    granularity is a physical knob, never a semantic one)."""
    import os

    from data_engineer_coder_spark.io.acid_table import (
        current_manifest,
        files_selected,
        read_table,
    )
    from data_engineer_coder_spark.operators.dedup import (
        band_key_array,
        minhash_signatures,
    )
    from data_engineer_coder_spark.streaming.core import (
        band_range_hits,
        write_stream_neardup_gate,
    )
    from data_engineer_coder_spark.streaming.windows import (
        _ordered_epoch_stream,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    ledgers = {}
    try:
        for mode, ifr in (("coarse", None), ("fine", 64)):
            tmp = str(tmp_path / mode)
            os.makedirs(os.path.join(tmp))
            sdf = _ordered_epoch_stream(spark, docs, tmp)
            roots = {n: os.path.join(tmp, n) for n in ("sigs", "docs", "stats")}
            q = write_stream_neardup_gate(
                sdf, roots["sigs"], roots["docs"], roots["stats"],
                index_file_rows=ifr,
            )
            q.awaitTermination(600)
            ledgers[mode] = sorted(
                tuple(r) for r in read_table(spark, roots["stats"]).collect()
            )
            if mode == "fine":
                bands_root = roots["sigs"] + "_bands"
                man = current_manifest(bands_root)
                n_files = sum(
                    len(v) for v in man["dir_files"].values()
                )
                # range-split produced a finer layout than 8 dirs × 2
                # epochs (the shape pruning needs)
                assert n_files > 16, man["dir_files"].keys()
                # a one-doc probe's band keys hit only a sliver of them
                one = minhash_signatures(docs.filter(F.col("doc_id") == 1))
                keys = sorted(
                    r["band_key"]
                    for r in one.select(
                        F.explode(band_key_array()).alias("band_key")
                    ).collect()
                )
                assert keys, "probe doc has no signature"
                hit = band_range_hits(keys)("band_key")
                sel = files_selected(bands_root, stats_filter=hit)
                n_read = sum(k for files in sel.values() for _, k in files)
                # ≤ one file per probe key PER EPOCH GENERATION (3
                # appends overlap in key range until compaction), ≪ total
                assert n_read <= 3 * len(keys), (n_read, len(keys))
                assert n_read < n_files / 2, (n_read, n_files)
    finally:
        spark.conf.set(key, prev)
    # physical layout must not change a single gate decision
    assert ledgers["fine"] == ledgers["coarse"]
