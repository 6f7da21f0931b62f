#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set: the flagship plus one representative per operator family —
scan/agg, broadcast star join, shuffle join, window, interval join,
as-of, similarity, dedup, text, streaming-window batch twin.  Each is
timed over a full collect() (plan + execute + fetch).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_coder_spark import registry  # noqa: E402
from data_engineer_coder_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "join_inner",
    "join_left_outer",
    "window_topk",
    "window_running",
    "range_join_events",
    "asof_join",
    "rollup_returnflag",
    "pivot_event_types",
    "tumbling_window_agg",
    "session_window_agg",
    "count_distinct",
    "cosine_topk",
    "ngram_jaccard_pairs",
    "minhash_lsh_neardup",
    "token_stats",
    "word_freq_topk",
    "doc_fingerprint",
    "summary_stats",
    # families previously unbenchmarked: real streaming, stateful
    # grouped-map, ANN, corpus tf-idf
    "streaming_tumbling_events",
    "user_session_stats",
    "ann_lsh_topk",
    "tfidf_topk",
    "ivf_ann_topk",
    "stream_stream_join",
    # round 2 additions: iterative graph dedup, join-shaped MERGE,
    # 5-way TPC-H Q5 star, keep-best cluster dedup
    "dedup_clusters",
    "cdc_merge_upsert",
    "regional_supplier_volume",
    "dedup_keep_best",
    # round 2 late additions: decontamination, time-series fill, VARIANT
    # extraction, contrastive mining
    "decontaminate_overlap",
    "resample_daily_fill",
    "variant_extract",
    "contrastive_pair_mining",
    # round 4 additions: Q9-shape 5-way profit join, basket pair mining,
    # sweep-line concurrency, embedding quantization, MAD outliers
    "product_type_profit",
    "order_item_pairs",
    "max_concurrent_events",
    "embedding_quantize_check",
    "robust_outlier_counts",
    # round 4: the heavy families the round-2 advice asked to bench —
    # 3-way neardup triangles, blocked edit-distance, Lloyd-iterated IVF,
    # grid-blocked spatial join, and the fused L8 pipeline
    "neardup_triangles",
    "fuzzy_name_pairs",
    "ivf_kmeans_topk",
    "spatial_blocked_join",
    "training_data_prep",
    # round 4 late additions: unrolled PageRank, Q21 aggregate rewrite,
    # count-min sketch build+probe, star-contraction CC, Q2 argmin
    "pagerank_trade_graph",
    "waiting_suppliers",
    "countmin_token_freq",
    "dedup_clusters_bigstar",
    "cheapest_supplier_per_part",
    # round 5 additions: segment-level dedup audit + boilerplate density
    # (two new explode→DF-join→rollup text families)
    "segment_dedup_report",
    "boilerplate_ngram_density",
    # round 5 additions: packing/assembly family, n-gram decontamination,
    # pair-covariance audit, first-principles bloom probe
    "sequence_packing",
    "ngram_decontaminate",
    "embedding_covariance_topk",
    "bloom_membership_gate",
    "pretraining_corpus_build",
    "cluster_aware_split",
    "repeated_token_runs",
    # round 6: md5-portable simhash, SemDeDup prune, PII scrub,
    # DSIR selection, deterministic corpus shuffle
    "simhash_neardup",
    "semdedup_prune",
    "pii_redact",
    "dsir_importance_weights",
    "corpus_shuffle_order",
    # round 7: segment-dedup transform, bigram LM, MG heavy hitters,
    # integer power-iteration PCA, per-source KL mixing metric
    "segment_dedup_keep_first",
    "bigram_logprob_score",
    "approx_topk_tokens",
    "embedding_principal_direction",
    "source_token_kl",
    "semdedup_greedy_keep_first",
    "embedding_anisotropy_score",
    "minhash_estimate_audit",
    "unimax_allocation",
    "ccnet_perplexity_buckets",
    "dedup_clusters_minhash",
    # round 8: idf-weighted simhash, lakehouse commit log + time travel,
    # watermarked outer attribution join, streaming exactly-once append
    "simhash_idf_neardup",
    "acid_table_history",
    "stream_stream_left_outer_join",
    "purchase_attribution_outer_batch",
    # round 8 late: lakehouse services, PQ ANN, funnel, incremental
    # matview merge, feed-overlap audit, weighted reservoir
    "acid_zone_map_skipping",
    "acid_compaction_audit",
    "pq_ann_topk",
    "pq_ann_rerank_topk",
    "event_funnel_levels",
    "incremental_rollup_merge",
    "source_overlap_matrix",
    "weighted_reservoir_sample",
    "ann_lsh_multiprobe_topk",
    # round 8 final: iterative BPE training, mutual-kNN clustering,
    # CSLS bitext mining, AMS F2, fertility report, in-plan OLS probe
    "bpe_learn_iterative",
    "mutual_knn_clusters",
    "csls_bitext_mining",
    "ams_f2_sketch",
    "tokenizer_fertility_report",
    "linear_probe_quality",
    "doc_dup_ngram_coverage",
    "ivf_index_upsert_audit",
    "trending_topk_batch",
    "pareto_frontier_docs",
    "containment_decontaminate",
    "containment_sketch_audit",
    "acid_merge_upsert_audit",
    "acid_delete_audit",
    "cm_join_cardinality_audit",
    # round 9: cross-partition MERGE ledger + streaming matview gate +
    # the online near-dup ingest gate (capped variant shares the family;
    # kept out of the headline to bound suite wall time)
    "acid_partition_move_audit",
    "stream_rollup_matview",
    "stream_neardup_ingest",
    # round 10: variable-length exact-substring dedup + the streaming
    # decontamination gate (the probe-prune / compaction audits and the
    # capped gate share the T8e family; kept out to bound wall time)
    "exact_substring_dedup",
    "stream_decontaminate_ingest",
    # round 11: the unified curation pipeline (one epoch txid across
    # near-dup screen + decontamination + verdicts), the exact-substring
    # REMOVAL transform, and the PQ codebook drift audit (the PQ pair
    # above now reads the standing codebook artifact)
    "stream_curation_ingest",
    "exact_substring_dedup_rewrite",
    "pq_codebook_drift_audit",
    # round 11: streaming ANN index maintenance (bootstrap-trained
    # standing quantizer, arriving vectors assigned/encoded/appended
    # under epoch txids) + its serving side (bucket-pruned ADC probe)
    "stream_ann_index_ingest",
    "ann_index_bucket_probe",
    "ann_index_retrain_swap_audit",
    "mmr_diversified_topk",
    "hybrid_rrf_retrieval",
    "bm25_topk",
    "doc_chunk_windows",
    "hybrid_recall_check",
    "mmr_diversity_check",
    "rag_context_pack",
    "acid_change_data_feed",
    "bm25_rm3_expansion",
    # round 12: the standing lexical index (streamed ingest + the served
    # BM25/RM3 that read it), the ANN-served retrieval pools + recall
    # gate, the staged-retrain audit's chunk-pipeline sibling, and the
    # CDF-consuming incremental matview
    "stream_bm25_index_ingest",
    "bm25_topk_served",
    "bm25_rm3_expansion_served",
    "mmr_diversified_topk_served",
    "hybrid_rrf_retrieval_served",
    "hybrid_served_recall_check",
    "rag_chunk_pipeline",
    "cdf_incremental_rollup",
    "retrieval_rank_metrics",
    "retrieval_rank_metrics_served",
    # round 13: the searchable curation gate (one ingest, all standing
    # artifacts), delete propagation to the retrieval indexes, postings
    # compaction, and the rank-safe two-stage long-query serve (the
    # retention gate shares the family; kept out to bound wall time)
    "stream_curation_searchable",
    "retrieval_index_delete_audit",
    "bm25_index_compaction_audit",
    "bm25_longdoc_two_stage_served",
    # round 14: the end-to-end lifecycle drill (ingest → delete →
    # ingest → serve) and the cost-based BM25 serve dispatch
    "retrieval_lifecycle_audit",
    "bm25_serve_dispatch",
]

# The SELF-CONTAINED AUDIT TIER (VERDICT r13 #6): multi-epoch gate /
# maintenance audits that each rebuild their whole world (stream +
# standing tables + replay asserts) inside one query.  They are the
# right correctness drills but the wrong latency denominators — their
# cost is dominated by fixture construction and deliberate double
# replays, not by the serving/query plans the round-over-round
# comparison tracks.  bench reports BOTH tier sums; the fast tier is
# the comparable number.
SLOW_AUDIT = frozenset({
    "stream_neardup_ingest",
    "stream_decontaminate_ingest",
    "stream_curation_ingest",
    "stream_ann_index_ingest",
    "ann_index_retrain_swap_audit",
    "stream_bm25_index_ingest",
    "stream_rollup_matview",
    "acid_compaction_audit",
    "acid_merge_upsert_audit",
    "acid_delete_audit",
    "acid_partition_move_audit",
    "ivf_index_upsert_audit",
    "pq_codebook_drift_audit",
    "stream_curation_searchable",
    "retrieval_index_delete_audit",
    "bm25_index_compaction_audit",
    "retrieval_lifecycle_audit",
})


# The printed one-line JSON's per-query subset, PINNED BY NAME (VERDICT
# r14 #2): the old rule dropped the FASTEST queries to fit the driver's
# 2000-char window, which made the printed set timing-dependent — five
# queries that got faster in r14 fell out of the line and the driver's
# round-over-round diff reported them as dropped_from_bench.  This list
# is exactly the set the r14 line printed (so consecutive-round diffs
# compare a stable set); every other query's time still lands in
# bench_full_latest.json and in omitted_sum.  If the line ever outgrows
# 1900 chars the fallback reduces decimal precision, never the name set.
PRINTED = frozenset({
    "ngram_jaccard_pairs", "minhash_lsh_neardup", "ivf_ann_topk",
    "stream_stream_join", "dedup_clusters", "dedup_keep_best",
    "decontaminate_overlap", "neardup_triangles", "ivf_kmeans_topk",
    "pagerank_trade_graph", "dedup_clusters_bigstar", "ngram_decontaminate",
    "cluster_aware_split", "semdedup_prune", "semdedup_greedy_keep_first",
    "minhash_estimate_audit", "dedup_clusters_minhash", "simhash_idf_neardup",
    "stream_stream_left_outer_join", "acid_compaction_audit", "pq_ann_topk",
    "pq_ann_rerank_topk", "source_overlap_matrix", "mutual_knn_clusters",
    "csls_bitext_mining", "ams_f2_sketch", "linear_probe_quality",
    "doc_dup_ngram_coverage", "containment_decontaminate",
    "containment_sketch_audit", "acid_merge_upsert_audit",
    "stream_rollup_matview", "stream_neardup_ingest",
    "stream_decontaminate_ingest", "stream_curation_ingest",
    "pq_codebook_drift_audit", "stream_ann_index_ingest",
    "ann_index_bucket_probe", "ann_index_retrain_swap_audit",
    "mmr_diversity_check", "bm25_rm3_expansion", "stream_bm25_index_ingest",
    "bm25_topk_served", "bm25_rm3_expansion_served",
    "mmr_diversified_topk_served", "hybrid_rrf_retrieval_served",
    "hybrid_served_recall_check", "rag_chunk_pipeline",
    "cdf_incremental_rollup", "retrieval_rank_metrics",
    "retrieval_rank_metrics_served", "stream_curation_searchable",
    "retrieval_index_delete_audit", "bm25_index_compaction_audit",
    "bm25_longdoc_two_stage_served", "retrieval_lifecycle_audit",
    "bm25_serve_dispatch",
})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(
        "bench", cpus=cpus, driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    )
    qs = registry.queries()
    # JVM/codegen warmup on the smallest table so per-query numbers
    # measure the plan, not JIT startup.
    qs["pricing_summary"](spark, sf_dir).collect()

    # Three full round-robin passes, minimum per query: this host shows
    # multi-minute starvation windows (RUNNABLE threads starved, load
    # spike at idle CPU) that poison whatever happens to be measured.
    # Back-to-back retries land in the same window; separate passes
    # don't.  The minimum is the reproducible cost of the plan.
    per_query: dict[str, float] = {name: float("inf") for name in HEADLINE}
    for _pass in range(3):
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            per_query[name] = min(per_query[name], time.time() - t0)
            # Drop python-side plan/broadcast refs so the ContextCleaner
            # can release executor/driver memory between queries — long
            # bench sessions otherwise accumulate broadcasts and GC-thrash.
            gc.collect()
    per_query = {k: round(v, 3) for k, v in per_query.items()}
    total = round(sum(per_query.values()), 3)
    fast_tier = round(
        sum(v for k, v in per_query.items() if k not in SLOW_AUDIT), 3
    )
    audit_tier = round(total - fast_tier, 3)
    # The driver records only the LAST 2000 chars of this process's
    # output and json-parses the final line (BENCH_r07.json has
    # "parsed": null because the 67-query line overflowed that window).
    # Persist the full per-query map to a repo file, then print a line
    # GUARANTEED to fit: 2-decimal seconds, compact separators, and if
    # still too long drop the fastest queries from the printed dict
    # (their sum is preserved in "omitted_sum" so the total stays
    # reconstructible; the full map is in "full").
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_full_latest.json")
    with open(full_path, "w") as fh:
        json.dump(
            {"metric": "headline_suite_seconds", "value": total, "unit": "sec",
             "queries": per_query, "sf": sf,
             "fast_tier_seconds": fast_tier, "audit_tier_seconds": audit_tier,
             "audit_tier_queries": sorted(SLOW_AUDIT & set(per_query))},
            fh, indent=1, sort_keys=True,
        )
    # Deterministic-by-NAME printed subset (VERDICT r14 #2): always the
    # PRINTED set, never a timing-sorted truncation.  omitted_sum keeps
    # the total reconstructible; cpus records the measured core count.
    omitted_sum = sum(v for k, v in per_query.items() if k not in PRINTED)
    for dp in (2, 1, 0):
        shown = {k: round(v, dp) for k, v in sorted(per_query.items())
                 if k in PRINTED}
        line = json.dumps(
            {"metric": "headline_suite_seconds", "value": total, "unit": "sec",
             "fast_tier_seconds": fast_tier, "audit_tier_seconds": audit_tier,
             "cpus": int(cpus), "queries": shown, "sf": sf,
             "n_queries": len(per_query),
             "queries_omitted": len(per_query) - len(shown),
             "omitted_sum": round(omitted_sum, 2)},
            separators=(",", ":"),
        )
        if len(line) <= 1900:
            break
    print(line)


if __name__ == "__main__":
    main()
