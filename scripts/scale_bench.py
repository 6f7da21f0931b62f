#!/usr/bin/env python
"""Scaling-curve measurement for the heavy operator families.

Runs the heaviest registry queries at TWO scales of the SAME generated
fixture (scripts/gen_fixture.py: perfdata/sf0.1 vs perfdata/sf1, a 10×
row-count step on every table) and reports, per query:

    t_small, t_big (min-of-N wall seconds, collect() included)
    ratio  = t_big / t_small
    exponent = log10(ratio)        (1.0 = linear in data size)

A superlinear exponent (≳1.3 after host noise) on any op is a
pre-cluster red flag: whatever curve shows at 600k→6M rows only gets
worse at 100 TB.  Results print as one JSON line and a markdown table
fragment for BASELINE.md.

Usage: python scripts/scale_bench.py [small_dir big_dir [passes [only]]]
       (``only`` = comma-separated query subset, e.g. the production
       family for the sf1→sf10 decade where the sf-bounded exact
       generators would trip their candidate-budget guard by design)
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_coder_spark import registry  # noqa: E402
from data_engineer_coder_spark.session import get_spark  # noqa: E402

# The expensive families: dedup cluster chain, packing/funnel, iterative
# IVF, text explodes, events windows, and two shuffle-heavy TPC-H shapes.
HEAVY = [
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "dedup_clusters_bigstar",
    "dedup_keep_best",
    "cluster_aware_split",
    "minhash_lsh_neardup",
    "ngram_decontaminate",
    "pretraining_corpus_build",
    "sequence_packing",
    "tfidf_topk",
    "ivf_kmeans_topk",
    "cosine_topk",
    "user_session_stats",
    "pricing_summary",
    "revenue_by_nation",
    "excess_share_suppliers",
    # round 6 additions (kept under the curve watch after their
    # superlinear first drafts were fixed — see BASELINE.md)
    "simhash_neardup",
    "semdedup_prune",
    "pii_redact",
    "dedup_clusters_minhash",
    # round 7 additions
    "segment_dedup_keep_first",
    "bigram_logprob_score",
    "approx_topk_tokens",
    "embedding_principal_direction",
    "source_token_kl",
    "semdedup_greedy_keep_first",
    "embedding_anisotropy_score",
    # round 8 additions
    "simhash_idf_neardup",
    "pq_ann_topk",
    "pq_ann_rerank_topk",
    "source_overlap_matrix",
    "incremental_rollup_merge",
    "ewma_user_value",
    # round 9 additions
    "stream_neardup_ingest",
]


def _time_queries(spark, sf_dir: str, passes: int, names=None) -> dict[str, float]:
    names = names or HEAVY
    qs = registry.queries()
    # JIT warmup on a query the fixture can serve (docs-only fixtures
    # carry no lineitem)
    warm = "pricing_summary" if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")) else names[0]
    qs[warm](spark, sf_dir).collect()
    best = {n: float("inf") for n in names}
    for _ in range(passes):
        for name in names:
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).collect()
            except Exception as e:  # record, keep measuring the rest
                msg = str(e).split("\n")[0][:200]
                print(f"    [{sf_dir.split('/')[-1]}] {name}: FAILED {msg}", flush=True)
                best[name] = float("nan")
                continue
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            print(f"    [{sf_dir.split('/')[-1]}] {name}: {dt:.1f}s", flush=True)
            gc.collect()
    return best


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "perfdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "perfdata/sf1"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else HEAVY
    spark = get_spark("scale_bench", cpus="32", driver_memory="32g")
    t_small = _time_queries(spark, small, passes, names)
    t_big = _time_queries(spark, big, passes, names)
    rows = []
    for name in names:
        ratio = t_big[name] / max(t_small[name], 1e-9)
        rows.append({
            "query": name,
            "t_small": round(t_small[name], 3),
            "t_big": round(t_big[name], 3),
            "ratio": round(ratio, 2),
            "exponent": round(math.log10(max(ratio, 1e-9)), 2),
        })
    rows.sort(key=lambda r: -r["exponent"])
    print(json.dumps({"metric": "scale_curve", "small": small, "big": big, "rows": rows}))
    print()
    print(f"| query | t({small.split('/')[-1]}) s | t({big.split('/')[-1]}) s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r['t_small']} | {r['t_big']} | {r['ratio']} | {r['exponent']} |")


if __name__ == "__main__":
    main()
