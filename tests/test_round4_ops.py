"""Semantics tests for round-4 operators beyond the oracle-parity gate:
the closed-form NTILE used by rfm_segmentation, sweep-line concurrency
vs a brute-force interval count, split-contract invariants, and the
array-side basket pair generation vs a naive self-join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineer_coder_spark.operators.analytics import (
    max_concurrent_events,
    order_item_pairs,
)
from data_engineer_coder_spark.operators.sampling import train_test_split
from data_engineer_coder_spark.io.tables import table


def test_ntile_closed_form_matches_builtin(spark):
    """rfm_segmentation's closed-form bucket assignment must be
    bit-identical to F.ntile for every n (including n % k != 0)."""
    for n in (1, 2, 3, 4, 5, 7, 8, 10, 97):
        df = spark.range(1, n + 1).withColumnRenamed("id", "rn")
        builtin = df.withColumn(
            "want", F.ntile(4).over(Window.orderBy("rn"))
        )
        # mirror of analytics.rfm_segmentation.ntile4
        q = F.floor(F.lit(n) / 4)
        m = F.lit(n) % 4
        head = m * (q + 1)
        got = (
            F.when(F.col("rn") <= head, F.ceil(F.col("rn") / (q + 1)))
            .otherwise(m + F.ceil((F.col("rn") - head) / q))
            .cast("int")
        )
        rows = builtin.withColumn("got", got).collect()
        assert all(r.want == r.got for r in rows), f"ntile mismatch at n={n}"


def test_max_concurrent_matches_bruteforce(spark, sf_dir):
    """Sweep-line result == brute-force 'count open intervals at every
    start boundary' (the max is always attained at a start)."""
    got = {
        r.event_type: r.max_concurrent
        for r in max_concurrent_events(spark, sf_dir).collect()
    }
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "ts")
        .toPandas()
    )
    hour = pd.Timedelta(hours=1)
    for etype, grp in ev.groupby("event_type"):
        ts = grp["ts"].sort_values().to_numpy()
        want = max(
            ((ts >= t - hour + pd.Timedelta(microseconds=1)) & (ts <= t)).sum()
            for t in ts
        )
        assert got[etype] == want, f"{etype}: {got[etype]} != {want}"


def test_train_test_split_contract(spark, sf_dir):
    """Splits are disjoint, exhaustive, deterministic across runs, and
    the global train share sits near 230/256."""
    out = train_test_split(spark, sf_dir).toPandas()
    total_docs = table(spark, sf_dir, "documents").count()
    assert out["n_docs"].sum() == total_docs
    again = train_test_split(spark, sf_dir).toPandas()
    merged = out.merge(again, on=["lang", "split"], suffixes=("", "_2"))
    assert (merged["n_docs"] == merged["n_docs_2"]).all()
    train_share = out.loc[out["split"] == "train", "n_docs"].sum() / total_docs
    assert abs(train_share - 230 / 256) < 0.05


def test_chained_global_pos_is_deterministic(spark, sf_dir):
    """Regression: two chained with_global_pos calls must give identical
    ranks across executions.  Before the lazy-localCheckpoint fix the
    helper's two internal references each planned their OWN
    repartitionByRange with independently-sampled boundaries once the
    input subtree contained a join, silently corrupting ranks."""
    from data_engineer_coder_spark.operators._helpers import with_global_pos

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_custkey")
    checksums = set()
    for _ in range(3):
        r1 = with_global_pos(o, [F.asc("o_totalprice"), F.asc("o_orderkey")], pos_name="p1")
        r2 = with_global_pos(r1, [F.asc("o_custkey"), F.asc("o_orderkey")], pos_name="p2")
        s = r2.agg(
            F.sum(F.col("o_orderkey") * (F.col("p1") + 2 * F.col("p2")))
        ).collect()[0][0]
        checksums.add(s)
    assert len(checksums) == 1, f"nondeterministic ranks: {checksums}"


def test_rfm_segmentation_deterministic(spark, sf_dir):
    from data_engineer_coder_spark.operators.analytics import rfm_segmentation

    a = sorted(map(tuple, rfm_segmentation(spark, sf_dir).collect()))
    b = sorted(map(tuple, rfm_segmentation(spark, sf_dir).collect()))
    assert a == b


def test_order_item_pairs_matches_naive_join(spark, sf_dir):
    """Array-side combination generation == naive distinct self-join."""
    got = order_item_pairs(spark, sf_dir)
    items = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    want = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_pagerank_invariants(spark, sf_dir):
    """Rank mass: every node's rank >= teleport floor; suppliers (degree
    ~ O(customers)) must out-rank customers at the top; two runs are
    bit-identical (exact integer arithmetic)."""
    from data_engineer_coder_spark.operators.graph import pagerank_trade_graph

    rows = pagerank_trade_graph(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.rank_micro >= 150_000 for r in rows)
    # the trade graph is bipartite with |supp| << |cust|: every supplier
    # in the top-20 out-ranks every customer in it (at sf0.001 only 10
    # suppliers exist, so customers fill the tail of the list)
    supp = [r.rank_micro for r in rows if r.node_type == "supplier"]
    cust = [r.rank_micro for r in rows if r.node_type == "customer"]
    assert supp and min(supp) > (max(cust) if cust else 0)
    again = pagerank_trade_graph(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_countmin_one_sided_error(spark, sf_dir):
    """CM guarantee: estimate >= exact for every probed token, and with
    w=1024 >> distinct tokens at sf0.001 the overestimate stays within
    eps*N (eps = e/w) of the exact count."""
    from data_engineer_coder_spark.operators.aggregates import countmin_token_freq

    rows = countmin_token_freq(spark, sf_dir).collect()
    assert len(rows) == 30
    assert all(r.never_underestimates for r in rows)
    n_stream = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .count()
    )
    eps_bound = 2.72 * n_stream / 1024  # e/w * N
    assert all(r.cm_estimate - r.exact_cnt <= eps_bound for r in rows)


def test_bigstar_equals_hashmin_clusters(spark, sf_dir):
    """Star contraction and hash-min label propagation must produce the
    identical (doc_id, cluster_id) map on the real pair graph."""
    from data_engineer_coder_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_bigstar,
    )

    a = sorted(map(tuple, dedup_clusters(spark, sf_dir).collect()))
    b = sorted(map(tuple, dedup_clusters_bigstar(spark, sf_dir).collect()))
    assert a == b


def test_bigstar_deep_chain(spark):
    """The adversarial case hash-min cannot do in bounded rounds: a
    1000-node path (diameter 999) must collapse to one cluster rooted at
    the minimum node within the O(log n) round bound."""
    from data_engineer_coder_spark.operators.dedup import (
        _BIGSTAR_MAX_ROUNDS,
        _large_star,
        _small_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "src long, dst long"
    ).localCheckpoint()
    rounds = 0
    for _ in range(_BIGSTAR_MAX_ROUNDS):
        new = _small_star(_large_star(edges)).localCheckpoint()
        rounds += 1
        if (
            new.count() == edges.count()
            and new.exceptAll(edges).limit(1).count() == 0
        ):
            edges = new
            break
        edges = new
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {(i, 0) for i in range(1, 1000)}, "not a star rooted at 0"
    assert rounds <= 15, f"took {rounds} rounds for diameter 999"
