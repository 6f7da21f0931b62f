"""Semantics tests for the round-6 operators beyond the oracle-parity
gate: SemDeDup prune soundness/completeness, SimHash signature geometry
(md5-portable bits), and PII redaction invariants.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_engineer_coder_spark.operators.dedup import simhash_neardup
from data_engineer_coder_spark.operators.similarity import (
    _SEMDEDUP_TAU,
    semdedup_prune,
)
from data_engineer_coder_spark.operators.textops import pii_redact


def test_semdedup_prune_sound_and_complete(spark, sf_dir):
    """kept=false ⇔ the vector has a smaller-id same-cluster neighbor at
    cos ≥ τ — checked against an independent pandas recompute of the
    within-cluster quantized-int cosines."""
    out = semdedup_prune(spark, sf_dir).toPandas()
    assert set(out.columns) == {"vec_id", "cluster_id", "kept"}
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
    )
    qv = {
        r.vec_id: [round(float(x) * 10_000_000) for x in r.embedding]
        for r in emb.itertuples()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(qv[a], qv[b]))
        na = sum(x * x for x in qv[a]) ** 0.5
        nb = sum(x * x for x in qv[b]) ** 0.5
        return d / (na * nb)

    by_cluster: dict[int, list[int]] = {}
    for r in out.itertuples():
        by_cluster.setdefault(r.cluster_id, []).append(r.vec_id)
    dropped = {r.vec_id for r in out.itertuples() if not r.kept}
    for c, members in by_cluster.items():
        members.sort()
        for i, v in enumerate(members):
            has_earlier_dup = any(
                cos(u, v) >= _SEMDEDUP_TAU for u in members[:i]
            )
            assert (v in dropped) == has_earlier_dup, (v, c)


def test_semdedup_covers_every_vector(spark, sf_dir):
    out = semdedup_prune(spark, sf_dir)
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert out.count() == n_vecs
    assert out.select("vec_id").distinct().count() == n_vecs


def test_simhash_pairs_symmetric_free_and_bounded(spark, sf_dir):
    """Pair list is canonical (doc_a < doc_b, no dup rows) and every
    reported Hamming distance is ≤ 3 and consistent with the documented
    md5 bit rule, recomputed in pure python for the pair members."""
    out = simhash_neardup(spark, sf_dir).toPandas()
    assert (out.doc_a < out.doc_b).all()
    assert not out.duplicated(["doc_a", "doc_b"]).any()
    assert (out.hamming <= 3).all() and (out.hamming >= 0).all()

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")["text"]
    )

    def sig(text: str) -> str:
        votes = [0] * 64
        for tok in text.split(" "):
            h = hashlib.md5(tok.encode()).hexdigest()[:16]
            for i in range(64):
                nib = int(h[i // 4], 16)
                bit = (nib >> (i % 4)) & 1
                votes[i] += 1 if bit else -1
        return "".join("1" if v > 0 else "0" for v in votes)

    for r in out.itertuples():
        sa, sb = sig(docs[r.doc_a]), sig(docs[r.doc_b])
        ham = sum(x != y for x, y in zip(sa, sb))
        assert ham == r.hamming, (r.doc_a, r.doc_b)

    # The two-level (chunk, sub-block) pigeonhole blocking is EXACT:
    # the op's pair set must equal brute-force all-pairs Hamming <= 3.
    ids = sorted(docs.index)
    sigs = {d: sig(docs[d]) for d in ids}
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if sum(x != y for x, y in zip(sigs[a], sigs[b])) <= 3
    }
    assert {(r.doc_a, r.doc_b) for r in out.itertuples()} == brute


def test_pii_redact_removes_all_matches(spark, sf_dir):
    """After redaction no email/phone pattern survives, every doc has the
    injected footer's ≥1 email and ≥1 phone, and redacted_md5 matches a
    python re-redaction of the augmented text."""
    import re

    from data_engineer_coder_spark.operators.textops import _EMAIL_RE, _PHONE_RE

    out = pii_redact(spark, sf_dir).toPandas()
    assert (out.n_emails >= 1).all() and (out.n_phones >= 1).all()

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .toPandas()
    )
    email, phone = re.compile(_EMAIL_RE), re.compile(_PHONE_RE)
    md5s = out.set_index("doc_id")["redacted_md5"]
    for r in docs.itertuples():
        aug = (
            f"{r.text} Contact user{r.doc_id}@{r.source}.org "
            f"or +1-555-{r.doc_id % 10000:04d} now."
        )
        red = phone.sub("<PHONE>", email.sub("<EMAIL>", aug))
        assert email.search(red) is None and phone.search(red) is None
        assert hashlib.md5(red.encode()).hexdigest() == md5s[r.doc_id]


def test_corpus_shuffle_is_a_partition(spark, sf_dir):
    """Every doc appears exactly once, and positions within each shard
    are exactly 1..n_shard (a valid, gapless loading order)."""
    from data_engineer_coder_spark.operators.sampling import corpus_shuffle_order

    out = corpus_shuffle_order(spark, sf_dir).toPandas()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs and out.doc_id.nunique() == n_docs
    for shard, grp in out.groupby("shard"):
        assert sorted(grp.pos) == list(range(1, len(grp) + 1))


def test_dsir_weights_favor_target_domain(spark, sf_dir):
    """The DSIR sanity property: docs drawn FROM the target source score a
    higher mean per-token log-weight than the rest of the corpus, and
    `selected` is exactly sign(weight)."""
    from data_engineer_coder_spark.operators.sampling import (
        _DSIR_TARGET,
        dsir_importance_weights,
    )

    out = dsir_importance_weights(spark, sf_dir).toPandas()
    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .toPandas()
    )
    m = out.merge(src, on="doc_id")
    tgt = m[m.source == _DSIR_TARGET].logweight_per_token
    rest = m[m.source != _DSIR_TARGET].logweight_per_token
    assert len(tgt) > 0 and tgt.mean() > rest.mean()
    # selected is sign(exact integer sum); the reported weight is rounded
    # to 6dp, so only check agreement where rounding can't mask the sign.
    nz = m[m.logweight_per_token != 0]
    assert ((nz.logweight_per_token > 0) == nz.selected).all()


def test_minhash_clusters_refine_exact_clusters(spark, sf_dir):
    """The production path (MinHash pairs at J>=0.5 -> star contraction)
    must be a REFINEMENT of the exact ground-truth clustering (J>=0.2):
    J>=0.5 pairs are a subset of J>=0.2 pairs, so every minhash cluster's
    members must share one exact cluster."""
    from data_engineer_coder_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_minhash,
    )

    exact = {
        r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()
    }
    mh = dedup_clusters_minhash(spark, sf_dir).collect()
    assert len(mh) == len(exact)  # every doc labeled exactly once
    by_cluster: dict[int, set[int]] = {}
    for r in mh:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    n_nontrivial = 0
    for members in by_cluster.values():
        if len(members) > 1:
            n_nontrivial += 1
            assert len({exact[d] for d in members}) == 1, members
    assert n_nontrivial > 0  # the fixture does contain near-dup families


def test_star_contract_matches_union_find(spark, sf_dir):
    """_star_contract (shared by the exact and MinHash clustering ops)
    must produce min-id connected components for arbitrary pair graphs —
    checked against a python union-find on several deterministic random
    graphs, including chain/star/cycle shapes."""
    import random

    from data_engineer_coder_spark.operators.dedup import _star_contract

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rng = random.Random(1234)
    cases = [
        [(i, i + 1) for i in range(0, 40)],                       # one long chain
        [(0, i) for i in range(1, 30)],                           # star
        [(i, (i + 1) % 20) for i in range(20)],                   # cycle
        [(rng.randrange(n_docs), rng.randrange(n_docs)) for _ in range(60)],
    ]
    for edges in cases:
        edges = [(min(a, b), max(a, b)) for a, b in edges if a != b]
        if not edges:
            continue
        parent = list(range(n_docs))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {d: find(d) for d in range(n_docs)}

        pairs = spark.createDataFrame(edges, "src long, dst long").distinct()
        got = {
            r.doc_id: r.cluster_id
            for r in _star_contract(spark, sf_dir, pairs).collect()
        }
        assert got == expect


def test_cooc_cap_inactive_on_fixture(spark, sf_dir):
    """The md5-minwise per-doc vocab cap (round 7) must not change
    fixture results — every fixture doc's distinct-token count sits
    below _COOC_CAP, so capped == uncapped top-20."""
    from pyspark.sql import functions as F

    from data_engineer_coder_spark.io.tables import table
    from data_engineer_coder_spark.operators.textops import (
        _COOC_CAP,
        token_cooccurrence_topk,
    )

    docs = table(spark, sf_dir, "documents")
    max_distinct = docs.select(
        F.size(F.array_distinct(F.split("text", " "))).alias("n")
    ).agg(F.max("n")).collect()[0][0]
    assert max_distinct <= _COOC_CAP

    got = token_cooccurrence_topk(spark, sf_dir).toPandas()
    ts = F.array_distinct(F.split("text", " "))
    pairs = F.flatten(
        F.transform(
            ts,
            lambda x: F.transform(
                F.filter(ts, lambda y: y > x),
                lambda y: F.struct(x.alias("tok_a"), y.alias("tok_b")),
            ),
        )
    )
    want = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "tok_a", "tok_b")
        .limit(20)
        .toPandas()
    )
    assert got.values.tolist() == want.values.tolist()
