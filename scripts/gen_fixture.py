#!/usr/bin/env python
"""Deterministic synthetic fixture generator for SCALE testing.

Correctness stays anchored to the driver-generated `/root/testdata/sf*`
fixtures (read-only).  This generator exists for one thing: producing
LARGER instances (sf1 = 10× sf0.1) with the same schemas and the same
distribution *shapes* so the heavy operators' runtime curves can be
measured apples-to-apples (scripts/scale_bench.py).  It is seeded, so
two runs produce identical bytes-modulo-parquet-metadata.

Row-count scaling observed from the driver fixtures
(sf0.001 → 0.01 → 0.1):
  lineitem 6k → 60k → 600k      (6M  @ sf1)
  orders   1.5k → 15k → 150k    (1.5M @ sf1)
  customer 150 → 1.5k → 15k     (150k @ sf1)
  part     200 → 2k → 20k       (200k @ sf1)
  supplier 10 → 100 → 1k        (10k @ sf1)
  events   1k → 10k → 100k      (1M  @ sf1)
  documents 500 → 500 → 5k      (50k @ sf1, ×10 from sf0.1)
  embeddings 500 → 500 → 2k     (20k @ sf1)
  nation 25, region 5           (fixed dims)

Distribution shapes mirrored from the sf0.1 parquet (measured in
PROGRESS round 6): 31-word vocab word-soup documents of 10–100 words,
~0.3% exact-dup pairs plus a near-dup tail (mutation families — the
dedup ops need real positives), 5 uniform event types over 30 days for
n/66.7 users, 64-dim N(0, 0.1) embeddings with uniform 0–9 labels,
orders dated 1995–2001 with ~4 lineitems each.

Usage: python scripts/gen_fixture.py SF OUTDIR   (e.g. 1.0 perfdata/sf1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "a", "big", "key", "window", "row", "table", "stream",
    "merge", "data", "vector", "join", "shuffle", "plan", "cache",
]
LANGS = ["en", "es", "de", "fr", "zh"]
LANG_P = [0.41, 0.15, 0.14, 0.15, 0.15]
ETYPES = ["signup", "purchase", "view", "click", "error"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PMATS = ["ANODIZED", "BRUSHED", "BURNISHED", "PLATED", "POLISHED"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _money(rng: np.random.Generator, n: int, lo: float, hi: float) -> np.ndarray:
    """2dp-decimal-valued doubles (the fixture money convention the
    decimal-sum determinism pattern depends on)."""
    return np.round(rng.uniform(lo, hi, n), 2)


def _zipf_vocab(size: int = 100_000, s: float = 1.07):
    """Open-vocabulary model: ``size`` ranked words with Zipf(s)
    probabilities — the realistic corpus shape the 31-word closed vocab
    can't express (BASELINE.md r7: the closed vocab saturates the
    shingle/signature space and makes the true near-dup answer itself
    quadratic).  Returns (words, p)."""
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks ** (-s)
    p /= p.sum()
    words = np.array([f"w{i}" for i in range(size)])
    return words, p


def _gen_documents(rng, n_doc: int, open_vocab: bool):
    """Document texts + dup/near-dup families (shared by both modes)."""
    if open_vocab:
        vocab, vp = _zipf_vocab()
    else:
        vocab, vp = np.array(VOCAB), None
    lens = rng.integers(10, 101, n_doc)
    all_words = rng.choice(len(vocab), size=int(lens.sum()), p=vp)
    texts: list[str] = []
    off = 0
    for ln in lens:
        texts.append(" ".join(vocab[all_words[off : off + ln]]))
        off += ln
    # exact dups: ~0.3% of docs copy an earlier doc (sf0.1 measured: 8
    # dup pairs / 5000 docs); near dups: ~1% copy with a 1-word mutation.
    n_exact = max(2, int(n_doc * 0.0032 / 2))
    n_near = max(2, int(n_doc * 0.01))
    for i in rng.integers(0, n_doc, n_exact):
        texts[(i + 1) % n_doc] = texts[i]
    for i in rng.integers(0, n_doc, n_near):
        words = texts[i].split()
        words[int(rng.integers(0, len(words)))] = str(
            vocab[int(rng.choice(len(vocab), p=vp))]
        )
        texts[(i + 7) % n_doc] = " ".join(words)
    return texts


def gen(sf: float, outdir: str, open_vocab: bool = False, docs_only: bool = False) -> None:
    k = sf * 1000  # multiplier relative to the sf0.001 base counts
    n_li = int(6000 * k)
    n_ord = int(1500 * k)
    n_cust = int(150 * k)
    n_part = int(200 * k)
    n_supp = int(10 * k)
    n_ev = int(1000 * k)
    # documents/embeddings follow the driver's sf0.1 ladder (500 @ ≤0.01,
    # then ×10 per decade)
    n_doc = 500 if sf <= 0.011 else int(5000 * sf * 10)
    n_emb = 500 if sf <= 0.011 else int(2000 * sf * 10)

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    if docs_only:
        # the dedup/LSH scaling campaign needs only documents+embeddings;
        # skipping lineitem/orders keeps sf10 generation cheap
        _gen_docs_and_embeddings(rng, outdir, n_doc, n_emb, open_vocab)
        _stamp(outdir, sf, open_vocab, docs_only)
        return

    # --- dims -------------------------------------------------------------
    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, n_supp, -999.99, 9999.99),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, n_cust, -999.99, 9999.99),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(1, n_part + 1), pa.int64()),
        "p_name": [
            f"{VOCAB[a]} {VOCAB[b]} {VOCAB[c]}"
            for a, b, c in rng.integers(0, len(VOCAB), (n_part, 3))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 6, n_part)],
        "p_type": [
            f"{PTYPES[a]} {PMATS[b]}"
            for a, b in zip(rng.integers(0, 6, n_part), rng.integers(0, 5, n_part))
        ],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": _money(rng, n_part, 900.0, 2000.0),
    }))

    # --- orders / lineitem ------------------------------------------------
    base = np.datetime64("1995-01-01")
    odates = base + rng.integers(0, 2404, n_ord).astype("timedelta64[D]")
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, n_ord, 900.0, 400000.0),
        "o_orderdate": pa.array(odates.astype("datetime64[ms]"), pa.timestamp("ms")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    lkeys = rng.integers(1, n_ord + 1, n_li)
    lkeys.sort()
    odate_of = odates[lkeys - 1]
    sdates = odate_of + rng.integers(1, 122, n_li).astype("timedelta64[D]")
    qty = rng.integers(1, 51, n_li).astype("float64")
    price = _money(rng, n_li, 900.0, 105000.0)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdates.astype("datetime64[ms]"), pa.timestamp("ms")),
    }))

    # --- events -----------------------------------------------------------
    n_users = max(1, n_ev // 67)  # sf0.1: 1500 users per 100k events
    ev_base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = ev_base + rng.integers(0, 30 * 86400 * 10**6, n_ev).astype("timedelta64[us]")
    ts.sort()
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(1, n_ev + 1), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, n_users + 1, n_ev), pa.int64()),
        "event_type": np.array(ETYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0.0, 100.0, n_ev), 6),
        "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)],
    }))

    # --- documents / embeddings -------------------------------------------
    _gen_docs_and_embeddings(rng, outdir, n_doc, n_emb, open_vocab)
    _stamp(outdir, sf, open_vocab, docs_only)


def _gen_docs_and_embeddings(rng, outdir, n_doc, n_emb, open_vocab):
    texts = _gen_documents(rng, n_doc, open_vocab)
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(1, n_doc + 1), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(len(LANGS), n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(rng.integers(40, 600, n_doc), pa.int64()),
    }))
    vecs = rng.normal(0.0, 0.1, (n_emb, 64)).astype(np.float32)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(1, n_emb + 1), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


def _stamp(outdir, sf, open_vocab, docs_only):
    with open(os.path.join(outdir, "GENERATED.json"), "w") as fh:
        json.dump(
            {
                "sf": sf,
                "seed": 42,
                "generator": "scripts/gen_fixture.py",
                "vocab": "zipf-100k" if open_vocab else "closed-31",
                "docs_only": docs_only,
            },
            fh,
        )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf = float(args[0]) if args else 1.0
    open_vocab = "--open-vocab" in flags
    default_dir = f"perfdata/{'ov-' if open_vocab else ''}sf{sf:g}"
    outdir = args[1] if len(args) > 1 else default_dir
    print(f"generating sf={sf} into {outdir} (vocab={'zipf-100k' if open_vocab else 'closed-31'})")
    gen(sf, outdir, open_vocab=open_vocab, docs_only="--docs-only" in flags)
