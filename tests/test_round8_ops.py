"""Round-8 operator unit tests (beyond the generic oracle sweep):
hand-computed ground truths and invariants for the late-r8 additions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineer_coder_spark.operators import textops as T


def _py_entropy_micro(symbols: list[str]) -> int:
    """Reference replay of the integer ln-grid entropy (micro-nats)."""
    n = len(symbols)
    counts: dict[str, int] = {}
    for s in symbols:
        counts[s] = counts.get(s, 0) + 1
    acc = 0
    for k in counts.values():
        acc += k * math.floor(math.log(k / n) * 1e9)
    return math.floor(-acc / (n * 1000.0) + 0.5)


def test_entropy_quality_matches_hand_computation(spark):
    rows = [
        (1, "abab"),          # chars: 2×a 2×b → exactly ln 2 nats
        (2, "aaaa"),          # zero entropy, should flag low_entropy
        (3, "the cat sat"),   # 3 distinct tokens → token entropy ln 3
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cs = F.split("text", "")
    ws = F.split("text", " ")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            T._entropy_micro(cs).alias("ce"),
            T._entropy_micro(ws).alias("te"),
        ).collect()
    }
    assert got[1]["ce"] == _py_entropy_micro(list("abab"))
    assert abs(got[1]["ce"] / 1e6 - math.log(2)) < 1e-5
    assert got[2]["ce"] == 0
    assert abs(got[3]["te"] / 1e6 - math.log(3)) < 1e-5
    # token entropy of doc 3: chars include spaces
    assert got[3]["ce"] == _py_entropy_micro(list("the cat sat"))


def test_entropy_quality_registry_flags_repetitive_docs(spark, sf_dir):
    out = T.entropy_quality(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        # entropy is bounded by ln(alphabet)=ln(n_distinct) ≤ ln(n)
        assert 0.0 <= r["char_entropy"] <= math.log(r["n_chars"]) + 1e-6
        assert 0.0 <= r["token_entropy"] <= math.log(r["n_tokens"]) + 1e-6
        assert r["low_entropy"] == (
            r["char_entropy"] < 2.5 or r["token_entropy"] < 1.5
        )
