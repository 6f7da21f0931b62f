"""Property-based tests (hypothesis) for the engine's parity-critical
scalar semantics.  Deliberately small example counts: each property
round-trips through a Spark job."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_settings = settings(max_examples=12, deadline=None)


# str.capitalize parity expression (P4/F1 — the reference's city.capitalize()).
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=24
)


@given(s=_text)
@_settings
def test_capitalize_expr_matches_python(spark, s):
    cap = F.concat(F.upper(F.substring("t", 1, 1)), F.lower(F.expr("substring(t, 2)")))
    df = spark.createDataFrame([(s,)], "t string").select(cap.alias("c"))
    got = df.collect()[0][0]
    # Python capitalize() also title-cases some unicode; ASCII-only here.
    assert got == s.capitalize()


# dsum determinism property: the decimal-sum pattern equals exact Decimal
# arithmetic regardless of partitioning.
_moneys = st.lists(
    st.integers(min_value=-10_000_000, max_value=10_000_000).map(lambda c: c / 100),
    min_size=1,
    max_size=40,
)


@given(xs=_moneys)
@_settings
def test_dsum_is_exact_decimal_sum(spark, xs):
    from data_engineer_coder_spark.operators._helpers import dsum

    df = spark.createDataFrame([(x,) for x in xs], "v double").repartition(4)
    got = df.agg(dsum("v").alias("s")).collect()[0][0]
    want = float(sum(Decimal(str(x)) for x in xs))
    assert got == want


# Rolling-hash fingerprint: pure modular arithmetic must match a python
# reimplementation exactly (cross-engine determinism anchor).
@given(s=st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=60))
@_settings
def test_fingerprint_matches_python(spark, s):
    chars = F.transform(F.split("t", ""), lambda c: F.ascii(c).cast("bigint"))
    fp = F.aggregate(
        F.slice(chars, 2, F.size(chars) - 1),
        F.element_at(chars, 1),
        lambda acc, c: (acc * 31 + c) % F.lit(2147483647).cast("bigint"),
    )
    df = spark.createDataFrame([(s,)], "t string").select(fp.alias("f"))
    got = df.collect()[0][0]
    acc = ord(s[0])
    for ch in s[1:]:
        acc = (acc * 31 + ord(ch)) % 2147483647
    assert got == acc


# Content-hash sampling: membership is a pure function of the data, so
# the sampled id-set must be invariant under any repartitioning.
@given(n_parts=st.integers(min_value=1, max_value=9))
@_settings
def test_deterministic_sample_invariant_under_partitioning(spark, n_parts):
    from data_engineer_coder_spark.io.tables import table as t

    ev = t(spark, "/root/testdata/sf0.001", "events").repartition(n_parts)
    hk = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    ids = sorted(r[0] for r in ev.filter(hk < "20").select("event_id").collect())
    ev2 = t(spark, "/root/testdata/sf0.001", "events").coalesce(1)
    ids2 = sorted(r[0] for r in ev2.filter(hk < "20").select("event_id").collect())
    assert ids == ids2


# with_global_pos must agree with a driver-side sort enumeration for any
# input multiset and partition count.
@given(
    xs=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    n_parts=st.integers(min_value=1, max_value=6),
)
@_settings
def test_with_global_pos_matches_enumeration(spark, xs, n_parts):
    from data_engineer_coder_spark.operators._helpers import with_global_pos

    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "id long, x long").repartition(7)
    ranked = with_global_pos(df, [F.asc("x"), F.asc("id")], num_partitions=n_parts)
    got = {(r.id): r.pos for r in ranked.collect()}
    want = {
        rid: pos + 1
        for pos, (rid, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    assert got == want
