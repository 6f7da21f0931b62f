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
