"""Unit tests for the oracle-differential harness and the registry's
driver-rotation logic — the meta-machinery the correctness gate rests on.

The round-2 postmortem (VERDICT.md) found two silent classes:
1. a DuckDB windowed ``SUM(INTEGER)`` returns HUGEINT, which pandas
   materializes as float64 and the driver hashes as ``5.0`` vs Spark's
   ``5`` — the old ``fetchall()`` harness could not see it;
2. the rotation counted any non-error CORRECTNESS row as "verified", so
   a hash-MISMATCHED query was retired from future check prefixes.
These tests pin both fixes.
"""

from __future__ import annotations

import json

import duckdb
import pandas as pd
import pytest

from data_engineer_coder_spark import registry
from data_engineer_coder_spark.testing import compare_pandas


# ---------------------------------------------------------------------------
# Harness: dtype-kind sensitivity (driver parity)
# ---------------------------------------------------------------------------


def test_uncast_windowed_sum_is_caught():
    """A HUGEINT-producing oracle (windowed SUM over INTEGER) must FAIL the
    harness against a bigint Spark result even when the numbers agree."""
    con = duckdb.connect()
    duck = con.execute(
        "SELECT SUM(i) OVER (ORDER BY i) AS s "
        "FROM (SELECT CAST(range AS INTEGER) AS i FROM range(3))"
    ).fetchdf()
    assert duck["s"].dtype.kind == "f"  # HUGEINT → float64: the hazard exists
    spark_like = pd.DataFrame({"s": pd.Series([0, 1, 3], dtype="int64")})
    problems = compare_pandas(spark_like, duck)
    assert problems, "int-vs-float64 materialization must be a harness failure"
    assert "WARN" not in problems[0], "kind mismatch is fatal, never tol-equal"


def test_cast_windowed_sum_passes():
    """The prescribed fix — CAST(... AS BIGINT) — restores an exact match."""
    con = duckdb.connect()
    duck = con.execute(
        "SELECT CAST(SUM(i) OVER (ORDER BY i) AS BIGINT) AS s "
        "FROM (SELECT CAST(range AS INTEGER) AS i FROM range(3))"
    ).fetchdf()
    spark_like = pd.DataFrame({"s": pd.Series([0, 1, 3], dtype="int64")})
    assert compare_pandas(spark_like, duck) == []


def test_float_near_miss_is_warn_not_fatal():
    a = pd.DataFrame({"x": pd.Series([1.00000001], dtype="float64")})
    b = pd.DataFrame({"x": pd.Series([1.0], dtype="float64")})
    problems = compare_pandas(a, b)
    assert problems and problems[0].startswith("WARN")


def test_null_vs_nan_collapse():
    """pandas cannot distinguish NULL-float from NaN, so neither can the
    driver — the harness must treat them as equal, not as a mismatch."""
    a = pd.DataFrame({"x": pd.Series([1.5, None], dtype="float64")})
    b = pd.DataFrame({"x": pd.Series([1.5, float("nan")], dtype="float64")})
    assert compare_pandas(a, b) == []


# ---------------------------------------------------------------------------
# Registry rotation: what counts as "driver-verified"
# ---------------------------------------------------------------------------


def _write_rows(tmp_path, fname, rows):
    (tmp_path / fname).write_text(json.dumps(rows))


def test_hash_mismatch_is_not_retired(tmp_path):
    """A row that ran but hash-mismatched must NOT count as green — it has
    to stay eligible for future check prefixes (ADVICE round 2, high)."""
    _write_rows(
        tmp_path,
        "CORRECTNESS_r01.json",
        {
            "good": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            "bad": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
            "errored": {"rows_match": None, "hash_match": None, "err": "boom"},
        },
    )
    seen = registry._driver_checked(root=str(tmp_path))
    assert seen["good"] == 1  # last green round
    assert seen["bad"] == -1  # reached but never green
    assert seen["errored"] == -1


def test_no_oracle_rows_are_retired(tmp_path):
    """Oracle-less (rows-only-by-design) queries can never hash-match; they
    must count as seen so they stop eating prefix slots every round."""
    _write_rows(
        tmp_path,
        "CORRECTNESS_r01.json",
        {"approx": {"rows_match": None, "hash_match": None, "err": "no_oracle"}},
    )
    assert registry._driver_checked(root=str(tmp_path))["approx"] == 1


def test_green_in_any_round_wins(tmp_path):
    """A later green row retires a query even if an earlier round errored,
    and the recorded round is the LATEST green (staleness-rotation input)."""
    _write_rows(tmp_path, "CORRECTNESS_r01.json", {"q": {"hash_match": False, "err": None}})
    _write_rows(tmp_path, "CORRECTNESS_r02.json", {"q": {"hash_match": True, "err": None}})
    _write_rows(tmp_path, "CORRECTNESS_r03.json", {"q": {"hash_match": False, "err": None}})
    assert registry._driver_checked(root=str(tmp_path))["q"] == 2


# ---------------------------------------------------------------------------
# Fixture schema contract (VERDICT r4 item 3 / r3 item 8)
# ---------------------------------------------------------------------------

# As-read dtypes AFTER the loader's normalization (io/tables.py:table()).
# The round-3/4 NTZ incident: events.ts silently shifted physical parquet
# type between fixture generations and a full round was lost to red driver
# rows before anyone looked at a schema.  This contract makes the NEXT
# drift cost one loud test failure instead.
_SCHEMA_CONTRACT = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    # ts MUST come out as LTZ "timestamp" — unix_micros/watermarks depend on
    # it; the loader normalizes NANOS-as-long and NTZ variants.
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}

_SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


@pytest.mark.parametrize("fixture_dir", _SF_DIRS)
def test_fixture_schema_contract(spark, fixture_dir):
    """Every fixture table's as-read dtypes must match the pinned contract
    at every scale factor the driver touches (schema-only: no data read)."""
    import os

    from data_engineer_coder_spark.io.tables import TABLES, table

    if not os.path.isdir(fixture_dir):
        pytest.skip(f"{fixture_dir} absent")
    assert set(TABLES) == set(_SCHEMA_CONTRACT), "TABLES/contract drifted apart"
    drift = {}
    for name in TABLES:
        got = table(spark, fixture_dir, name).dtypes
        if got != _SCHEMA_CONTRACT[name]:
            drift[name] = {"expected": _SCHEMA_CONTRACT[name], "got": got}
    assert not drift, (
        f"fixture schema drift at {fixture_dir}: {drift}\n"
        "REMEDIATION: the fixture generator changed a physical parquet type "
        "(it has before: events.ts TIMESTAMP(NANOS) -> timestamp[us]/NTZ). "
        "Normalize the new variant at the single loader choke point "
        "data_engineer_coder_spark/io/tables.py:table() (and "
        "streaming/core.py:stream_events() if it reads events), then update "
        "this contract. Do NOT patch individual queries — round 3 died that "
        "way. Stale driver greens predating the drift are invalid: add the "
        "affected names to registry._FORCE_RECHECK."
    )


def test_check_prefix_priority_order():
    """The 50-query driver prefix obeys the rotation policy: forced
    re-checks and unverified queries outrank green ones, and within the
    green tier staleness is monotone — no query OUTSIDE the prefix may have
    an older last-green round than any green query inside it (oldest-first
    rotation; every query re-proven every ~5 rounds with zero curation)."""
    names = list(registry.queries())
    seen = registry._driver_checked()
    prefix, rest = names[:50], names[50:]
    # Tier ordering: anything forced/unverified must sit in the prefix while
    # slots remain (there are far fewer than 50 such queries today).
    urgent = [
        n for n in names if n in registry._FORCE_RECHECK or seen.get(n, -1) < 0
    ]
    assert all(n in prefix for n in urgent[:50]), "urgent query left out of prefix"
    # Forced names live in tier 0 regardless of how fresh their (now stale)
    # green row is — exclude them from the green-staleness monotonicity check.
    green_in = [
        seen[n]
        for n in prefix
        if seen.get(n, -1) >= 0 and n not in registry._FORCE_RECHECK
    ]
    green_out = [seen[n] for n in rest if seen.get(n, -1) >= 0]
    if green_in and green_out:
        assert max(green_in) <= min(green_out), (
            "staleness rotation violated: a fresher green sits in the prefix "
            "while a staler one waits outside"
        )


@pytest.mark.parametrize("fixture_dir", _SF_DIRS)
def test_fixture_text_bounds_contract(fixture_dir):
    """Several DuckDB oracles enumerate positions with a HARD bound that
    the Spark side computes exactly: range(1,129) gram/position starts
    (ngram_decontaminate, repeated_token_runs, pretraining_corpus_build),
    range(0,64) chunk starts (chunk_long_docs), range(1,32) character
    bigram starts (bpe_merge_candidates).  A regenerated fixture with
    longer documents or tokens would make those oracles silently
    truncate while Spark counts everything — five ops red at once with
    confusing mismatches.  Pin the data bounds here so the drift costs
    ONE loud failure instead (the same posture as the schema contract
    above)."""
    import os

    import duckdb

    if not os.path.isdir(fixture_dir):
        pytest.skip(f"{fixture_dir} absent")
    con = duckdb.connect()
    max_tok, max_wlen = con.execute(
        f"""
        SELECT MAX(LEN(string_split(text, ' '))),
               MAX(list_max(list_transform(string_split(text, ' '), w -> LENGTH(w))))
        FROM read_parquet('{fixture_dir}/documents.parquet')
        """
    ).fetchone()
    problems = []
    if max_tok > 128:  # range(1, 129) position enumerations
        problems.append(f"max doc tokens {max_tok} > 128")
    if max_tok > 64 * 24:  # chunk_long_docs range(0, 64) at stride 24
        problems.append(f"max doc tokens {max_tok} > 64*24 chunk bound")
    if max_wlen > 31:  # bpe_merge_candidates range(1, 32)
        problems.append(f"max token length {max_wlen} > 31")
    assert not problems, (
        f"fixture text bounds drifted at {fixture_dir}: {problems}\n"
        "REMEDIATION: raise the range(...) bounds in the oracles of "
        "ngram_decontaminate / repeated_token_runs / pretraining_corpus_build "
        "(textops.py, pipelines.py), chunk_long_docs (packing.py), and "
        "bpe_merge_candidates (textops.py), then update this contract. "
        "Stale driver greens predating the drift are invalid: add the "
        "affected names to registry._FORCE_RECHECK."
    )


def test_coverage_md_lists_every_registered_query():
    """COVERAGE.md is the judge's implementation map — every registered
    query name must appear in it (round 7: six names had drifted out;
    this pins the invariant so the map can't drift again)."""
    import os

    from data_engineer_coder_spark import registry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md")) as f:
        text = f.read()
    missing = [n for n in registry.all_queries() if f"`{n}`" not in text]
    assert not missing, f"COVERAGE.md is missing {len(missing)} queries: {missing}"
