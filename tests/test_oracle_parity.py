"""The engine's sqllogictest: every oracle-checkable registry query must
match DuckDB exactly at sf0.001 (the driver re-runs this at sf0.01)."""

from __future__ import annotations

import pytest

from data_engineer_coder_spark import registry
from data_engineer_coder_spark.testing import run_compare

_SPECS = registry.all_queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name: str, spark, duck, sf_dir):
    problems = run_compare(spark, duck, _SPECS[name].fn, _ORACLES[name], sf_dir)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(_SPECS) - set(_ORACLES)))
def test_rows_only_queries_execute(name: str, spark, sf_dir):
    df = _SPECS[name].fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None
