from __future__ import annotations

from data_engineer_coder_spark.api import Engine


def test_engine_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    assert "lineitem" in eng.tables()
    assert eng.table("region").count() == 5
    assert len(eng.names()) >= 80
    assert eng.query("pricing_summary").count() > 0
    assert "SUM" in (eng.oracle("pricing_summary") or "")
    row = eng.sql(
        "SELECT COUNT(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey"
    ).collect()[0]
    assert row.n > 0
