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


def test_observation_metrics_piggyback_on_action(spark, sf_dir):
    """`observe()` collects aggregates during the SAME job as the action —
    pipeline instrumentation without a second scan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from data_engineer_coder_spark.io.tables import table

    obs = Observation("li_metrics")
    li = table(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("total_qty"),
    )
    out = li.filter(F.col("l_quantity") >= 25).count()
    m = obs.get
    assert m["n_rows"] == li.count()
    assert out < m["n_rows"]
    assert m["total_qty"] > 0
