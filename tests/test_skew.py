"""Skew stress tests (round 7, VERDICT r6 item 5).

Every prior skew-handling claim was tested on uniform fixtures; these
tests run the salting helpers and AQE's skew-join against a ZIPF-keyed
events variant where the hottest key owns a double-digit percent of all
rows — the shape that actually breaks shuffles at 100 TB.

The wall-clock before/after comparison lives in scripts/skew_bench.py
(recorded in BASELINE.md); pytest only asserts mechanisms engage and
results stay exact.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_engineer_coder_spark.plans.scale import (
    salted_groupby_count,
    salted_join_small_skew,
)

_N = 400_000
_N_USERS = 20_000


def _gen_zipf(outdir: str) -> None:
    rng = np.random.default_rng(7)
    # zipf(1.3) tail + a forced 30%-of-rows hot head: the worst key a
    # web-scale corpus actually produces (one boilerplate user/domain)
    uid = np.minimum(rng.zipf(1.3, _N), _N_USERS).astype(np.int64)
    uid[: int(0.3 * _N)] = 1
    # SHUFFLE rows and write 16 files: AQE splits a skewed reduce
    # partition at MAP-OUTPUT granularity, so a hot key whose rows all
    # come from one map task (one small file) is unsplittable no matter
    # the thresholds — the single-file variant of this fixture never
    # produced skew=true.  Real tables are always many files; the
    # fixture must be too.
    perm = rng.permutation(_N)
    uid = uid[perm]
    vals = np.round(rng.uniform(0, 100, _N), 2)
    evdir = os.path.join(outdir, "zipf_events.parquet")
    os.makedirs(evdir)
    for i in range(16):
        sl = slice(i * _N // 16, (i + 1) * _N // 16)
        pq.write_table(
            pa.table({"user_id": uid[sl], "value": vals[sl]}),
            os.path.join(evdir, f"part-{i:02d}.parquet"),
        )
    users = np.arange(1, _N_USERS + 1, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "user_id": users,
                "segment": np.array(["a", "b", "c", "d"])[users % 4],
            }
        ),
        os.path.join(outdir, "zipf_users.parquet"),
    )


@pytest.fixture(scope="module")
def zipf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("zipf"))
    _gen_zipf(d)
    return d


def test_fixture_is_actually_skewed(spark, zipf_dir):
    ev = spark.read.parquet(f"{zipf_dir}/zipf_events.parquet")
    top = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    assert top["count"] > 0.25 * _N, "zipf fixture lost its hot key"


def test_salted_groupby_matches_plain_on_zipf(spark, zipf_dir):
    ev = spark.read.parquet(f"{zipf_dir}/zipf_events.parquet")
    got = dict(salted_groupby_count(ev, "user_id").collect())
    want = dict(ev.groupBy("user_id").count().collect())
    assert got == want


def test_salted_join_matches_plain_on_zipf(spark, zipf_dir):
    ev = spark.read.parquet(f"{zipf_dir}/zipf_events.parquet")
    dim = spark.read.parquet(f"{zipf_dir}/zipf_users.parquet")
    got = (
        salted_join_small_skew(ev, dim, "user_id")
        .groupBy("segment")
        .agg(F.count("*").alias("n"))
    )
    want = ev.join(dim, "user_id").groupBy("segment").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_aqe_skew_join_engages_on_zipf(spark, zipf_dir):
    """AQE's skew-join split must actually fire on the hot key: after
    execution the adaptive sort-merge join node reports skew=true, and
    the split must not change the row count.  Thresholds are lowered so
    the 400k-row local fixture crosses the same trigger a multi-GB hot
    partition crosses in production.

    Production gotcha (root-caused round 7): a STAGE-TERMINAL join
    splits with default settings, but a join whose output feeds another
    shuffle (the common join→agg shape) is declined by the rule's
    no-extra-shuffle cost check and needs
    spark.sql.adaptive.forceOptimizeSkewedJoin=true — and even then the
    split granularity is map outputs, so at this fixture's tiny file
    sizes the agg shape only engages reliably at bench scale
    (scripts/skew_bench.py asserts it at 8M rows × 32 cores).  Here we
    pin the terminal-join split and the agg shape's exactness."""
    ev = spark.read.parquet(f"{zipf_dir}/zipf_events.parquet")
    dim = spark.read.parquet(f"{zipf_dir}/zipf_users.parquet")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # stage-terminal join: splits with defaults
        df = ev.join(dim, "user_id")
        assert len(df.collect()) == _N  # split must not change row count
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
        # join→agg under the force flag: results stay exact
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        agg = ev.join(dim, "user_id").groupBy("segment").count()
        assert sum(r["count"] for r in agg.collect()) == _N
    finally:
        spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
