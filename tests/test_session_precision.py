"""Sub-second gap-boundary fixtures for capped sessionization.

Round-2 ADVICE: `session_capped` computed the 30-min gap on truncated
epoch seconds while its oracle compared full-precision timestamps — any
true gap in (1800 s, 1801 s) whose fractional parts truncate to a 1800 s
diff splits sessions in the oracle but not in Spark.  Both sides now
compare full-precision timestamps; these fixtures pin the boundary.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineer_coder_spark import registry
from data_engineer_coder_spark.testing import compare_pandas

_EPOCH = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events_dir(tmp_path, gaps_us: list[int]) -> str:
    """Write an events.parquet whose successive rows are separated by the
    given microsecond gaps (single user, one row per gap + 1)."""
    ts, cur = [_EPOCH], _EPOCH
    for g in gaps_us:
        cur = cur + datetime.timedelta(microseconds=g)
        ts.append(cur)
    pdf = pd.DataFrame(
        {
            "event_id": range(len(ts)),
            "user_id": [1] * len(ts),
            "ts": pd.Series(ts, dtype="datetime64[us]"),
        }
    )
    d = tmp_path / "sf_sessions"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _run_both(spark, sf_dir: str):
    spec = registry.all_queries()["session_capped"]
    spdf = spec.fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    dpdf = con.execute(spec.oracle).fetchdf()
    con.close()
    return spdf, dpdf


# The old floor-seconds bug fired exactly here: true gap 1800.2 s (> 30 min,
# splits) but floored epoch diff = 1800 (old Spark path said same session).
_BOUNDARY_GAPS_US = [
    [1_800_200_000],  # the reproduce case: frac parts truncate to 1800 s
    [1_799_999_999],  # just under: must NOT split
    [1_800_000_001],  # 1 µs over: must split
    [1_800_200_000, 400_000, 1_800_900_000],  # mixed run with sub-second offsets
]


@pytest.mark.parametrize("gaps_us", _BOUNDARY_GAPS_US)
def test_session_capped_boundary_gap(spark, tmp_path, gaps_us):
    sf_dir = _events_dir(tmp_path, gaps_us)
    spdf, dpdf = _run_both(spark, sf_dir)
    assert compare_pandas(spdf, dpdf) == [], f"gaps={gaps_us}"


@given(
    gaps=st.lists(
        st.integers(min_value=1_799_000_000, max_value=1_801_000_000),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=8, deadline=None)
def test_session_capped_gap_property(spark, tmp_path_factory, gaps):
    sf_dir = _events_dir(tmp_path_factory.mktemp("sess"), gaps)
    spdf, dpdf = _run_both(spark, sf_dir)
    assert compare_pandas(spdf, dpdf) == [], f"gaps={gaps}"
