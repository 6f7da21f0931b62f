"""Oracle-differential test harness (SURVEY.md §5.2).

Shared by ``scripts/check_oracle.py`` and the pytest suite: run a
registry query on Spark and its oracle SQL on DuckDB over the same
parquet, compare row count + sorted-column schema + order-insensitive
values.  Floats compare exactly (queries are authored to be
bit-deterministic; see ``operators/_helpers.py``) with a reported
tolerance fallback so near-misses are visible as warnings, not bugs.
"""

from __future__ import annotations

import math

import duckdb

from .io.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple]) -> list[tuple]:
    """Canonicalize values so Spark and DuckDB rows compare equal."""
    out = []
    for row in rows:
        canon = []
        for v in row:
            if isinstance(v, bool):
                canon.append(bool(v))
            elif isinstance(v, float):
                canon.append(0.0 if v == 0 else round(v, 9))
            elif isinstance(v, (list, tuple)):
                canon.append(tuple(round(x, 6) if isinstance(x, float) else x for x in v))
            else:
                canon.append(v)
        out.append(tuple(canon))
    return sorted(out, key=lambda r: tuple(repr(x) for x in r))


def values_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-7, abs_tol=1e-7)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(values_close(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_rows, duck_rows, spark_cols, duck_cols) -> list[str]:
    """Returns problems; empty list = exact match.  'WARN:' prefix =
    tolerance-only equality (treat as float-determinism bug to fix)."""
    problems: list[str] = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = normalize([tuple(r[i] for i in order) for r in spark_rows])
    d = normalize([tuple(r[i] for i in dorder) for r in duck_rows])
    exact = sum(1 for x, y in zip(s, d) if x == y)
    if exact != len(s):
        close = sum(1 for x, y in zip(s, d) if values_close(x, y))
        if close == len(s):
            problems.append(f"WARN: {len(s) - exact}/{len(s)} rows only tol-equal")
        else:
            bad = [(x, y) for x, y in zip(s, d) if not values_close(x, y)][:3]
            problems.append(f"values: {len(s) - close}/{len(s)} mismatched; first: {bad}")
    return problems


def run_compare(spark, con, fn, oracle: str, sf_dir: str) -> list[str]:
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle)
    duck_cols = [dsc[0] for dsc in res.description]
    duck_rows = res.fetchall()
    return compare(spark_rows, duck_rows, spark_cols, duck_cols)
