#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, sorted-column schema,
and order-insensitive values (floats exact after in-query rounding, with
a small fallback tolerance reported as WARN).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from data_engineer_coder_spark import registry  # noqa: E402
from data_engineer_coder_spark.io.tables import TABLES  # noqa: E402
from data_engineer_coder_spark.session import get_spark  # noqa: E402


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


def compare(name: str, spark_rows, duck_rows, spark_cols, duck_cols) -> list[str]:
    problems = []
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cpus=8)
    con = duck_connect(sf_dir)
    specs = registry.all_queries()
    oracles = registry.oracle_sql()
    n_pass = n_fail = n_warn = n_rows_only = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, spark_rows, duck_rows, spark_cols, duck_cols)
        dt = time.time() - t0
        if not problems:
            print(f"PASS {name}: {len(spark_rows)} rows [{dt:.1f}s]")
            n_pass += 1
        elif all(p.startswith("WARN") for p in problems):
            print(f"WARN {name}: {problems} [{dt:.1f}s]")
            n_warn += 1
        else:
            print(f"FAIL {name}: {problems} [{dt:.1f}s]")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_warn} warn, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
