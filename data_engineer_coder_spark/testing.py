"""Oracle-differential test harness (SURVEY.md §5.2).

Shared by ``scripts/check_oracle.py`` and the pytest suite: run a
registry query on Spark and its oracle SQL on DuckDB over the same
parquet, compare row count + sorted-column schema + order-insensitive
values.

Driver parity note: the external gate materializes BOTH results through
pandas before hashing, which makes *dtype* part of the contract — a
DuckDB HUGEINT (e.g. a windowed ``SUM(INTEGER)``) comes back as float64
and hashes ``5.0`` against Spark's ``5``.  So this harness compares via
``DataFrame.toPandas()`` / ``duckdb.fetchdf()`` (not ``fetchall``, whose
Python-int round-trip hides that class) and uses *type-sensitive* value
canonicalization: ``5`` (int) never equals ``5.0`` (float).  Floats
compare exactly (queries are authored to be bit-deterministic; see
``operators/_helpers.py``) with a reported tolerance fallback so
near-misses are visible as warnings, not bugs.
"""

from __future__ import annotations

import datetime
import decimal
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


def _canon(v):
    """Type-sensitive canonical token for one value.

    Numeric *kind* is part of the token (int 5 != float 5.0): pandas
    materialization on the driver side makes a HUGEINT/float64 oracle
    column hash differently from Spark's bigint even when the numbers
    agree, so equality here must be as strict as the driver's hash.
    NULL and NaN collapse to one token — pandas cannot distinguish a
    NULL double from a computed NaN, so neither can the driver.
    """
    import numpy as np

    if v is None:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("null",)
        if f == 0.0:
            return ("f", 0.0)
        return ("f", round(f, 9))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, bytes):
        return ("by", v)
    if isinstance(v, np.ndarray):
        return ("a", tuple(_canon(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    try:
        import pandas as pd

        if pd.isna(v):
            return ("null",)
    except (TypeError, ValueError):
        pass
    return ("o", repr(v))


def _canon_rows(pdf) -> list[tuple]:
    """pandas DataFrame -> sorted list of canonical-token tuples, with
    columns reordered by name (the driver sorts columns before hashing)."""
    cols = sorted(pdf.columns)
    body = pdf[cols]
    rows = [
        tuple(_canon(v) for v in row)
        for row in body.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def values_close(a, b) -> bool:
    """Tolerance comparison over canonical tokens (float near-miss only —
    a numeric *kind* mismatch is driver-fatal and never 'close')."""
    if isinstance(a, tuple) and isinstance(b, tuple):
        if len(a) != len(b):
            return False
        if len(a) == 2 and a[0] == "f" and b[0] == "f":
            return math.isclose(a[1], b[1], rel_tol=1e-7, abs_tol=1e-7)
        return all(values_close(x, y) for x, y in zip(a, b))
    return a == b


def compare_pandas(spdf, dpdf) -> list[str]:
    """Compare a Spark ``toPandas()`` result against a DuckDB ``fetchdf()``
    result.  Returns problems; empty list = exact match.  'WARN:' prefix =
    tolerance-only equality (treat as float-determinism bug to fix)."""
    problems: list[str] = []
    if len(spdf) != len(dpdf):
        problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        return problems
    if sorted(spdf.columns) != sorted(dpdf.columns):
        problems.append(
            f"schema spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}"
        )
        return problems
    s = _canon_rows(spdf)
    d = _canon_rows(dpdf)
    exact = sum(1 for x, y in zip(s, d) if x == y)
    if exact != len(s):
        close = sum(1 for x, y in zip(s, d) if values_close(x, y))
        kinds = {
            c: (str(spdf[c].dtype), str(dpdf[c].dtype))
            for c in sorted(spdf.columns)
            if spdf[c].dtype.kind != dpdf[c].dtype.kind
        }
        if close == len(s):
            problems.append(f"WARN: {len(s) - exact}/{len(s)} rows only tol-equal")
        else:
            bad = [(x, y) for x, y in zip(s, d) if not values_close(x, y)][:3]
            problems.append(
                f"values: {len(s) - close}/{len(s)} mismatched"
                + (f"; dtype-kind split {kinds}" if kinds else "")
                + f"; first: {bad}"
            )
    return problems


def run_compare(spark, con, fn, oracle: str, sf_dir: str) -> list[str]:
    spdf = fn(spark, sf_dir).toPandas()
    dpdf = con.execute(oracle).fetchdf()
    return compare_pandas(spdf, dpdf)
