"""S1: partition-parallel REST/JSON source (SURVEY.md §2.1).

The reference fetches sequentially on the driver — one blocking HTTP GET
per city (``/root/reference/dags/my_data_pipeline.py:22-48``, loop at
``:78,155``), with Airflow-level retry (``airflow_dag.py:17-18``).

Spark-first design: the *request list* is a DataFrame; the fetch runs
inside ``mapInPandas`` so N executors fetch in parallel with per-request
retry/backoff, and the parsed payload lands as typed columns.  The
fetcher is injectable: tests/CI use a deterministic fake; production
passes a real HTTP client.  No token is ever hardcoded (the reference
embeds one at ``my_data_pipeline.py:34`` — deliberately not replicated;
use env/secret injection).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("body", T.StringType()),
        T.StructField("n_attempts", T.IntegerType()),
    ]
)


def http_fetcher(url: str, timeout_s: float = 10.0) -> tuple[int, str]:
    """Real HTTP GET (urllib; no extra deps).  Returns (status, body)."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
            return resp.status, resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as e:  # 4xx/5xx still carry a status
        return e.code, e.read().decode("utf-8", "replace")


def fetch_urls(
    urls_df: DataFrame,
    fetcher: Callable[[str], tuple[int, str]] = http_fetcher,
    max_retries: int = 2,
    backoff_s: float = 0.5,
    partitions: int | None = None,
) -> DataFrame:
    """Fetch every row of ``urls_df`` (column ``url``) in parallel across
    partitions; retries with exponential backoff on 5xx/exceptions
    (mirrors the reference's task-level retry, airflow_dag.py:17-18,
    but per-request and distributed).

    ``partitions`` sizes the fetch fan-out (requests-per-task tradeoff).
    Empty partitions still pay a Python-worker round trip in
    ``mapInPandas``, so match it to the request count, not the core
    count, for small lists."""
    if partitions is not None:
        urls_df = urls_df.repartition(partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url in pdf["url"]:
                status, body, attempts = -1, "", 0
                for attempt in range(max_retries + 1):
                    attempts = attempt + 1
                    try:
                        status, body = fetcher(url)
                        if status < 500:
                            break
                    except Exception as e:  # network failure → retry
                        status, body = -1, str(e)
                    time.sleep(backoff_s * (2**attempt))
                out.append((url, status, body, attempts))
            yield pd.DataFrame(out, columns=["url", "status", "body", "n_attempts"])

    return urls_df.mapInPandas(run, schema=FETCH_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic fake of the reference's air-quality API (the JSON shape of
# my_data_pipeline.py:38-48: data → forecast → daily → <contaminant> →
# [{day, avg, max, min}]).
# ---------------------------------------------------------------------------

CITIES = ("madrid", "barcelona", "valencia")
CONTAMINANTS = ("o3", "pm10", "pm25", "uvi")
_DAYS = ("2024-06-01", "2024-06-02", "2024-06-03")


def fake_payload(city: str) -> dict:
    """Deterministic payload derived from (city, contaminant, day) only."""
    ci = CITIES.index(city) if city in CITIES else len(city)
    daily = {}
    for kj, cont in enumerate(CONTAMINANTS):
        rows = []
        for dj, day in enumerate(_DAYS):
            base = (ci + 1) * 10 + (kj + 1) * 3 + dj
            rows.append({"day": day, "avg": base, "max": base + 5, "min": base - 2})
        daily[cont] = rows
    return {"status": "ok", "data": {"city": {"name": city}, "forecast": {"daily": daily}}}


def fake_fetcher(url: str) -> tuple[int, str]:
    city = url.rstrip("/").split("/")[-1]
    return 200, json.dumps(fake_payload(city))


def air_quality_urls(spark: SparkSession, base: str = "https://api.example.test/feed") -> DataFrame:
    rows = [(f"{base}/{c}", c) for c in CITIES]
    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("city", T.StringType())]
    )
    # One partition per URL: createDataFrame defaults to defaultParallelism
    # slices, and every (mostly empty) slice would pay a Python-worker
    # round trip in the fetch.
    return spark.createDataFrame(rows, schema).coalesce(len(rows))
