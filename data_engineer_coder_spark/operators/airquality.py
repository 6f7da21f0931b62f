"""Reference-parity air-quality pipeline (SURVEY.md §3.3).

The reference's whole product, re-expressed as one lazy Spark plan:
fetch per-city JSON (``/root/reference/dags/my_data_pipeline.py:22-48``,
here the injectable fake fetcher — same payload shape), flatten
``data.forecast.daily.<contaminant>[]`` (``:50-75``), emit the wide
per-contaminant daily table with the reference's exact column naming
(``:70-73``: ``day, country, {c}_daily_avg/_max/_min``), and the
summary-stats report feed (``:212``).

No XCom, no row loops, no per-table transactions: stages exchange lazy
DataFrames inside a single plan (the §3.1 type-contract bug cannot
exist by construction).

Oracles: the fake feed is deterministic, so the same rows are embedded
as SQL VALUES for DuckDB.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.rest import (
    CITIES,
    CONTAMINANTS,
    air_quality_urls,
    fake_fetcher,
    fake_payload,
    fetch_urls,
)

_DAILY_ENTRY = T.ArrayType(
    T.StructType(
        [
            T.StructField("day", T.StringType()),
            T.StructField("avg", T.LongType()),
            T.StructField("max", T.LongType()),
            T.StructField("min", T.LongType()),
        ]
    )
)
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField(
                        "city", T.StructType([T.StructField("name", T.StringType())])
                    ),
                    T.StructField(
                        "forecast",
                        T.StructType(
                            [
                                T.StructField(
                                    "daily",
                                    T.StructType(
                                        [
                                            T.StructField(c, _DAILY_ENTRY)
                                            for c in CONTAMINANTS
                                        ]
                                    ),
                                )
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def flatten_air_quality(fetched: DataFrame) -> DataFrame:
    """P1+P2+P3+P4: parse JSON body, navigate the nested forecast tree,
    explode all contaminant series in ONE pass.

    A union of per-contaminant branches would re-execute the fetch stage
    once per contaminant; instead each payload row explodes an array of
    (contaminant, series) structs — single scan, single Python stage.
    """
    parsed = fetched.filter(F.col("status") == 200).select(
        F.from_json("body", PAYLOAD_SCHEMA).alias("p")
    ).filter(F.col("p.status") == "ok")
    city = F.col("p.data.city.name")
    country = F.concat(  # python str.capitalize parity (SURVEY §2.8 F1)
        F.upper(F.substring(city, 1, 1)), F.lower(F.expr("substring(p.data.city.name, 2)"))
    )
    series_array = F.array(
        *[
            F.struct(
                F.lit(c).alias("contaminant"),
                F.col(f"p.data.forecast.daily.{c}").alias("series"),
            )
            for c in CONTAMINANTS
        ]
    )
    return (
        parsed.select(country.alias("country"), F.explode(series_array).alias("cs"))
        .filter(F.col("cs.series").isNotNull())  # P2: city may miss a contaminant
        .select("country", F.col("cs.contaminant").alias("contaminant"), F.explode("cs.series").alias("e"))
        .select(
            "country",
            "contaminant",
            F.col("e.day").alias("day"),
            F.col("e.avg").alias("daily_avg"),
            F.col("e.max").alias("daily_max"),
            F.col("e.min").alias("daily_min"),
        )
    )


def _long_values_sql() -> str:
    rows = []
    for city in CITIES:
        payload = fake_payload(city)
        country = city.capitalize()
        for c in CONTAMINANTS:
            for e in payload["data"]["forecast"]["daily"][c]:
                rows.append(
                    f"('{country}', '{c}', '{e['day']}', {e['avg']}, {e['max']}, {e['min']})"
                )
    return (
        "(VALUES " + ", ".join(rows) + ") AS t(country, contaminant, day, daily_avg, daily_max, daily_min)"
    )


@register(
    "airquality_flatten",
    oracle=f"SELECT * FROM {_long_values_sql()}",
    tags=("pipeline", "rest", "json"),
    doc="S1+P1-P4: fetch (fake feed) → nested JSON flatten → long daily table.",
)
def airquality_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    fetched = fetch_urls(air_quality_urls(spark), fetcher=fake_fetcher)
    return flatten_air_quality(fetched)


@register(
    "airquality_wide",
    oracle=f"""
SELECT day, country,
       {", ".join(
           f"MAX(CASE WHEN contaminant = '{c}' THEN daily_avg END) AS {c}_daily_avg, "
           f"MAX(CASE WHEN contaminant = '{c}' THEN daily_max END) AS {c}_daily_max, "
           f"MAX(CASE WHEN contaminant = '{c}' THEN daily_min END) AS {c}_daily_min"
           for c in CONTAMINANTS
       )}
FROM {_long_values_sql()}
GROUP BY day, country
""",
    tags=("pipeline", "pivot"),
    doc="A6 parity: wide per-contaminant daily table with the reference's column naming.",
)
def airquality_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    long = flatten_air_quality(fetch_urls(air_quality_urls(spark), fetcher=fake_fetcher))
    aggs = []
    for c in CONTAMINANTS:
        for stat in ("avg", "max", "min"):
            aggs.append(
                F.max(
                    F.when(F.col("contaminant") == c, F.col(f"daily_{stat}"))
                ).alias(f"{c}_daily_{stat}")
            )
    return long.groupBy("day", "country").agg(*aggs)


@register(
    "airquality_report_stats",
    oracle=f"""
SELECT contaminant,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(daily_avg AS DECIMAL(38,6))) AS DOUBLE) / COUNT(daily_avg) AS DOUBLE) AS mean_avg,
       MIN(daily_min) AS min_min,
       MAX(daily_max) AS max_max
FROM {_long_values_sql()}
GROUP BY contaminant
""",
    tags=("pipeline", "summary"),
    doc="A1 parity: the email-report summary statistics per contaminant (my_data_pipeline.py:212).",
)
def airquality_report_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._helpers import davg

    long = flatten_air_quality(fetch_urls(air_quality_urls(spark), fetcher=fake_fetcher))
    return long.groupBy("contaminant").agg(
        F.count("*").alias("n"),
        davg("daily_avg").alias("mean_avg"),
        F.min("daily_min").alias("min_min"),
        F.max("daily_max").alias("max_max"),
    )
