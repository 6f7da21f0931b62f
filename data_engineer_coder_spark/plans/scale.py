"""Physical-layout utilities for 100 TB plans (SURVEY.md §4.2).

These are the knobs the engine turns when Catalyst's defaults aren't
enough at scale:

- **bucketing**: pre-shuffle both sides of a recurring join on the join
  key at write time → the join plan has no Exchange at read time.
- **salting**: explode a hot key into `salt` sub-keys so one skewed key
  spreads over `salt` tasks (AQE's skew-join split handles sort-merge
  skew automatically; salting is for aggregate skew and for engines
  where AQE can't kick in, e.g. streaming state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, name: str, bucket_cols: list[str], n_buckets: int) -> None:
    """Persist ``df`` as a bucketed managed table (co-located join layout).

    Readers joining two tables bucketed identically on the join key get
    a shuffle-free sort-merge join — the Exchange disappears from the
    plan (asserted in tests/test_scale.py).

    Idempotent: drops a stale table AND its leftover warehouse directory
    (a fresh session's in-memory catalog forgets the table, but the
    managed location survives and blocks re-creation).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    import shutil
    from urllib.parse import urlparse

    loc = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{loc.rstrip('/')}/{name.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )


def salted_groupby_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed keys: count per (key, salt) —
    spreading a hot key across ``salt`` tasks — then sum per key.
    Output is identical to ``df.groupBy(key).count()``.
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def salted_join_small_skew(
    fact: DataFrame, dim: DataFrame, key: str, salt: int = 8
) -> DataFrame:
    """Skew-join pattern: replicate the (small) dim ``salt`` times with a
    salt column; give each fact row a random-but-deterministic salt; join
    on (key, salt).  One hot fact key now lands on ``salt`` tasks.
    Equivalent to ``fact.join(dim, key)`` for row content.
    """
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(salt)).cast("int")
    )
    return fact_salted.join(dim_rep, on=[key, "_salt"]).drop("_salt")
