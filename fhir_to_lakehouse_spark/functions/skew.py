"""Skew-mitigation primitives: salting for hot keys, plus bucketed
table helpers for shuffle-free co-located joins.

At 100 TB the two shuffle killers are (a) a handful of hot keys that
serialize one reducer and (b) re-shuffling the same fact table for
every join. (a) is solved by salting (explode the small side over a
salt domain, scatter the big side) — AQE's skew-join handles moderate
skew automatically, salting handles the pathological tail; (b) by
bucketed tables (bucketBy on the join key at write time -> SortMergeJoin
without Exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``.

    The big side gets a deterministic per-row salt (hash of all
    columns, stable across retries — rand() would break task retry
    idempotency); the small side is exploded ×salt_buckets so every
    (key, salt) pair finds its match. Hot keys now spread over
    salt_buckets reducers instead of one.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports inner/left only: the exploded small "
            "side would duplicate right/full-outer unmatched rows"
        )
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets)).cast("int")
    )
    small_exploded = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = big_salted.join(small_exploded, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist as a bucketed managed table: later equi-joins/aggs on
    ``bucket_key`` between tables bucketed the same way run without an
    Exchange (check .explain: no shuffle before SortMergeJoin)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # an in-memory catalog forgets tables across sessions while the
    # warehouse dir persists; clear any orphaned location
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, table_name.lower()), ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)
