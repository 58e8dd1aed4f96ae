"""Bucketed tables: shuffle-free co-located joins on ``url_hash``.

At the 10^10-URL design point the frontier, the seen-set and the
per-round fetch logs all join on ``url_hash`` every round.  Writing
them bucketed by the join key means those joins never shuffle — the
bucket layout IS the exchange, paid once at write time.  (With Iceberg
this becomes a bucket(N, url_hash) partition transform + storage-
partitioned join; same idea, same key.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url_hash",
    n_buckets: int = 64,
    sorted_by: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sorted_by:
        writer = writer.sortBy(sorted_by)
    writer.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str = "url_hash",
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count — Catalyst plans this without an Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
