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
    path: str | None = None,
) -> None:
    """``path`` makes the table EXTERNAL (data under ``path``): without
    Hive support the catalog entry is session-scoped in-memory, so a
    managed table's data would be unreachable from the next process —
    an external location plus re-registration (register_bucketed) is
    what makes a bucketed store durable across sessions."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sorted_by:
        writer = writer.sortBy(sorted_by)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    schema_ddl: str,
    key: str = "url_hash",
    n_buckets: int = 64,
    sorted_by: str | None = None,
) -> None:
    """Recreate the catalog entry for an external bucketed table written
    by a PREVIOUS session (in-memory catalog — entries die with the
    process; the parquet bucket files under ``path`` do not).  The
    CLUSTERED BY spec must match the writer's exactly or Spark would
    silently treat the files as unbucketed and re-shuffle every join."""
    sort = f" SORTED BY ({sorted_by} ASC)" if sorted_by else ""
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({key}){sort} INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


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
