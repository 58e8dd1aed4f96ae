"""Bucketed co-located join: the plan must contain NO Exchange —
the shuffle is paid once at write time (the 100 TB frontier⋈seen
pattern)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dart_xbrl_crawler_spark.sources.bucketed import cobucketed_join, write_bucketed


def test_cobucketed_join_has_no_exchange(spark):
    a = spark.range(10_000).select(
        F.col("id").alias("url_hash"), (F.col("id") % 7).alias("state_a")
    )
    b = spark.range(5_000).select(
        F.col("id").alias("url_hash"), (F.col("id") % 3).alias("state_b")
    )
    write_bucketed(a, "t_frontier_b", "url_hash", 8, sorted_by="url_hash")
    write_bucketed(b, "t_seen_b", "url_hash", 8, sorted_by="url_hash")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "t_frontier_b", "t_seen_b")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 5_000
        # anti-join (URL-seen) over the same layout: also shuffle-free
        anti = spark.table("t_frontier_b").join(
            spark.table("t_seen_b"), "url_hash", "left_anti"
        )
        plan2 = anti._sc._jvm.PythonSQLUtils.explainString(
            anti._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan2, plan2
        assert anti.count() == 5_000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_frontier_b")
        spark.sql("DROP TABLE IF EXISTS t_seen_b")
