"""Physical-plan assertions: the optimizations we claim must be visible
in `explain()` output — pushed filters, broadcast joins, no global
single-partition windows in the politeness path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q01_filter_pushed_to_scan(spark):
    plan = _plan(E.queries()["q01_pricing_summary"](spark, SF))
    assert "PushedFilters" in plan
    # the shipdate predicate must reach the parquet scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_q01_column_pruning(spark):
    plan = _plan(E.queries()["q01_pricing_summary"](spark, SF))
    # ReadSchema must NOT include unused wide columns
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema  # not even in this dataset, but
    assert "l_partkey" not in read_schema  # present in data, unused in q01


def test_q02_broadcast_joins(spark):
    plan = _plan(E.queries()["q02_dim_join_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims are broadcast


def test_semi_anti_join_strategies(spark):
    plan3 = _plan(E.queries()["q03_semi_join_segments"](spark, SF))
    plan4 = _plan(E.queries()["q04_anti_join_idle_customers"](spark, SF))
    assert "LeftSemi" in plan3
    assert "LeftAnti" in plan4


def test_politeness_has_no_unpartitioned_window(spark, fixture_bundle):
    """A Window with an empty partition spec serializes the whole input
    into one task — the politeness plan must never contain one."""
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon
    from dart_xbrl_crawler_spark.operators import politeness as P
    from dart_xbrl_crawler_spark.schemas import PAGES, ROBOTS

    pages, _, _, robots = fixture_bundle
    frontier = (
        with_url_canon(spark.createDataFrame(pages, schema=PAGES).select("url"))
        .withColumn("priority", F.lit(0.0))
        .withColumn("discovered_ts", F.to_timestamp(F.lit("2026-01-16")))
    )
    robots_df = spark.createDataFrame(robots, schema=ROBOTS)
    plan = _plan(P.pop_round(frontier, robots_df, round_ms=10_000))
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" in line:
            pytest.fail(f"unexpected window spec line: {line}")
    # windows must partition by host (+ salt)
    assert "host" in plan


def test_scheduler_no_global_rownumber_window(spark, fixture_bundle):
    """visit_rank assignment must not serialize the seed list: no
    unpartitioned row_number() window anywhere in the scheduler plan.
    (The two-level cumsum's one unpartitioned SUM window runs over
    per-bucket aggregate rows — ≤ |corps|/2^14 — and is allowed.)"""
    from dart_xbrl_crawler_spark.operators.scheduler import reference_schedule
    from dart_xbrl_crawler_spark.schemas import SEEDS

    _, seeds, _, _ = fixture_bundle
    sched = reference_schedule(spark.createDataFrame(seeds, schema=SEEDS))
    logical = sched._jdf.queryExecution().optimizedPlan().toString()
    for line in logical.splitlines():
        s = line.strip().lstrip("+-: ")
        if s.startswith("Window ") and "row_number()" in s and ", [], [" not in s:
            continue  # partitioned row_number — fine
        if s.startswith("Window ") and "row_number()" in s:
            pytest.fail(f"global row_number window in scheduler plan: {s}")


def test_extract_projects_only_kernel_columns(spark, fixture_bundle):
    """The Arrow channel into the extract UDF must carry only
    (url, html, report_nm, rcept_dt) — never text/lang/warc_ts."""
    from dart_xbrl_crawler_spark.operators import extract as X
    from dart_xbrl_crawler_spark.plans import pipeline
    from dart_xbrl_crawler_spark.schemas import PAGES, SEEDS

    pages, seeds, *_ = fixture_bundle
    meta = pipeline.pages_with_meta(
        spark.createDataFrame(pages, schema=PAGES),
        spark.createDataFrame(seeds, schema=SEEDS),
    )
    df = X.extract_facts(meta, "2026-01-16 00:00:00")
    plan = _plan(df)
    assert "MapInPandas" in plan
    # lang and the golden text column are never used by the kernel —
    # column pruning must eliminate them from the whole plan
    assert "lang" not in plan
    assert "warc_ts" not in plan


def test_contamination_scan_is_broadcast_mapside(spark):
    """q62's benchmark side is explicitly broadcast: the corpus 13-gram
    stream must join it without a shuffle on the big side (contamination
    at scale is a scan, not a shuffle)."""
    plan = _plan(E.queries()["q62_contamination_13gram"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_line_dedup_shuffles_hash_not_text(spark):
    """q61's occurrence count groups by md5(line): the partial
    aggregate's grouping key must be the 32-byte hash, never the raw
    line text (narrow-shuffle contract, same as the URL-seen path)."""
    plan = _plan(E.queries()["q61_line_dedup"](spark, SF))
    assert "CartesianProduct" not in plan
    # the count-side exchange partitions on the md5 key column
    assert "lh" in plan and "hashpartitioning(lh" in plan


def test_redirect_walk_no_cartesian_no_global_window(spark):
    """q64: 8 bounded hops = equality joins only; the final ranking is
    the oracle's concern (the Spark side never materializes the walk
    table, so no window at all)."""
    plan = _plan(E.queries()["q64_redirect_resolve"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_recrawl_interval_window_is_url_partitioned(spark):
    """q63's LAG window must be partitioned by url_id — a global
    single-partition window would serialize the 10^10-url history."""
    plan = _plan(E.queries()["q63_recrawl_interval"](spark, SF))
    assert "Window" in plan
    assert "partitionBy=[url_id" in plan.replace(" ", "") or "url_id" in plan


def test_trap_gate_is_mapside_no_shuffle(spark):
    """q69: every trap feature is one Catalyst expression over the url —
    the whole query must be scan→project→sort with no exchange besides
    the final orderBy's range partitioning, no window, no join, and no
    python worker."""
    plan = _plan(E.queries()["q69_crawl_traps"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_mirror_pairs_equality_join_only(spark):
    """q70: the pair generator must be an equality join on the content
    signature (SortMerge or Hash), never a cartesian product; the
    frequent-sig guard aggregates before the join."""
    plan = _plan(E.queries()["q70_mirror_hosts"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_quality_single_aggregate(spark):
    """q71: one groupBy — partial (map-side) + final aggregate, no join,
    no window, no python."""
    plan = _plan(E.queries()["q71_host_quality"](spark, SF))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_sitemap_and_asset_queries_mapside(spark):
    """q73/q74: block-walk extraction and the asset flag are map-only —
    no join, no window, no python worker in either plan."""
    for name in ("q73_sitemap_lastmod", "q74_asset_filter"):
        plan = _plan(E.queries()[name](spark, SF))
        assert "Join" not in plan, name
        assert "Window" not in plan, name
        assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, name


def test_head_extractors_and_ngram_langid_mapside(spark):
    """q80/q81/q82: head-element extraction and trigram lang-ID are
    map-only — no join, no window, no python worker."""
    for name in ("q80_canonical_link", "q81_feed_autodiscovery",
                 "q82_lang_id_ngram"):
        plan = _plan(E.queries()[name](spark, SF))
        assert "Join" not in plan, name
        assert "Window" not in plan, name
        assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, name
