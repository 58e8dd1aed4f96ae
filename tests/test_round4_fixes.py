"""Round-4 fixes: href quoting recall, backoff coverage for hosts
outside the robots dim, lineage clamp for legacy stores, crawl-loop
cache release, priority inheritance in discovery, and bucketed-store
cross-session durability."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dart_xbrl_crawler_spark.operators import politeness as P

RUN_TS = "2026-01-16 00:00:00"


# ------------------------------------------------ href quoting recall
def test_extract_links_quote_styles(spark):
    """Single-quoted, unquoted, spaced and uppercase href attributes
    are all discovered; fragment-only and empty values are still
    dropped in every style."""
    from dart_xbrl_crawler_spark.functions.links import extract_links

    html = (
        b'<a href="/dq">1</a>'
        b"<a href='/sq'>2</a>"
        b"<a href=/uq>3</a>"
        b'<a HREF = "/spaced">4</a>'
        b"<a href='#frag'>5</a><a href=#f>6</a><a href=''>7</a>"
    )
    pages = spark.createDataFrame(
        pd.DataFrame({"url": ["https://q.example/"], "html": [html]}),
        schema="url string, html binary",
    )
    got = {r["link"] for r in extract_links(pages).collect()}
    assert got == {
        "https://q.example/dq",
        "https://q.example/sq",
        "https://q.example/uq",
        "https://q.example/spaced",
    }


# ------------------------------- backoff covers hosts outside robots
def test_backoff_applies_to_hosts_missing_from_robots(spark):
    """A host absent from the robots dim (newly discovered → default
    delay) that fails every fetch must still get backed off — the dim
    gains a row with the default delay scaled by its fail rate."""
    robots = spark.createDataFrame(
        [("known.example", None, 100)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    stats = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["known.example", "rogue.example"],
                "fail_rate": [0.0, 1.0],
            }
        )
    )
    out = {
        r["host"]: r["crawl_delay_ms"]
        for r in P.apply_backoff(robots, stats, factor=4.0).collect()
    }
    assert out["known.example"] == 100  # clean host: delay unchanged
    # rogue host appears with default delay × (1 + 4·1.0) = 5×
    assert out["rogue.example"] == P.DEFAULT_CRAWL_DELAY_MS * 5
    # and the dim still drops into pop_round unchanged
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon

    frontier = with_url_canon(
        spark.createDataFrame(
            pd.DataFrame({"url": [f"https://rogue.example/p{i}" for i in range(8)]})
        )
    ).select(
        "*",
        F.lit(0.0).alias("priority"),
        F.to_timestamp(F.lit(RUN_TS)).alias("discovered_ts"),
    )
    popped = P.pop_round(
        frontier, P.apply_backoff(robots, stats, factor=4.0), round_ms=20_000
    )
    # budget 20000 / 5000 = 4 of 8 — the backoff actually bites
    assert popped.filter(F.col("selected")).count() == 4


# ------------------------------------- lineage clamp for legacy store
def test_lineage_counts_legacy_store_never_negative(spark, tmp_path):
    """A store whose metrics chain has transitions but no insert rows
    (bootstrapped before insert metrics existed) reports queued from
    the exact state scan, not a negative number — so run_crawl's drain
    check still works."""
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    store = FrontierStore(str(tmp_path / "legacy"), n_bloom_shards=4)
    seeds = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"https://l.example/p{i}" for i in range(6)],
                "priority": [0.0] * 6,
            }
        )
    )
    store.bootstrap(seeds, RUN_TS)
    # simulate the legacy chain: drop the bootstrap 'queued' rows,
    # keep only a transition commit
    store.metrics._publish([])
    store.metrics.commit(
        spark.createDataFrame(
            [(0, 0, "fetched", 2)],
            schema="round_id int, partition_id int, state string, n long",
        ),
        note="legacy transition",
    )
    counts = store.lineage_counts(spark)
    assert counts["queued"] >= 0
    # falls back to the exact scan: all 6 rows are still queued in the
    # table (no delta was committed)
    assert counts["queued"] == 6


# ----------------------------------------- run_crawl releases caches
def test_run_crawl_releases_fetch_cache(spark, tmp_path):
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://r.example/a"],
                "html": [b"<html>end</html>"],
                "warc_ts": [pd.Timestamp("2026-01-01")],
            }
        ),
        schema="url string, html binary, warc_ts timestamp",
    )
    robots = spark.createDataFrame(
        [("r.example", None, 100)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    store = FrontierStore(str(tmp_path / "rel"), n_bloom_shards=4)
    store.bootstrap(
        spark.createDataFrame(
            pd.DataFrame({"url": ["https://r.example/a"], "priority": [0.0]})
        ),
        RUN_TS,
    )
    store.run_crawl(spark, pages, robots, RUN_TS, max_rounds=3)
    assert store._prev_fetched is None  # last round's cache released


# ------------------------------------- priority inheritance (decay)
def test_discovery_priority_inheritance(spark, tmp_path):
    """Two seeds on one host, priorities 10 (hot) and 0 (cold); each
    links to a child.  With budget 1/round after the seed round, the
    hot seed's child must pop BEFORE the cold seed's child — inherited
    priority (10−decay=9 > 0−decay=−1) orders the frontier, where flat
    0.0 priorities would fall back to insertion/hash order."""
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    def page(name, link_to=None):
        body = (
            f'<html><a href="/{link_to}">n</a></html>' if link_to else "<html>e</html>"
        )
        return (f"https://p.example/{name}", body.encode(), pd.Timestamp("2026-01-01"))

    pages = spark.createDataFrame(
        pd.DataFrame(
            [page("hot", "hot-child"), page("cold", "cold-child"),
             page("hot-child"), page("cold-child")],
            columns=["url", "html", "warc_ts"],
        ),
        schema="url string, html binary, warc_ts timestamp",
    )
    robots = spark.createDataFrame(
        [("p.example", None, 1000)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    store = FrontierStore(str(tmp_path / "prio"), n_bloom_shards=4)
    store.bootstrap(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": [
                        "https://p.example/hot",
                        "https://p.example/cold",
                    ],
                    "priority": [10.0, 0.0],
                }
            )
        ),
        RUN_TS,
    )
    # one crawl round, budget 2000/1000 = 2: both seeds fetched, both
    # children discovered and inserted with inherited priorities
    summaries = store.run_crawl(
        spark, pages, robots, RUN_TS, max_rounds=1, round_ms=2000
    )
    assert summaries[0]["fetched"] == 2
    assert summaries[0]["discovered_new"] == 2
    q = store.table.read(spark).filter(F.col("state") == "queued")
    prios = {r["url_canon"]: r["priority"] for r in q.collect()}
    assert prios["https://p.example/hot-child"] == 9.0
    assert prios["https://p.example/cold-child"] == -1.0
    # budget-1 pop takes the hot child first
    popped = P.pop_round(
        q, robots, round_ms=1000  # 1000/1000 → budget 1
    )
    sel = [r["url_canon"] for r in popped.filter(F.col("selected")).collect()]
    assert sel == ["https://p.example/hot-child"]


# ------------------------- bucketed store cross-session durability
def test_bucketed_base_survives_catalog_loss(spark, tmp_path):
    """Without Hive support the catalog is in-memory per session: a new
    process sees BASES.json but no table entry.  The base is external
    (data under the store path) and read() re-registers it from the
    manifest — simulate the new session by dropping the catalog entry
    and prove read() still reconstructs, WITHOUT re-shuffling the base."""
    from dart_xbrl_crawler_spark.sources.checkpoint import BucketedMergeTable

    t = BucketedMergeTable(
        str(tmp_path / "bm"), table_prefix="t_r4_durable", key="k", n_buckets=8
    )
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    tbl = t.commit_base(base, note="b0")
    t.commit_delta(
        spark,
        spark.range(5).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
        ),
        note="d0",
    )
    before = {r["k"]: r["v"] for r in t.read(spark).collect()}
    # simulate a fresh session: the in-memory catalog entry is gone
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    t2 = BucketedMergeTable(
        str(tmp_path / "bm"), table_prefix="t_r4_durable", key="k", n_buckets=8
    )
    after = {r["k"]: r["v"] for r in t2.read(spark).collect()}
    assert after == before
    assert after[3] == -1 and after[50] == 100
    # the re-registered base still carries its bucket spec: under a
    # forced shuffle join (the 10^10-row strategy) the base scan keeps
    # its bucket layout — every Exchange belongs to the delta subtree
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = t2.read(spark)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "Bucketed: true" in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_bucketed_compact_removes_superseded_base_dirs(spark, tmp_path):
    import os

    from dart_xbrl_crawler_spark.sources.checkpoint import BucketedMergeTable

    t = BucketedMergeTable(
        str(tmp_path / "bc"), table_prefix="t_r4_compact", key="k", n_buckets=4
    )
    t.commit_base(
        spark.range(50).select(F.col("id").alias("k"), F.lit(1).alias("v")),
        note="b0",
    )
    old_loc = t._bases()[-1]["location"]
    t.commit_delta(
        spark,
        spark.range(3).select(F.col("id").alias("k"), F.lit(2).alias("v")),
        note="d",
    )
    t.compact(spark)
    assert len(t._bases()) == 1
    assert not os.path.exists(old_loc)  # superseded base data deleted
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got[0] == 2 and got[10] == 1 and len(got) == 50
