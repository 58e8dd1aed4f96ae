"""Round-3 fixes: crawl-delay clamping, RFC 9309 wildcard rules,
adaptive broadcasts (dedup confirmed-set + politeness host counts),
delta-derived lineage metrics, snapshot retention + orphan GC, and
round-cache release."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dart_xbrl_crawler_spark.operators import dedup as D
from dart_xbrl_crawler_spark.operators import politeness as P

RUN_TS = "2026-01-16 00:00:00"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------- crawl-delay clamp
def test_parse_robots_crawl_delay_zero_clamped():
    rules, delay = P.parse_robots_txt(
        "User-agent: *\nDisallow: /x\nCrawl-delay: 0\n"
    )
    assert delay == 1  # 0 → 1 ms floor, never a zero divisor
    _, neg = P.parse_robots_txt("User-agent: *\nCrawl-delay: -3\n")
    assert neg == 1
    _, frac = P.parse_robots_txt("User-agent: *\nCrawl-delay: 0.0004\n")
    assert frac == 1


def test_pop_round_crawl_delay_zero_does_not_starve(spark):
    """A dim row carrying crawl_delay_ms=0 (built outside the parser)
    must neither crash the budget division nor silently drop the host."""
    frontier = spark.range(20).select(
        F.concat(F.lit("https://zero.example/p"), F.col("id").cast("string")).alias("url"),
        F.lit(0.0).alias("priority"),
        F.to_timestamp(F.lit(RUN_TS)).alias("discovered_ts"),
    )
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon

    robots = spark.createDataFrame(
        [("zero.example", None, 0)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    popped = P.pop_round(with_url_canon(frontier), robots, round_ms=1000)
    rows = popped.collect()
    assert len(rows) == 20
    assert all(r["selected"] for r in rows)  # 1000ms/1ms ≥ 20 slots


# ------------------------------------------------- RFC 9309 wildcards
def test_rule_to_match_translation():
    assert P._rule_to_match("/plain") == ("/plain", None)
    prefix, rx = P._rule_to_match("/*.pdf$")
    assert prefix == "/" and rx == "^/.*\\.pdf$"
    prefix2, rx2 = P._rule_to_match("/a/*/b")
    assert prefix2 == "/a/" and rx2 == "^/a/.*/b"
    # '$' not at the end is a literal
    assert P._rule_to_match("/a$b") == ("/a$b", None) or P._rule_to_match(
        "/a$b"
    )[1] is None


def test_wildcard_rules_evaluation(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /private*/data\n"
        "Allow: /private-open/data\n"
    )
    rules_dim = P.robots_rules_from_txt(
        spark, spark.createDataFrame(pd.DataFrame({"host": ["w.example"], "robots_txt": [txt]}))
    )
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon

    cases = {
        "https://w.example/doc.pdf": True,       # *.pdf$ matches
        "https://w.example/doc.pdfx": False,     # $ anchors the end
        "https://w.example/a/doc.pdf": True,     # * spans directories
        "https://w.example/private1/data": True,
        "https://w.example/private-open/data": False,  # longer Allow wins
        "https://w.example/open/doc.txt": False,
    }
    frontier = with_url_canon(
        spark.createDataFrame(pd.DataFrame({"url": list(cases)}))
    )
    got = {
        r["url"]: r["robots_blocked"]
        for r in P.apply_robots(frontier, rules_dim).collect()
    }
    assert got == cases


def test_legacy_two_field_rules_still_work(spark):
    """Plain (prefix, allow) structs (q44's shape) are normalized and
    evaluate exactly as before."""
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon

    rules = spark.createDataFrame(
        [("l.example", [("/p1", False), ("/p1/ok", True)], None)],
        schema=P.ROBOTS_RULES_SCHEMA,
    )
    frontier = with_url_canon(
        spark.createDataFrame(
            pd.DataFrame(
                {"url": ["https://l.example/p1/x", "https://l.example/p1/ok/y"]}
            )
        )
    )
    got = {
        r["url"]: r["robots_blocked"]
        for r in P.apply_robots(frontier, rules).collect()
    }
    assert got == {
        "https://l.example/p1/x": True,
        "https://l.example/p1/ok/y": False,
    }


# --------------------------------------- adaptive broadcast: host dim
def test_pop_round_many_hosts_no_forced_broadcast(spark):
    """With host cardinality above the gate, the counts join must not
    be a forced broadcast (a 10^8-host dim would OOM the driver)."""
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon

    frontier = with_url_canon(
        spark.range(2000).select(
            F.concat(
                F.lit("https://h"),
                F.col("id").cast("string"),
                F.lit(".example/p"),
            ).alias("url")
        )
    ).withColumn("priority", F.lit(0.0)).withColumn(
        "discovered_ts", F.to_timestamp(F.lit(RUN_TS))
    )
    robots = spark.createDataFrame(
        [("none.example", None, 1000)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    small_gate = P.pop_round(frontier, robots, round_ms=60_000)
    gated_off = P.pop_round(
        frontier, robots, round_ms=60_000, broadcast_hosts_max=10
    )
    # same results either way
    a = {r["url_hash"]: r["selected"] for r in small_gate.collect()}
    b = {r["url_hash"]: r["selected"] for r in gated_off.collect()}
    assert a == b
    # the gated-off plan must use strictly fewer broadcast joins (the
    # counts join fell back to a shuffle join)
    assert _plan(small_gate).count("BroadcastHashJoin") > _plan(
        gated_off
    ).count("BroadcastHashJoin")


# ------------------------------- adaptive broadcast: dedup confirmed
def test_dedup_no_hint_large_overlap_no_forced_broadcast(spark):
    """Without a caller bound and with overlap above broadcast_max_rows,
    dedup must fall back to a non-broadcast anti-join — and stay exact."""
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon

    canon = with_url_canon(
        spark.range(4000).select(
            F.concat(F.lit("https://d.example/"), F.col("id").cast("string")).alias(
                "url"
            ),
            "id",
        )
    )
    seen = canon.filter(F.col("id") % 2 == 0).select("url_hash")
    bloom = D.build_seen_filter(seen, n_shards=8)
    out = D.dedup_urls(
        canon.drop("id"), seen, bloom, n_shards=8, broadcast_max_rows=100
    )
    assert out.count() == 2000  # exact: odd ids survive
    assert "BroadcastHashJoin" not in _plan(out)
    # with a fitting hint the broadcast fast path is kept
    out2 = D.dedup_urls(
        canon.drop("id"), seen, bloom, n_shards=8, max_confirmed_hint=4000
    )
    assert out2.count() == 2000
    assert "BroadcastHashJoin" in _plan(out2)


# ------------------------------------- lineage metrics from deltas
def test_lineage_counts_match_exact_state_counts(spark, fixture_bundle, tmp_path):
    from dart_xbrl_crawler_spark import fixtures
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore
    from dart_xbrl_crawler_spark.operators.scheduler import seeds_to_frontier
    from dart_xbrl_crawler_spark.schemas import PAGES, ROBOTS, SEEDS

    pages, seeds, _, robots = fixture_bundle
    store = FrontierStore(str(tmp_path / "f"), n_bloom_shards=8)
    seeds_df = spark.createDataFrame(seeds, schema=SEEDS)
    store.bootstrap(seeds_to_frontier(seeds_df), fixtures.RUN_TS)
    pages_df = spark.createDataFrame(pages, schema=PAGES)
    robots_df = spark.createDataFrame(robots, schema=ROBOTS)
    # duplicate insert contributes a 'deduped' lineage counter
    _, n_ins, n_dup = store.insert(
        spark, seeds_to_frontier(seeds_df).select("url", "priority"), fixtures.RUN_TS
    )
    for rid in range(2):
        store.run_round(
            spark, pages_df, robots_df, fixtures.RUN_TS, round_id=rid,
            round_ms=120_000,
        )
    lineage = store.lineage_counts(spark)
    exact = store.state_counts(spark)
    deduped = lineage.pop("deduped", 0)
    assert deduped == n_dup
    assert lineage == {k: v for k, v in exact.items() if v}


def test_run_round_releases_previous_fetch_cache(spark, fixture_bundle, tmp_path):
    from dart_xbrl_crawler_spark import fixtures
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore
    from dart_xbrl_crawler_spark.operators.scheduler import seeds_to_frontier
    from dart_xbrl_crawler_spark.schemas import PAGES, ROBOTS, SEEDS

    pages, seeds, _, robots = fixture_bundle
    store = FrontierStore(str(tmp_path / "f2"), n_bloom_shards=8)
    store.bootstrap(
        seeds_to_frontier(spark.createDataFrame(seeds, schema=SEEDS)),
        fixtures.RUN_TS,
    )
    pages_df = spark.createDataFrame(pages, schema=PAGES)
    robots_df = spark.createDataFrame(robots, schema=ROBOTS)
    store.run_round(spark, pages_df, robots_df, fixtures.RUN_TS, round_id=0)
    first = store._prev_fetched
    assert first is not None and first.storageLevel.useMemory
    store.run_round(spark, pages_df, robots_df, fixtures.RUN_TS, round_id=1)
    # the first round's cache is gone; the second round's is live
    assert not first.storageLevel.useMemory
    assert store._prev_fetched is not first


# --------------------------------------- retention / expiry / orphan GC
def test_merge_table_expiry_bounds_disk_and_resume(spark, tmp_path):
    from dart_xbrl_crawler_spark.sources.checkpoint import MergeTable

    path = str(tmp_path / "m")
    mt = MergeTable(path, key="k", compact_every=3, expire_keep_last=4)
    mt.commit_base(
        spark.createDataFrame([(i, "a") for i in range(50)], "k long, v string")
    )
    for j in range(12):  # several auto-compactions with retention
        mt.commit_delta(
            spark,
            spark.createDataFrame([(j % 50, f"v{j}")], "k long, v string"),
            note=f"d{j}",
        )
    snaps = mt.snapshots()
    assert len(snaps) <= 4 + 1  # bounded manifest
    on_disk = [d for d in os.listdir(path) if d.startswith("snap-")]
    assert sorted(on_disk) == sorted(s["id"] for s in snaps)  # no orphans
    # seqs stay strictly monotonic across expiry
    seqs = [s["seq"] for s in snaps]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    # resume (fresh handle) reproduces last-wins state
    mt2 = MergeTable(path, key="k")
    rows = {r["k"]: r["v"] for r in mt2.read(spark).collect()}
    assert len(rows) == 50
    for j in range(12):
        assert rows[j % 50] != "a" or (j % 50) > 11
    # a new commit after expiry gets a fresh, higher seq
    mt2.commit_delta(
        spark, spark.createDataFrame([(0, "zz")], "k long, v string")
    )
    assert mt2.snapshots()[-1]["seq"] > seqs[-1]
    assert {r["v"] for r in mt2.read(spark).filter(F.col("k") == 0).collect()} == {
        "zz"
    }


def test_expire_never_drops_reachable_state(spark, tmp_path):
    """expire_snapshots keeps the latest base + every delta after it even
    when keep_last is smaller."""
    from dart_xbrl_crawler_spark.sources.checkpoint import MergeTable

    mt = MergeTable(str(tmp_path / "m2"), key="k", compact_every=100)
    mt.commit_base(spark.createDataFrame([(1, "a")], "k long, v string"))
    for j in range(5):
        mt.commit_delta(
            spark, spark.createDataFrame([(1, f"v{j}")], "k long, v string")
        )
    mt.expire_snapshots(keep_last=1)
    # base + 5 deltas all survive (they reconstruct current state)
    assert len(mt.snapshots()) == 6
    assert mt.read(spark).collect()[0]["v"] == "v4"


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
