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


# ------------------------------------------- date-window targeting
def test_date_window_arithmetic():
    from dart_xbrl_crawler_spark.operators.scheduler import date_window

    # explicit bgn/end wins when both given
    assert date_window("2026-01-16", 6, "20250101", "20250630") == (
        "20250101",
        "20250630",
    )
    # months_back*30 days from the injected run_ts (reference arithmetic)
    assert date_window("2026-01-16 00:00:00", 2) == ("20251117", "20260116")
    assert date_window("2026-01-16", None) is None


def test_date_window_ordering_matches_reference_model(spark, fixture_bundle):
    from dart_xbrl_crawler_spark import fixtures, oracle
    from dart_xbrl_crawler_spark.operators import scheduler as SCH
    from dart_xbrl_crawler_spark.schemas import SEEDS

    _, seeds, _, _ = fixture_bundle
    win = SCH.date_window(fixtures.RUN_TS, months_back=2)
    sched = SCH.reference_schedule(
        spark.createDataFrame(seeds, schema=SEEDS), window=win
    )
    got = [r["rcept_no"] for r in sched.orderBy("visit_rank").collect()]
    want = oracle.sequential_schedule(seeds.to_dict("records"), window=win)
    assert got == want
    # the window genuinely excludes seeds (fixture spans 2025-03..12)
    full = oracle.sequential_schedule(seeds.to_dict("records"))
    assert 0 < len(got) < len(full)
    assert all(r in full for r in got)


# ---------------------------------------------- XBRL-XML parser seam
_XBRL_XML = """<?xml version="1.0" encoding="utf-8"?>
<xbrl xmlns="http://www.xbrl.org/2003/instance"
      xmlns:ifrs-full="http://xbrl.ifrs.org/taxonomy/2021-03-24/ifrs-full">
  <context id="CI"><entity><identifier scheme="s">00000042</identifier></entity>
    <period><instant>2025-06-30</instant></period></context>
  <context id="CIS"><period><instant>2025-06-30</instant></period>
    <scenario><explicitMember dimension="d">SeparateMember</explicitMember></scenario></context>
  <context id="CD"><period><startDate>2025-04-01</startDate><endDate>2025-06-30</endDate></period></context>
  <context id="COLD"><period><instant>2024-06-30</instant></period></context>
  <ifrs-full:Assets contextRef="CI" decimals="0">5000000</ifrs-full:Assets>
  <ifrs-full:Assets contextRef="CIS" decimals="0">4000000</ifrs-full:Assets>
  <ifrs-full:Assets contextRef="COLD" decimals="0">1</ifrs-full:Assets>
  <ifrs-full:Equity contextRef="CI" decimals="0">2500000</ifrs-full:Equity>
  <ifrs-full:Revenue contextRef="CD" decimals="0">777000</ifrs-full:Revenue>
</xbrl>"""


def _xml_zip() -> bytes:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        info = zipfile.ZipInfo(
            "entity00000042_2025-06-30.xbrl", date_time=(2026, 1, 1, 0, 0, 0)
        )
        zf.writestr(info, _XBRL_XML)
    return buf.getvalue()


def test_xbrl_xml_byte_identity_through_kernel(spark):
    """A real XBRL 2.1 instance ZIP flows through BOTH the oracle and
    the vectorized kernel via the doc_parsers seam — byte-identical
    extracted text, and the out-of-period 2024 column drops."""
    from dart_xbrl_crawler_spark import oracle
    from dart_xbrl_crawler_spark.operators import extract as X

    url = "https://dart.fss.or.kr/api/fnlttXbrl.xml?rcept_no=x1"
    html = _xml_zip()
    report_nm, rcept_dt = "반기보고서 (2025.06)", "20250615"
    golden = oracle.extract_text_rowwise(url, html, report_nm, rcept_dt, RUN_TS)
    assert golden  # non-empty facts TSV
    assert "5000000" in golden and "777000" in golden
    assert "\t1.0\t" not in golden  # 2024 instant filtered by period

    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "url": url,
                    "html": html,
                    "report_nm": report_nm,
                    "rcept_dt": rcept_dt,
                }
            ]
        ),
        schema="url string, html binary, report_nm string, rcept_dt string",
    )
    rows = X.extract_text(df, RUN_TS).collect()
    assert len(rows) == 1 and rows[0]["parse_ok"]
    assert rows[0]["text"] == golden


# ------------------------------------------------ bucketed MergeTable
def test_bucketed_merge_table_last_wins_and_no_base_shuffle(spark, tmp_path):
    from dart_xbrl_crawler_spark.sources.checkpoint import BucketedMergeTable

    prefix = "t" + str(abs(hash(str(tmp_path))) % 10**8)
    bt = BucketedMergeTable(
        str(tmp_path / "b"), table_prefix=prefix, key="k", n_buckets=8,
        compact_every=100,
    )
    base = spark.createDataFrame([(i, "a") for i in range(500)], "k long, v string")
    bt.commit_base(base, note="base")
    bt.commit_delta(
        spark, spark.createDataFrame([(i, "b") for i in range(50)], "k long, v string")
    )
    bt.commit_delta(
        spark,
        spark.createDataFrame([(0, "c"), (600, "new")], "k long, v string"),
    )
    merged = bt.read(spark)
    rows = {r["k"]: r["v"] for r in merged.collect()}
    assert len(rows) == 501
    assert rows[0] == "c" and rows[1] == "b" and rows[499] == "a" and rows[600] == "new"
    # plan shape under a forced shuffle join (disable broadcast so the
    # 10^10-row-scale strategy is the one planned): the base scan keeps
    # its bucket layout and is never re-shuffled — every Exchange in
    # the plan belongs to the small delta subtree (union of delta scans
    # → groupBy, → join-side distribution).
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = bt.read(spark)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "Bucketed: true" in plan
    base_scan = [
        ln for ln in plan.splitlines() if prefix in ln and "Scan parquet" in ln
    ]
    assert base_scan, plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 2, plan

    # compaction folds into a fresh bucketed base and drops old tables
    bt.compact(spark)
    assert len(bt.deltas.snapshots()) == 0
    rows2 = {r["k"]: r["v"] for r in bt.read(spark).collect()}
    assert rows2 == rows


def test_frontier_store_bucketed_storage_e2e(spark, fixture_bundle, tmp_path):
    """FrontierStore on bucketed storage reproduces the parquet-backed
    behavior across bootstrap + rounds."""
    from dart_xbrl_crawler_spark import fixtures
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore
    from dart_xbrl_crawler_spark.operators.scheduler import seeds_to_frontier
    from dart_xbrl_crawler_spark.schemas import PAGES, ROBOTS, SEEDS

    pages, seeds, _, robots = fixture_bundle
    seeds_df = spark.createDataFrame(seeds, schema=SEEDS)
    pages_df = spark.createDataFrame(pages, schema=PAGES)
    robots_df = spark.createDataFrame(robots, schema=ROBOTS)

    stores = {}
    for storage in ("parquet", "bucketed"):
        store = FrontierStore(
            str(tmp_path / storage), n_bloom_shards=8, storage=storage,
            n_buckets=8,
        )
        store.bootstrap(seeds_to_frontier(seeds_df), fixtures.RUN_TS)
        for rid in range(2):
            store.run_round(
                spark, pages_df, robots_df, fixtures.RUN_TS, round_id=rid,
                round_ms=120_000,
            )
        stores[storage] = store
    assert (
        stores["parquet"].state_counts(spark)
        == stores["bucketed"].state_counts(spark)
    )


# ----------------------------------------------------- wav PCM decode
def test_extract_audio_stats_real_pcm(spark):
    import io
    import math
    import wave

    import numpy as np

    from dart_xbrl_crawler_spark.operators import multimodal as MM

    def wav_bytes(freq, sr=8000, dur=0.25, amp=0.5):
        n = int(sr * dur)
        x = (amp * np.sin(2 * np.pi * freq * np.arange(n) / sr) * 32767).astype(
            "<i2"
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        return buf.getvalue()

    rows = pd.DataFrame(
        {
            "url": ["w1", "w2", "png1"],
            "html": [
                wav_bytes(440.0),
                wav_bytes(220.0, dur=0.5),
                b"\x89PNG\r\n\x1a\n" + b"\0" * 32,
            ],
        }
    )
    out = {
        r["url"]: r
        for r in MM.extract_audio_stats(
            spark.createDataFrame(rows, schema="url string, html binary")
        ).collect()
    }
    assert set(out) == {"w1", "w2"}  # png filtered JVM-side
    assert abs(out["w1"]["duration_s"] - 0.25) < 1e-9
    assert abs(out["w2"]["duration_s"] - 0.5) < 1e-9
    assert abs(out["w1"]["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert out["w1"]["sample_rate"] == 8000 and out["w1"]["n_channels"] == 1


def test_run_round_reads_table_exactly_once(spark, fixture_bundle, tmp_path, monkeypatch):
    """The only O(|frontier|) work in a round is the pop's own scan:
    run_round must call table.read exactly once (round 1 re-read the
    merged table for the changed-rows join AND the metrics; both now
    derive from the round's own cached frames)."""
    from dart_xbrl_crawler_spark import fixtures
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore
    from dart_xbrl_crawler_spark.operators.scheduler import seeds_to_frontier
    from dart_xbrl_crawler_spark.schemas import PAGES, ROBOTS, SEEDS
    from dart_xbrl_crawler_spark.sources.checkpoint import MergeTable

    pages, seeds, _, robots = fixture_bundle
    store = FrontierStore(str(tmp_path / "f3"), n_bloom_shards=8)
    store.bootstrap(
        seeds_to_frontier(spark.createDataFrame(seeds, schema=SEEDS)),
        fixtures.RUN_TS,
    )
    calls = {"n": 0}
    orig = MergeTable.read

    def counting_read(self, spark_):
        calls["n"] += 1
        return orig(self, spark_)

    monkeypatch.setattr(MergeTable, "read", counting_read)
    store.run_round(
        spark,
        spark.createDataFrame(pages, schema=PAGES),
        spark.createDataFrame(robots, schema=ROBOTS),
        fixtures.RUN_TS,
        round_id=0,
    )
    assert calls["n"] == 1, f"run_round read the table {calls['n']} times"


def test_cli_bootstrap_date_window(spark, fixture_bundle, tmp_path, monkeypatch):
    """`bootstrap --months-back` limits the seeded frontier exactly like
    the reference's MONTHS_BACK knob (applied before the per-corp cap)."""
    from dart_xbrl_crawler_spark import cli, fixtures, oracle
    from dart_xbrl_crawler_spark.operators.scheduler import date_window
    from dart_xbrl_crawler_spark.schemas import SEEDS

    # reuse the test session; the CLI normally owns (and stops) its own
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    _, seeds, _, _ = fixture_bundle
    seeds_path = str(tmp_path / "seeds")
    spark.createDataFrame(seeds, schema=SEEDS).write.parquet(seeds_path)
    store_path = str(tmp_path / "store")
    rc = cli.main(
        [
            "--run-ts", fixtures.RUN_TS,
            "bootstrap",
            "--seeds", seeds_path,
            "--store", store_path,
            "--months-back", "2",
        ]
    )
    assert rc == 0
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    store = FrontierStore(store_path)
    want = oracle.sequential_schedule(
        seeds.to_dict("records"),
        window=date_window(fixtures.RUN_TS, months_back=2),
    )
    got = {
        r["seed_rcp_no"]
        for r in store.table.read(spark).select("seed_rcp_no").collect()
    }
    assert got == set(want) and got  # windowed, non-empty


def test_robots_from_pages_closes_the_loop(spark):
    """Fetched /robots.txt pages become next round's rules dim: latest
    fetch per host wins; non-robots pages never reach the parser."""
    rows = pd.DataFrame(
        {
            "url": [
                "https://a.example/robots.txt",
                "https://a.example/robots.txt",   # older duplicate
                "https://b.example/robots.txt",
                "https://a.example/page.html",    # not robots
            ],
            "html": [
                b"User-agent: *\nDisallow: /new\nCrawl-delay: 2\n",
                b"User-agent: *\nDisallow: /old\n",
                b"User-agent: *\nDisallow: /*.pdf$\n",
                b"<html>hi</html>",
            ],
            "warc_ts": pd.to_datetime(
                ["2026-01-02", "2026-01-01", "2026-01-01", "2026-01-02"]
            ),
        }
    )
    pages = spark.createDataFrame(
        rows, schema="url string, html binary, warc_ts timestamp"
    )
    dim = {r["host"]: r for r in P.robots_from_pages(pages).collect()}
    assert set(dim) == {"a.example", "b.example"}
    a = dim["a.example"]
    assert [ru["prefix"] for ru in a["rules"]] == ["/new"]  # latest wins
    assert a["crawl_delay_ms"] == 2000
    b = dim["b.example"]
    assert b["rules"][0]["pattern"] is not None  # wildcard rule compiled

    # and the dim gates a frontier end-to-end
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon

    frontier = with_url_canon(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": [
                        "https://a.example/new/x",
                        "https://a.example/okay",
                        "https://b.example/doc.pdf",
                    ]
                }
            )
        )
    )
    got = {
        r["url"]: r["robots_blocked"]
        for r in P.apply_robots(frontier, P.robots_from_pages(pages)).collect()
    }
    assert got == {
        "https://a.example/new/x": True,
        "https://a.example/okay": False,
        "https://b.example/doc.pdf": True,
    }


# -------------------------------------- link discovery + crawl loop
def test_extract_links_resolution(spark):
    html = (
        b'<a href="/abs/x">1</a><a href="rel.html">2</a>'
        b'<a href="https://other.example/p">3</a>'
        b'<a href="//cdn.example/js">4</a><a href="#frag">5</a>'
        b'<a href="mailto:a@b">6</a><a href="ftp://x/y">7</a>'
    )
    pages = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["https://site.example/dir/page.html"], "html": [html]}
        ),
        schema="url string, html binary",
    )
    from dart_xbrl_crawler_spark.functions.links import extract_links

    got = {r["link"] for r in extract_links(pages).collect()}
    assert got == {
        "https://site.example/abs/x",
        "https://site.example/dir/rel.html",
        "https://other.example/p",
        "https://cdn.example/js",
    }


def test_run_crawl_discovers_link_graph(spark, tmp_path):
    """Seeded with page A; A links to B, B links to C — three budgeted
    rounds fetch the whole chain via discovery inserts, with exact
    lineage (1 fetched/round, dup self-links deduped)."""
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    def page(name, link_to=None):
        body = f'<html><a href="/{link_to}">next</a></html>' if link_to else "<html>end</html>"
        return (f"https://g.example/{name}", body.encode(), pd.Timestamp("2026-01-01"))

    rows = pd.DataFrame(
        [page("a", "b"), page("b", "c"), page("c")],
        columns=["url", "html", "warc_ts"],
    )
    pages = spark.createDataFrame(
        rows, schema="url string, html binary, warc_ts timestamp"
    )
    robots = spark.createDataFrame(
        [("g.example", None, 100)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    store = FrontierStore(str(tmp_path / "g"), n_bloom_shards=8)
    seeds = spark.createDataFrame(
        pd.DataFrame({"url": ["https://g.example/a"], "priority": [0.0]})
    )
    store.bootstrap(seeds, RUN_TS)
    rounds = store.run_crawl(
        spark, pages, robots, RUN_TS, max_rounds=5, round_ms=100_000
    )
    counts = store.state_counts(spark)
    assert counts.get("fetched") == 3 and counts.get("queued", 0) == 0
    assert [r["fetched"] for r in rounds] == [1, 1, 1]
    assert [r["discovered_new"] for r in rounds] == [1, 1, 0]
    lineage = store.lineage_counts(spark)
    assert lineage["fetched"] == 3


def test_resolve_href_matches_urljoin_property(spark):
    """Relative resolution (incl. ./ and ../ segments within root)
    matches urllib.parse.urljoin on a generated case battery — one
    batched Spark evaluation, not per-example sessions."""
    import itertools
    from urllib.parse import urljoin

    from dart_xbrl_crawler_spark.functions.links import extract_links

    dirs = ["/", "/a/", "/a/b/", "/a/b/c/"]
    hrefs = [
        "x.html", "./x.html", "sub/x", "sub/./x", "../x", "../../x",
        "./../x", "sub/../x", "/rooted/y", "/rooted/../y", "d/",
        "..", "x/..", "x/y/../../z",
    ]
    def climbs_above_root(d: str, h: str) -> bool:
        raw = h if h.startswith("/") else d + h
        bal = 0
        for seg in raw.split("/"):
            if seg in ("", "."):
                continue
            bal += -1 if seg == ".." else 1
            if bal < 0:
                return True
        return False

    cases = []
    for d, h in itertools.product(dirs, hrefs):
        base = f"https://p.example{d}page.html"
        # skip above-root climbs: urljoin clamps at root, the engine's
        # bounded normalizer intentionally leaves them visible
        if climbs_above_root(d, h):
            continue
        cases.append((base, h, urljoin(base, h)))
    assert len(cases) > 30
    # one link per page; a unique query-string tag keys each case
    rows2 = pd.DataFrame(
        {
            "url": [f"{c[0]}?case={i}" for i, c in enumerate(cases)],
            "html": [f'<a href="{c[1]}">l</a>'.encode() for i, c in enumerate(cases)],
        }
    )
    got2 = {
        int(r["src_url"].split("case=")[1]): r["link"]
        for r in extract_links(
            spark.createDataFrame(rows2, schema="url string, html binary")
        ).collect()
    }
    bad = []
    for i, (base, h, want) in enumerate(cases):
        if got2.get(i) != want:
            bad.append((base, h, got2.get(i), want))
    assert not bad, bad[:8]


# ------------------------------------------- WARC source / sink
def test_warc_roundtrip_and_gz(spark, tmp_path):
    import gzip

    from dart_xbrl_crawler_spark.sources import warc as W

    recs = [
        ("https://w.example/a", "2026-01-16T00:00:00Z", b"<html>A</html>"),
        ("https://w.example/b", "2026-01-16T00:01:00Z", b"<html>B</html>"),
    ]
    raw = W.warc_bytes(recs)
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg0.warc").write_bytes(raw)
    (d / "seg1.warc.gz").write_bytes(gzip.compress(W.warc_bytes(recs[:1])))
    df = W.read_warc(spark, str(d))
    rows = df.orderBy("source_file", "url").collect()
    assert len(rows) == 3
    got = {(r["url"], bytes(r["html"])) for r in rows}
    assert ("https://w.example/a", b"<html>A</html>") in got
    assert ("https://w.example/b", b"<html>B</html>") in got
    assert all(r["warc_type"] == "response" for r in rows)
    assert str(rows[0]["warc_ts"]).startswith("2026-01-16")

    # archival sink → read back identical bodies
    out = str(tmp_path / "arch")
    W.write_warc(df.select("url", "warc_ts", "html"), out)
    back = W.read_warc(spark, out)
    assert {
        (r["url"], bytes(r["html"])) for r in back.collect()
    } == got


def test_warc_feeds_crawl_pipeline(spark, tmp_path):
    """WARC segments are a first-class pages source: read_warc output
    drives the same canonicalize→extract-links path as parquet pages."""
    from dart_xbrl_crawler_spark.functions.links import extract_links
    from dart_xbrl_crawler_spark.sources import warc as W

    raw = W.warc_bytes(
        [
            (
                "https://w.example/dir/p.html",
                "2026-01-16T00:00:00Z",
                b'<a href="/x">1</a><a href="q.html">2</a>',
            )
        ]
    )
    d = tmp_path / "w2"
    d.mkdir()
    (d / "s.warc").write_bytes(raw)
    pages = W.read_warc(spark, str(d))
    links = {r["link"] for r in extract_links(pages).collect()}
    assert links == {
        "https://w.example/x",
        "https://w.example/dir/q.html",
    }


# ---------------------------------------------- sitemap ingestion
def test_sitemap_extraction(spark):
    from dart_xbrl_crawler_spark.functions.links import (
        extract_sitemap_locs,
        sitemap_urls_from_robots,
    )

    sm = (
        b'<?xml version="1.0"?><urlset>'
        b"<url><loc> https://s.example/a </loc></url>"
        b"<url><loc>https://s.example/b</loc></url></urlset>"
    )
    idx = (
        b"<sitemapindex><sitemap><loc>https://s.example/sitemap-1.xml</loc>"
        b"</sitemap></sitemapindex>"
    )
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://s.example/sitemap.xml", "https://s.example/si.xml"],
                "html": [sm, idx],
            }
        ),
        schema="url string, html binary",
    )
    locs = {(r["src_url"], r["loc"]) for r in extract_sitemap_locs(pages).collect()}
    assert locs == {
        ("https://s.example/sitemap.xml", "https://s.example/a"),
        ("https://s.example/sitemap.xml", "https://s.example/b"),
        ("https://s.example/si.xml", "https://s.example/sitemap-1.xml"),
    }

    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["s.example"],
                "robots_txt": [
                    "User-agent: *\nDisallow: /x\n"
                    "Sitemap: https://s.example/sitemap.xml\n"
                    "sitemap: https://s.example/sitemap2.xml\n"
                ],
            }
        )
    )
    sm_urls = {r["sitemap_url"] for r in sitemap_urls_from_robots(robots).collect()}
    assert sm_urls == {
        "https://s.example/sitemap.xml",
        "https://s.example/sitemap2.xml",
    }


# --------------------------------- connected components / dedup clusters
def test_connected_components_planted_clusters(spark):
    from dart_xbrl_crawler_spark.operators.components import (
        canonical_docs,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (21, 20), (30, 31), (31, 32), (32, 33),
         (33, 34)],  # incl. a 5-node chain (propagation depth > 1)
        "a_id long, b_id long",
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert comp == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30, 34: 30,
    }
    canon = {
        r["doc_id"]: r["canonical_id"] for r in canonical_docs(pairs).collect()
    }
    assert canon[34] == 30 and canon[3] == 1


def test_run_crawl_text_out_matches_oracle(spark, tmp_path):
    """crawl with text_out: each round's fetched pages land in the text
    sink, byte-identical to the row-at-a-time oracle extractor."""
    from dart_xbrl_crawler_spark import oracle
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    def page(name, link_to=None):
        body = (
            f'<p>Text of {name}.</p><a href="/{link_to}">n</a>'
            if link_to
            else f"<p>Text of {name}.</p>"
        ).encode()
        return (f"https://t.example/{name}", body, pd.Timestamp("2026-01-01"))

    rows = pd.DataFrame(
        [page("a", "b"), page("b")], columns=["url", "html", "warc_ts"]
    )
    pages = spark.createDataFrame(
        rows, schema="url string, html binary, warc_ts timestamp"
    )
    robots = spark.createDataFrame(
        [("t.example", None, 100)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    store = FrontierStore(str(tmp_path / "t"), n_bloom_shards=8)
    store.bootstrap(
        spark.createDataFrame(
            pd.DataFrame({"url": ["https://t.example/a"], "priority": [0.0]})
        ),
        RUN_TS,
    )
    out = str(tmp_path / "texts")
    store.run_crawl(spark, pages, robots, RUN_TS, max_rounds=4, text_out=out)
    got = {
        r["url"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    want = {
        u: oracle.extract_text_rowwise(u, bytes(h), None, None, RUN_TS)
        for u, h, _ in [page("a", "b"), page("b")]
    }
    assert got == want and len(got) == 2


# --------------------------------------- adaptive politeness backoff
def test_host_stats_and_backoff(spark, fixture_bundle, tmp_path):
    """Failure-rate backoff: hosts whose fetches error slow down by
    delay x (1 + factor*fail_rate); clean hosts keep their delay."""
    from dart_xbrl_crawler_spark import fixtures
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore
    from dart_xbrl_crawler_spark.schemas import PAGES, ROBOTS

    # seeds on two hosts; pages exist only for ok.example → the other
    # host's fetches all fail
    seeds = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "https://ok.example/1", "https://ok.example/2",
                    "https://bad.example/1", "https://bad.example/2",
                ],
                "priority": [0.0] * 4,
            }
        )
    )
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://ok.example/1", "https://ok.example/2"],
                "html": [b"<html>1</html>", b"<html>2</html>"],
                "warc_ts": pd.to_datetime(["2026-01-01"] * 2),
            }
        ),
        schema="url string, html binary, warc_ts timestamp",
    )
    robots = spark.createDataFrame(
        [("ok.example", None, 100), ("bad.example", None, 100)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    store = FrontierStore(str(tmp_path / "b"), n_bloom_shards=8)
    store.bootstrap(seeds, fixtures.RUN_TS)
    store.run_round(spark, pages, robots, fixtures.RUN_TS, round_id=0)
    stats = {r["host"]: r for r in store.host_stats(spark).collect()}
    assert stats["ok.example"]["fail_rate"] == 0.0
    assert stats["bad.example"]["fail_rate"] == 1.0
    assert stats["bad.example"]["n_failed"] == 2

    adjusted = {
        r["host"]: r["crawl_delay_ms"]
        for r in P.apply_backoff(
            robots, store.host_stats(spark), factor=4.0
        ).collect()
    }
    assert adjusted["ok.example"] == 100      # clean host unchanged
    assert adjusted["bad.example"] == 500     # 100 * (1 + 4*1.0)
