"""Round-2 features: real robots.txt semantics, delta frontier commits
(O(|round|) bytes), multimodal header metadata."""

from __future__ import annotations

import io
import struct
import zipfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dart_xbrl_crawler_spark.operators import politeness as P
from dart_xbrl_crawler_spark.functions.urls import with_url_canon

RUN_TS = "2026-01-16 00:00:00"


# ---------------------------------------------------------------------
# robots.txt parser + REP evaluation
# ---------------------------------------------------------------------

ROBOTS_TXT = """
# comments are ignored
User-agent: googlebot
Disallow: /

User-agent: dart-xbrl-crawler
User-agent: other-bot
Disallow: /private
Allow: /private/public   # longest match wins over /private
Disallow: /tmp/
Allow:
Crawl-delay: 0.25

User-agent: *
Disallow: /everything
"""


def test_parse_robots_txt_group_selection_and_rules():
    rules, delay = P.parse_robots_txt(ROBOTS_TXT, "dart-xbrl-crawler/1.0")
    assert ("(/private)" or True)  # readability anchor
    assert ("/private", False) in rules
    assert ("/private/public", True) in rules
    assert ("/tmp/", False) in rules
    assert all(p != "" for p, _ in rules)  # empty Allow dropped
    assert delay == 250
    # unknown agent falls back to *
    rules_star, delay_star = P.parse_robots_txt(ROBOTS_TXT, "randombot")
    assert rules_star == [("/everything", False)]
    assert delay_star is None
    # googlebot gets its own full block
    rules_g, _ = P.parse_robots_txt(ROBOTS_TXT, "googlebot")
    assert rules_g == [("/", False)]


def test_robots_rules_longest_match_evaluation(spark):
    txt_df = spark.createDataFrame(
        pd.DataFrame({"host": ["h.example"], "robots_txt": [ROBOTS_TXT]})
    )
    rules_dim = P.robots_rules_from_txt(spark, txt_df)
    urls = [
        ("https://h.example/private/secret", True),    # /private disallow
        ("https://h.example/private/public/x", False), # longer Allow wins
        ("https://h.example/tmp/f", True),
        ("https://h.example/ok", False),
        ("https://unlisted.example/anything", False),  # no rules → allowed
    ]
    frontier = (
        with_url_canon(
            spark.createDataFrame(pd.DataFrame({"url": [u for u, _ in urls]}))
        )
        .withColumn("priority", F.lit(0.0))
        .withColumn("discovered_ts", F.to_timestamp(F.lit(RUN_TS)))
    )
    got = {
        r["url"]: r["robots_blocked"]
        for r in P.apply_robots(frontier, rules_dim).collect()
    }
    for u, blocked in urls:
        assert got[u] == blocked, u
    # crawl-delay flows through to the budget input
    delays = {
        r["host"]: r["crawl_delay_ms"]
        for r in P.apply_robots(frontier, rules_dim)
        .select("host", "crawl_delay_ms")
        .distinct()
        .collect()
    }
    assert delays["h.example"] == 250
    assert delays["unlisted.example"] == P.DEFAULT_CRAWL_DELAY_MS


# ---------------------------------------------------------------------
# delta commits: bytes per round ∝ |round|, not |frontier|
# ---------------------------------------------------------------------

def test_delta_commit_bytes_scale_with_round(spark, tmp_path):
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    store = FrontierStore(str(tmp_path / "frontier"), n_bloom_shards=8)
    n = 20_000
    urls = spark.range(n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 7).cast("string"),
            F.lit(".example/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.lit(0.0).alias("priority"),
    )
    store.bootstrap(urls, RUN_TS)
    snaps = store.table.table.snapshots()
    base_id = snaps[-1]["id"]
    base_bytes = store.table.snapshot_bytes(base_id)

    # rounds fetch ~70 rows each (7 hosts × budget 10)
    robots = spark.createDataFrame(
        [(f"h{k}.example", None, 100) for k in range(7)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    pages = urls.select(
        "url", F.lit(b"<!doctype html><p>x</p>").alias("html")
    ).withColumn("warc_ts", F.to_timestamp(F.lit(RUN_TS)))
    delta_bytes = []
    for rid in range(3):
        snap, fetched = store.run_round(
            spark, pages, robots, RUN_TS, round_id=rid, round_ms=1000,
            salt_buckets=4, n_partitions=4,
        )
        delta_bytes.append(store.table.snapshot_bytes(snap))
    # every round's snapshot is a small fraction of the base image
    for b in delta_bytes:
        assert b < base_bytes / 5, (delta_bytes, base_bytes)
    # state is correct after merging deltas
    counts = store.state_counts(spark)
    assert counts.get("fetched", 0) == 3 * 70
    assert counts["queued"] == n - 3 * 70
    # each round popped DIFFERENT urls (queued-only filter works)
    assert fetched.count() == 70


def test_incremental_bloom_across_inserts(spark, tmp_path):
    """The URL-seen filter is a durable artifact OR-merged per insert —
    never rebuilt from the full frontier — and dedup stays exact."""
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    store = FrontierStore(str(tmp_path / "fb"), n_bloom_shards=8)
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.concat(F.lit("https://b.example/"), F.col("id").cast("string")).alias("url"),
        F.lit(0.0).alias("priority"),
    )
    store.bootstrap(mk(0, 1000), RUN_TS)
    assert len(store.bloom.snapshots()) == 1
    # overlapping insert: 500 dupes + 500 new
    _, n_ins, n_dup = store.insert(spark, mk(500, 1500), RUN_TS)
    assert (n_ins, n_dup) == (500, 500)
    assert len(store.bloom.snapshots()) == 2  # ONE merged commit, no rebuild
    # fully-duplicate insert → nothing enters, no bloom commit
    _, n_ins2, n_dup2 = store.insert(spark, mk(0, 1500), RUN_TS)
    assert (n_ins2, n_dup2) == (0, 1500)
    assert len(store.bloom.snapshots()) == 2
    assert store.state_counts(spark) == {"queued": 1500}


def test_delta_resume_after_unpublished_write(spark, tmp_path):
    """A crashed round (delta written but never published) must be
    invisible to readers — resume sees the previous state."""
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    store = FrontierStore(str(tmp_path / "f2"), n_bloom_shards=8)
    urls = spark.range(100).select(
        F.concat(F.lit("https://x.example/"), F.col("id").cast("string")).alias("url"),
        F.lit(0.0).alias("priority"),
    )
    store.bootstrap(urls, RUN_TS)
    before = store.state_counts(spark)
    # simulate a crash: write a snapshot dir WITHOUT publishing it
    import os
    crash_dir = os.path.join(store.table.table.path, "snap-999999-deadbeef")
    store.table.table.read(spark).limit(5).write.parquet(crash_dir)
    after = store.state_counts(spark)
    assert after == before


def test_merge_table_compaction(spark, tmp_path):
    from dart_xbrl_crawler_spark.sources.checkpoint import MergeTable

    mt = MergeTable(str(tmp_path / "m"), key="k", compact_every=3)
    base = spark.createDataFrame([(i, "a") for i in range(10)], "k long, v string")
    mt.commit_base(base)
    for j in range(5):  # exceeds compact_every → auto-compact folds chain
        mt.commit_delta(
            spark,
            spark.createDataFrame([(j, f"v{j}")], "k long, v string"),
            note=f"d{j}",
        )
    got = {r["k"]: r["v"] for r in mt.read(spark).collect()}
    assert len(got) == 10
    for j in range(5):
        assert got[j] == f"v{j}"  # last-wins applied
    kinds = [s.get("kind") for s in mt.table.snapshots()]
    assert kinds.count("base") >= 2  # compaction produced a new base


# ---------------------------------------------------------------------
# multimodal: real header metadata from raw bytes
# ---------------------------------------------------------------------

def _png(w, h):
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    return sig + ihdr


def _jpeg(w, h):
    # SOI, APP0 stub, SOF0 with dims, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(rate, ch):
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    data = b"data" + struct.pack("<I", 0)
    body = b"WAVE" + fmt + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_multimodal_header_metadata(spark):
    from dart_xbrl_crawler_spark.operators import multimodal as M

    rows = [
        ("u1", _png(640, 480)),
        ("u2", _jpeg(1920, 1080)),
        ("u3", _wav(44100, 2)),
        ("u4", b"\x89PNG\r\n\x1a\nbroken"),  # malformed → nulls
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"url": [r[0] for r in rows], "html": [r[1] for r in rows]})
    )
    got = {r["url"]: r.asDict() for r in M.extract_header_meta(df).collect()}
    assert (got["u1"]["width"], got["u1"]["height"]) == (640, 480)
    assert got["u1"]["media_type"] == "image/png"
    assert (got["u2"]["width"], got["u2"]["height"]) == (1920, 1080)
    assert got["u2"]["media_type"] == "image/jpeg"
    assert (got["u3"]["sample_rate"], got["u3"]["n_channels"]) == (44100, 2)
    assert got["u4"]["width"] is None and got["u4"]["height"] is None


def test_decode_stub_still_gated():
    from dart_xbrl_crawler_spark.operators import multimodal as M

    with pytest.raises(NotImplementedError):
        M.decode_stub(b"xx", None)
