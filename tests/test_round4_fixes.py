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


# ------------------------------------- XBRL label linkbases from ZIP
_LINKBASE_XML_INSTANCE = """<?xml version="1.0" encoding="utf-8"?>
<xbrl xmlns="http://www.xbrl.org/2003/instance"
      xmlns:ifrs-full="http://xbrl.ifrs.org/taxonomy/2021-03-24/ifrs-full">
  <context id="CI"><entity><identifier scheme="s">00000042</identifier></entity>
    <period><instant>2025-06-30</instant></period></context>
  <context id="CD"><period><startDate>2025-04-01</startDate>
    <endDate>2025-06-30</endDate></period></context>
  <ifrs-full:Assets contextRef="CI" decimals="0">5000000</ifrs-full:Assets>
  <ifrs-full:OtherCurrentAssets contextRef="CI" decimals="0">123000</ifrs-full:OtherCurrentAssets>
  <ifrs-full:Revenue contextRef="CD" decimals="0">777000</ifrs-full:Revenue>
</xbrl>"""

_LAB_KO = """<?xml version="1.0" encoding="utf-8"?>
<linkbase xmlns="http://www.xbrl.org/2003/linkbase"
          xmlns:xlink="http://www.w3.org/1999/xlink">
 <labelLink xlink:type="extended" xlink:role="http://www.xbrl.org/2003/role/link">
  <loc xlink:type="locator" xlink:href="tax.xsd#ifrs-full_OtherCurrentAssets"
       xlink:label="loc_oca"/>
  <label xlink:type="resource" xlink:label="lab_oca"
         xlink:role="http://www.xbrl.org/2003/role/label"
         xml:lang="ko">기타유동자산</label>
  <labelArc xlink:type="arc"
            xlink:arcrole="http://www.xbrl.org/2003/arcrole/concept-label"
            xlink:from="loc_oca" xlink:to="lab_oca"/>
 </labelLink>
</linkbase>"""

_LAB_EN = _LAB_KO.replace('xml:lang="ko">기타유동자산', 'xml:lang="en">Other current assets')


def _linkbase_zip() -> bytes:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, body in (
            ("entity00000042_2025-06-30.xbrl", _LINKBASE_XML_INSTANCE),
            ("entity00000042_2025-06-30_lab-ko.xml", _LAB_KO),
            ("entity00000042_2025-06-30_lab-en.xml", _LAB_EN),
        ):
            info = zipfile.ZipInfo(name, date_time=(2026, 1, 1, 0, 0, 0))
            zf.writestr(info, body)
    return buf.getvalue()


def test_parse_label_linkbase_unit():
    from dart_xbrl_crawler_spark import doc_parsers

    labels = doc_parsers.parse_label_linkbase(_LAB_KO.encode())
    assert labels == {"ifrs-full_OtherCurrentAssets": {"ko": "기타유동자산"}}


def test_zip_label_linkbase_byte_identity(spark):
    """A ZIP carrying label linkbases resolves concept labels from the
    linkbase (dart_fss's job in the reference, xbrl_processor.py:339-393)
    instead of the localname fallback — flowing byte-identically through
    BOTH the row-wise oracle and the vectorized kernel (shared
    doc_parsers seam)."""
    from dart_xbrl_crawler_spark import doc_parsers, oracle
    from dart_xbrl_crawler_spark.operators import extract as X

    # seam level: the unknown concept gets its Korean linkbase label
    _, doc = doc_parsers.parse_document(_linkbase_zip())
    by_cid = {r["concept_id"]: r for r in doc["statements"]["BS"]["rows"]}
    assert by_cid["ifrs-full_OtherCurrentAssets"]["label_ko"] == "기타유동자산"
    assert by_cid["ifrs-full_OtherCurrentAssets"]["label_en"] == "Other current assets"
    # known concepts keep the built-in table's labels when the linkbase
    # doesn't carry them
    assert by_cid["ifrs-full_Assets"]["label_ko"] == "자산총계"

    url = "https://dart.fss.or.kr/api/fnlttXbrl.xml?rcept_no=lb1"
    html = _linkbase_zip()
    report_nm, rcept_dt = "반기보고서 (2025.06)", "20250615"
    golden = oracle.extract_text_rowwise(url, html, report_nm, rcept_dt, RUN_TS)
    assert "기타유동자산" in golden  # linkbase label reached the output

    df = spark.createDataFrame(
        pd.DataFrame(
            [{"url": url, "html": html, "report_nm": report_nm, "rcept_dt": rcept_dt}]
        ),
        schema="url string, html binary, report_nm string, rcept_dt string",
    )
    rows = X.extract_text(df, RUN_TS).collect()
    assert len(rows) == 1 and rows[0]["parse_ok"]
    assert rows[0]["text"] == golden


# --------------------------------------------- real PNG pixel decode
def _png_encode(px, filters, color_type=2, palette=None):
    """Minimal test-side PNG encoder with a CHOSEN filter per row —
    independent inverse of the engine's unfilter, so round-tripping
    exercises every filter path (0=None 1=Sub 2=Up 3=Average 4=Paeth)."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape if px.ndim == 3 else (*px.shape, 1)
    arr = px.reshape(h, w * c).astype(np.int32)
    stride = w * c
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, ftype in zip(range(h), filters):
        row = arr[y]
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = row[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[i] = (row[i] - pred) & 0xFF
        raw.append(ftype)
        raw += bytes(enc.astype(np.uint8))
        prev = row

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_decode_png_all_filters_roundtrip():
    import numpy as np

    from dart_xbrl_crawler_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    # one row per filter type, incl. a repeat
    payload = _png_encode(px, filters=[0, 1, 2, 3, 4])
    got = decode_png(payload)
    assert got is not None and got.shape == (5, 6, 3)
    assert np.array_equal(got, px)
    # grayscale (color type 0)
    g = rng.randint(0, 256, size=(4, 4), dtype=np.uint8)
    got_g = decode_png(_png_encode(g.reshape(4, 4, 1), [4, 3, 2, 1], color_type=0))
    assert np.array_equal(got_g[:, :, 0], g)
    # RGBA (color type 6)
    a = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    got_a = decode_png(_png_encode(a, [1, 4, 3], color_type=6))
    assert np.array_equal(got_a, a)
    # palette (color type 3): indices 0..3 → RGB triples
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8).reshape(2, 2, 1)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    got_p = decode_png(_png_encode(idx, [0, 0], color_type=3, palette=pal))
    assert got_p.shape == (2, 2, 3)
    assert list(got_p[0, 0]) == [255, 0, 0] and list(got_p[1, 1]) == [9, 9, 9]
    # out-of-envelope inputs → None, not an exception
    assert decode_png(b"\x89PNG\r\n\x1a\njunk") is None
    assert decode_png(b"not a png") is None


def test_extract_image_stats_real_pixels(spark):
    """Planted PNG flows through the JVM-side media filter into the
    Arrow decode batch; stats match the known pixel array exactly."""
    import numpy as np

    from dart_xbrl_crawler_spark.operators.multimodal import extract_image_stats

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(8, 5, 3), dtype=np.uint8)
    payload = _png_encode(px, filters=[0, 1, 2, 3, 4, 1, 2, 4])
    rows = pd.DataFrame(
        {
            "url": ["https://m.example/a.png", "https://m.example/page.html"],
            "html": [payload, b"<html>not media</html>"],
        }
    )
    df = spark.createDataFrame(rows, schema="url string, html binary")
    got = {r["url"]: r for r in extract_image_stats(df).collect()}
    assert list(got) == ["https://m.example/a.png"]  # non-png filtered JVM-side
    r = got["https://m.example/a.png"]
    assert (r["width"], r["height"], r["n_channels"]) == (5, 8, 3)
    x = px.astype(np.float64)
    assert abs(r["mean"] - x.mean()) < 1e-9
    assert abs(r["std"] - x.std()) < 1e-9


# --------------------------------------- metrics chain compaction
def test_metrics_chain_compaction_bounded_and_exact(spark, tmp_path):
    """A multi-round crawl with an aggressive compaction threshold
    keeps the metrics chains bounded while lineage_counts/host_stats
    stay EXACTLY equal to an uncompacted twin's."""
    from dart_xbrl_crawler_spark.operators.frontier import FrontierStore

    def page(name, link_to=None):
        body = (
            f'<html><a href="/{link_to}">n</a></html>' if link_to else "<html>e</html>"
        )
        return (f"https://c.example/{name}", body.encode(), pd.Timestamp("2026-01-01"))

    pages = spark.createDataFrame(
        pd.DataFrame(
            [page("a", "b"), page("b", "c"), page("c", "d"), page("d")],
            columns=["url", "html", "warc_ts"],
        ),
        schema="url string, html binary, warc_ts timestamp",
    )
    robots = spark.createDataFrame(
        [("c.example", None, 100)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    seeds = pd.DataFrame({"url": ["https://c.example/a"], "priority": [0.0]})

    stores = {}
    for tag, every in (("compacted", 2), ("plain", 1000)):
        st = FrontierStore(
            str(tmp_path / tag), n_bloom_shards=4, metrics_compact_every=every
        )
        st.bootstrap(spark.createDataFrame(seeds), RUN_TS)
        st.run_crawl(spark, pages, robots, RUN_TS, max_rounds=6, round_ms=100_000)
        stores[tag] = st

    plain, comp = stores["plain"], stores["compacted"]
    # chain bounded: ≤ threshold + the commits of one round (round
    # metrics + host metrics + next insert) before the next fold
    assert len(comp.metrics.snapshots()) <= 4
    assert len(plain.metrics.snapshots()) > 4  # the twin actually grew
    assert comp.lineage_counts(spark) == plain.lineage_counts(spark)
    hs = lambda s: {
        r["host"]: (r["n_fetched"], r["n_failed"], r["fail_rate"])
        for r in s.host_stats(spark).collect()
    }
    assert hs(comp) == hs(plain)


# --------------------------------------------- real Iceberg path (opt)
def test_iceberg_merge_table(spark):
    """Maps commit_base/commit_delta/read/rollback onto a REAL Iceberg
    table.  Needs the Iceberg Spark runtime jar + an 'ice' catalog
    (see IcebergMergeTable docstring) — run with SPARK_GRAFT_ICEBERG=1
    on a cluster that has them; skipped cleanly in this sandbox."""
    import os

    import pytest

    from dart_xbrl_crawler_spark.sources.checkpoint import (
        IcebergMergeTable,
        iceberg_available,
    )

    if os.environ.get("SPARK_GRAFT_ICEBERG") != "1":
        pytest.skip("SPARK_GRAFT_ICEBERG not set")
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on the classpath")

    t = IcebergMergeTable(spark, "ice.db.frontier_t", key="k")
    base = spark.range(100).select(F.col("id").alias("k"), F.lit("a").alias("v"))
    snap0 = t.commit_base(base)
    t.commit_delta(
        spark,
        spark.range(5).select(F.col("id").alias("k"), F.lit("b").alias("v")),
    )
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert len(rows) == 100 and rows[0] == "b" and rows[50] == "a"
    assert len(t.snapshots()) == 2
    t.rollback_to(snap0)
    assert {r["v"] for r in t.read(spark).collect()} == {"a"}


# ------------------------------- web-scale dims: no forced broadcast
def test_robots_and_backoff_no_forced_broadcast(spark):
    """With broadcast gating OFF (a 10^7+-host dim would OOM the driver
    if force-broadcast), the plans contain no BroadcastExchange that
    Catalyst didn't choose itself — verified under a disabled
    auto-broadcast threshold, where the robots join must appear as a
    shuffle join."""
    from dart_xbrl_crawler_spark.functions.urls import with_url_canon

    frontier = with_url_canon(
        spark.createDataFrame(
            pd.DataFrame({"url": [f"https://h{i % 7}.ex/p{i}" for i in range(40)]})
        )
    ).select(
        "*",
        F.lit(0.0).alias("priority"),
        F.to_timestamp(F.lit(RUN_TS)).alias("discovered_ts"),
    )
    robots = spark.createDataFrame(
        [(f"h{k}.ex", None, 10) for k in range(7)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    stats = spark.createDataFrame(
        pd.DataFrame({"host": [f"h{k}.ex" for k in range(7)], "fail_rate": [0.5] * 7})
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_g = P.apply_robots(
            frontier, robots, broadcast_robots=False
        )._jdf.queryExecution().executedPlan().toString()
        plan_b = P.apply_backoff(
            robots, stats, broadcast=False
        )._jdf.queryExecution().executedPlan().toString()
        out = P.pop_round(
            frontier, robots, round_ms=1000, broadcast_robots=False
        )
        n_sel = out.filter(F.col("selected")).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastExchange" not in plan_g, plan_g
    assert "BroadcastExchange" not in plan_b, plan_b
    # semantics unchanged: budget 1000/10=100 ≥ all queues → all pop
    assert n_sel == 40
    # default path still broadcasts (the common small-dim case)
    plan_default = P.apply_robots(
        frontier, robots
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan_default


# ----------------------------- parser registry calling conventions
def test_register_parser_calling_conventions():
    """Every historical and current parse signature keeps working:
    1-arg, defaulted-option, keyword aux, positional aux, **kwargs."""
    from dart_xbrl_crawler_spark import doc_parsers as DP

    seen = {}

    def reg(name, fn):
        DP.register_parser(lambda b, _n=name: b == _n.encode(), fn)

    reg("one", lambda body: seen.setdefault("one", "noaux") or {"doc_format": "x"})

    def with_option(body, strict=False):
        seen["opt"] = strict  # must stay False — aux must NOT land here
        return {"doc_format": "x"}

    reg("opt", with_option)

    def with_aux_kw(body, aux=None):
        seen["kw"] = aux
        return {"doc_format": "x"}

    reg("kw", with_aux_kw)

    def with_aux_pos(body, ctx):
        seen["pos"] = ctx
        return {"doc_format": "x"}

    reg("pos", with_aux_pos)

    def with_kwargs(body, **kwargs):
        seen["var"] = kwargs.get("aux")
        return {"doc_format": "x"}

    reg("var", with_kwargs)

    try:
        aux = {"labels": {"c": {"ko": "라벨"}}}
        for name in ("one", "opt", "kw", "pos", "var"):
            for sniff, parse in DP._REGISTRY:
                if sniff(name.encode()):
                    parse(name.encode(), aux=aux)
                    break
        assert seen["one"] == "noaux"
        assert seen["opt"] is False
        assert seen["kw"] == aux and seen["pos"] == aux and seen["var"] == aux
    finally:
        del DP._REGISTRY[:5]  # restore the registry
