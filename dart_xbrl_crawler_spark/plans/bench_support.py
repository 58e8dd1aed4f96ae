"""Benchmark workloads shared by bench.py and its scaling subprocesses.

The crawl workload is self-synthesized (deterministic, seeded by row
id — no wall-clock, no external data): a skewed frontier of DART-style
URLs over mini-XBRL ZIP payloads, ≥60% of rows on one giant host
(north_rule skew shape).
"""

from __future__ import annotations

import io
import json
import time
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RUN_TS = "2026-01-16 00:00:00"

_CONCEPTS = [
    ("ifrs-full_Assets", "자산총계", "Total assets", "자산 [개요]", "자산 [개요]", ""),
    ("ifrs-full_CurrentAssets", "유동자산", "Current assets", "자산총계", "유동자산", ""),
    ("ifrs-full_Cash", "현금및현금성자산", "Cash", "자산총계", "유동자산", "현금"),
    ("ifrs-full_PPE", "유형자산", "PP&E", "자산총계", "비유동자산", "유형자산"),
    ("ifrs-full_Liabilities", "부채총계", "Total liabilities", "부채 [개요]", "부채 [개요]", ""),
    ("ifrs-full_CurrentLiab", "유동부채", "Current liabilities", "부채총계", "유동부채", ""),
    ("ifrs-full_Equity", "자본총계", "Total equity", "자본 [개요]", "자본 [개요]", ""),
    ("ifrs-full_IssuedCapital", "자본금", "Issued capital", "자본총계", "자본금", ""),
    ("ifrs-full_Revenue", "수익(매출액)", "Revenue", "수익 [개요]", "", ""),
    ("ifrs-full_CostOfSales", "매출원가", "Cost of sales", "수익 [개요]", "매출원가", ""),
    ("ifrs-full_GrossProfit", "매출총이익", "Gross profit", "수익 [개요]", "매출총이익", ""),
    ("ifrs-full_ProfitLoss", "당기순이익", "Profit", "수익 [개요]", "당기순이익", ""),
]


def _doc_for(i: int) -> dict:
    """Deterministic WIDE mini-XBRL (mini-xbrl-2) document for row id i —
    the bench extract stage exercises the real wide→long unpivot."""
    mm = [3, 6, 9, 12][i % 4]
    q_end = f"2025{mm:02d}30"
    q_start = f"2025{mm - 2:02d}01"
    bs_cols = [[q_end, ["연결재무제표"]], [q_end, ["별도재무제표"]],
               [f"2024{mm:02d}30", ["연결재무제표"]]]  # out-of-period col
    cis_cols = [
        [f"{q_start}-{q_end}", ["연결재무제표"]],
        [f"{q_start}-{q_end}", ["별도재무제표"]],
        ["비고", ["연결재무제표"]],  # regex-rejected label
    ]
    stmts: dict = {
        "BS": {"columns": bs_cols, "rows": []},
        "CIS": {"columns": cis_cols, "rows": []},
    }
    for ci, (cid, ko, en, c1, c2, c3) in enumerate(_CONCEPTS):
        rt = "BS" if ci < 8 else "CIS"
        cols = stmts[rt]["columns"]
        values = [
            float((i * 31 + ci * 7 + fi * 3) % 100_000 + 1) * 1000.0
            for fi in range(len(cols))
        ]
        stmts[rt]["rows"].append(
            {
                "concept_id": cid,
                "label_ko": ko,
                "label_en": en,
                "class1": c1,
                "class2": c2,
                "class3": c3,
                "values": values,
            }
        )
    return {"doc_format": "mini-xbrl-2", "statements": stmts}


def synth_pages(spark: SparkSession, n_docs: int, n_parts: int) -> DataFrame:
    """Distributed deterministic page generation: spark.range →
    mapInPandas ZIP builder.  60% of urls land on the giant host."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].tolist()
            urls, htmls, rnms, rdts = [], [], [], []
            for i in ids:
                corp = f"{i % 997:08d}"
                mm = [3, 6, 9, 12][i % 4]
                doc = _doc_for(i)
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
                    info = zipfile.ZipInfo(
                        f"entity{corp}_2025-{mm:02d}-30.xbrl",
                        date_time=(2026, 1, 1, 0, 0, 0),
                    )
                    zf.writestr(info, json.dumps(doc, ensure_ascii=False))
                host = (
                    "dart.fss.or.kr" if i % 10 < 6 else f"host{i % 37}.example"
                )
                urls.append(
                    f"https://{host}/api/fnlttXbrl.xml?rcept_no={20250000000000 + i}"
                )
                htmls.append(buf.getvalue())
                rnms.append(f"반기보고서 (2025.{mm:02d})")
                rdts.append(f"2025{mm:02d}15")
            yield pd.DataFrame(
                {"url": urls, "html": htmls, "report_nm": rnms, "rcept_dt": rdts}
            )

    return spark.range(n_docs, numPartitions=n_parts).mapInPandas(
        gen, schema="url string, html binary, report_nm string, rcept_dt string"
    )


def frontier_scale_job(spark: SparkSession, n_urls: int) -> int:
    """Scaling workload — one crawl round over a skewed n_urls frontier:
    generate inline (spark.range + expressions, no I/O), canonicalize
    ONCE (pandas UDF, persisted — in the real pipeline canonicalization
    happens once at insert and the frontier table stores url_hash),
    bloom-dedup vs a seen half, politeness-pop with salting.

    The persist is load-bearing for scaling: canon feeds three
    consumers (seen set, probe, anti-join); unpersisted, Spark runs the
    canonicalizer UDF in three CONCURRENT stages → 3×cores python
    workers on a cores-sized box — oversubscription that made 32 cores
    measurably slower than 8."""
    from pyspark.storagelevel import StorageLevel

    from ..functions.urls import with_url_canon
    from ..operators import dedup as D
    from ..operators import politeness as P

    # FIXED partition count, independent of cores: the scaling
    # comparison must vary only the executor count — deriving task
    # counts from defaultParallelism quadruples the number of
    # sub-second tasks at 4N and the single-threaded DAGScheduler
    # becomes the bottleneck (measured as 4N anti-scaling)
    base = spark.range(n_urls, numPartitions=64)
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("id") % 10 < 6, F.lit("DART.FSS.OR.KR")).otherwise(
            F.concat(F.lit("host"), (F.col("id") % 211).cast("string"), F.lit(".example"))
        ),
        F.lit("/api/doc?b="),
        (F.col("id") % 7).cast("string"),
        F.lit("&a="),
        F.col("id").cast("string"),
        F.when(F.col("id") % 3 == 0, "#frag").otherwise(""),
    )
    canon = with_url_canon(base.select(url.alias("url"), "id")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    frontier = None
    try:
        canon.count()  # materialize: canonicalizer runs exactly once
        # 10% already-seen: a pop round mostly meets NEW urls (high-dup
        # batches belong to insert/discovery); the confirmed-seen set —
        # the broadcast side of the anti-join — stays O(overlap)
        seen = canon.filter(F.col("id") % 10 == 0).select("url_hash")
        bloom = D.build_seen_filter(seen, n_shards=64, expected_keys=n_urls // 10)
        # the deduped frontier feeds pop_round's several consumers
        # (robots gate, budget counts, branch filters) — in production
        # it is a stored table read per consumer; persisting here is the
        # bench analog, not a cheat
        frontier = (
            D.dedup_urls(canon.drop("id"), seen, bloom, n_shards=64)
            .withColumn("priority", F.lit(0.0))
            .withColumn("discovered_ts", F.to_timestamp(F.lit(RUN_TS)))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # materialization BARRIER, not an optimization knob: pop_round
        # has several consumers, and a lazy persist lets them all race
        # to compute the unmaterialized cache — re-running the python
        # probe in concurrent stages (3×cores workers again).  A
        # production round has the same barrier naturally: the frontier
        # is a table on storage between stages.
        frontier.count()
        robots = spark.createDataFrame(
            [("dart.fss.or.kr", None, 1)]
            + [(f"host{k}.example", None, 10) for k in range(211)],
            schema="host string, disallow_prefix string, crawl_delay_ms long",
        )
        popped = P.pop_round(frontier, robots, round_ms=3_600_000, salt_buckets=64)
        return popped.filter(F.col("selected")).count()
    finally:
        canon.unpersist()
        if frontier is not None:
            frontier.unpersist()


def extract_job(spark: SparkSession, pages_path: str, limit: int | None = None) -> int:
    """Extract stage over pre-synthesized pages; returns parsed count.
    ``limit`` bounds the input (used for cheap worker warm-up runs)."""
    from ..operators import extract as X

    pages = spark.read.parquet(pages_path)
    if limit:
        pages = pages.limit(limit)
    out = X.extract_text(pages, RUN_TS)
    return out.filter(F.col("parse_ok")).count()


def timed(fn, *args) -> tuple[float, object]:
    t0 = time.time()
    out = fn(*args)
    return time.time() - t0, out
