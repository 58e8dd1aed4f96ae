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
    """Deterministic mini-XBRL document for row id i."""
    mm = [3, 6, 9, 12][i % 4]
    q_end = f"2025{mm:02d}30"
    q_start = f"2025{mm - 2:02d}01"
    stmts: dict = {"BS": {"concepts": []}, "CIS": {"concepts": []}}
    for ci, (cid, ko, en, c1, c2, c3) in enumerate(_CONCEPTS):
        rt = "BS" if ci < 8 else "CIS"
        facts = []
        for fi, fs in enumerate(("연결재무제표", "별도재무제표")):
            amt = float((i * 31 + ci * 7 + fi * 3) % 100_000 + 1) * 1000.0
            period = q_end if rt == "BS" else f"{q_start}-{q_end}"
            facts.append({"period": period, "fs": fs, "amount": amt})
        stmts[rt]["concepts"].append(
            {
                "concept_id": cid,
                "label_ko": ko,
                "label_en": en,
                "class1": c1,
                "class2": c2,
                "class3": c3,
                "facts": facts,
            }
        )
    return {"doc_format": "mini-xbrl-1", "statements": stmts}


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
    """Scaling workload: generate a skewed n_urls frontier inline
    (spark.range + expressions, no I/O), canonicalize (pandas UDF),
    bloom-dedup vs a seen half, politeness-pop with salting.  Mix of
    python-UDF and JVM (xxhash/shuffle/window) work — the shape of a
    real crawl round."""
    from ..functions.urls import with_url_canon
    from ..operators import dedup as D
    from ..operators import politeness as P

    par = spark.sparkContext.defaultParallelism
    base = spark.range(n_urls, numPartitions=par * 4)
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
    canon = with_url_canon(base.select(url.alias("url"), "id"))
    seen = canon.filter(F.col("id") % 2 == 0).select("url_hash")
    bloom = D.build_seen_filter(seen, n_shards=256, expected_keys=n_urls // 2)
    fresh = D.dedup_urls(canon.drop("id"), seen, bloom, n_shards=256)
    frontier = fresh.withColumn("priority", F.lit(0.0)).withColumn(
        "discovered_ts", F.to_timestamp(F.lit(RUN_TS))
    )
    robots = spark.createDataFrame(
        [("dart.fss.or.kr", None, 1)]
        + [(f"host{k}.example", None, 10) for k in range(211)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    popped = P.pop_round(frontier, robots, round_ms=3_600_000, salt_buckets=64)
    return popped.filter(F.col("selected")).count()


def frontier_pop_job(spark: SparkSession, pages_path: str) -> int:
    """Canonicalize → bloom-dedup vs a seen half → per-host politeness
    top-k with salting.  Returns pops (selected count)."""
    from ..functions.urls import with_url_canon
    from ..operators import dedup as D
    from ..operators import politeness as P

    pages = spark.read.parquet(pages_path).select("url")
    canon = with_url_canon(pages)
    seen = canon.filter(F.xxhash64("url") % 2 == 0).select("url_hash")
    bloom = D.build_seen_filter(seen, n_shards=64)
    fresh = D.dedup_urls(canon, seen, bloom, n_shards=64)
    frontier = (
        fresh.withColumn("priority", F.lit(0.0))
        .withColumn("discovered_ts", F.to_timestamp(F.lit(RUN_TS)))
    )
    robots = spark.createDataFrame(
        [("dart.fss.or.kr", None, 2)]
        + [(f"host{k}.example", None, 20) for k in range(37)],
        schema="host string, disallow_prefix string, crawl_delay_ms long",
    )
    popped = P.pop_round(frontier, robots, round_ms=600_000, salt_buckets=64)
    return popped.filter(F.col("selected")).count()


def extract_job(spark: SparkSession, pages_path: str) -> int:
    """Extract stage over pre-synthesized pages; returns parsed count."""
    from ..operators import extract as X

    pages = spark.read.parquet(pages_path)
    out = X.extract_text(pages, RUN_TS)
    return out.filter(F.col("parse_ok")).count()


def timed(fn, *args) -> tuple[float, object]:
    t0 = time.time()
    out = fn(*args)
    return time.time() - t0, out
