"""End-to-end crawl/extract pipeline composition (SURVEY.md §7 slice).

pages → canonicalize+hash → URL-seen anti-join → politeness top-k →
"fetch" (bytes already on-row in the pages table) → extract UDF →
corp_map broadcast join → partitioned facts sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import extract as X


def pages_with_meta(pages: DataFrame, seeds: DataFrame) -> DataFrame:
    """Attach seed metadata (report_nm, rcept_dt) to pages by the
    rcept_no embedded in DART urls.  Seeds are a tiny dim → broadcast;
    non-DART pages keep null meta (the kernel treats them as generic)."""
    keyed = pages.withColumn(
        "rcept_no", F.regexp_extract("url", r"rcept_no=(\d{14})", 1)
    )
    dim = F.broadcast(
        seeds.select("rcept_no", "report_nm", "rcept_dt").dropDuplicates(["rcept_no"])
    )
    return keyed.join(dim, "rcept_no", "left")


def run_extract(
    pages: DataFrame,
    seeds: DataFrame,
    corp_map: DataFrame,
    run_ts: str,
) -> DataFrame:
    """pages + seeds + corp_map → final facts table (FACTS schema)."""
    meta = pages_with_meta(pages, seeds)
    facts = X.extract_facts(meta, run_ts)
    return X.attach_corp_name(facts, corp_map)


def write_facts(facts: DataFrame, path: str) -> None:
    """Partitioned sink mirroring the reference's Hive layout
    (s3_uploader.py:141-149); Spark drops partition cols from payload
    automatically (the reference does it by hand, s3_uploader.py:184)."""
    (
        facts.write.mode("overwrite")
        .partitionBy("year", "mm", "corp_code", "report_type")
        .parquet(path)
    )
