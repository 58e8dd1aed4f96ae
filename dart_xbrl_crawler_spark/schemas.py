"""Fixed StructTypes for every engine table.

The reference is dynamically typed (columns discovered at runtime,
/root/reference/xbrl_processor.py:458-503); this engine is fixed-schema:
every table boundary is an explicit StructType, checked on read/write.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# pages — the authoritative input shape (BASELINE.json input_hint):
# Common-Crawl-style web pages.
# ---------------------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# frontier — engine-owned crawl state (SURVEY.md §1.3).  At the 10^10-URL
# design point this is an Iceberg table partitioned by bucket(url_hash);
# locally it is a snapshot-checkpointed parquet table (sources/checkpoint).
# ---------------------------------------------------------------------------
FRONTIER_STATES = ("queued", "fetched", "failed", "robots_blocked", "deduped")

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seed_rcp_no", T.StringType(), True),
        T.StructField("state", T.StringType(), False),
        T.StructField("discovered_ts", T.TimestampType(), True),
        T.StructField("fetch_ts", T.TimestampType(), True),
        T.StructField("partition_salt", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# seeds — rcp_no seed list (first-class input; the reference's missing
# corp_list.json / corp_codes targeting, xbrl_batch_processor.py:466).
# ---------------------------------------------------------------------------
SEEDS = T.StructType(
    [
        T.StructField("rcept_no", T.StringType(), False),
        T.StructField("corp_code", T.StringType(), False),
        T.StructField("report_nm", T.StringType(), True),
        T.StructField("rcept_dt", T.StringType(), True),
        T.StructField("seed_rank", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# corp_map — company dimension (dart_api_manager.py:144-159,
# fixed_corp_map_lambda.py:80-89).  Tiny: always broadcast.
# ---------------------------------------------------------------------------
CORP_MAP = T.StructType(
    [
        T.StructField("dart_corp", T.StringType(), True),
        T.StructField("dart_corp_code", T.StringType(), True),
        T.StructField("stock_nm", T.StringType(), True),
        T.StructField("stock_code", T.StringType(), True),
        T.StructField("listed_yn", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# robots — per-host politeness rules (new-engine component; reference
# analog is the global 60 ms throttle, dart_api_manager.py:44-46).
# ---------------------------------------------------------------------------
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefix", T.StringType(), True),
        T.StructField("crawl_delay_ms", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# facts — the long output table (reference README.md:169-191,
# xbrl_processor.py:786-969).  Column order matters for byte-identity.
# ---------------------------------------------------------------------------
FACTS_COLUMNS = [
    "order_no",
    "year",
    "mm",
    "receipt_ymd",
    "corp_code",
    "corp_name",
    "report_type",
    "report_name",
    "account_id",
    "account_name",
    "account_name_en",
    "class1",
    "class2",
    "class3",
    "class1_id",
    "class2_id",
    "class3_id",
    "fs_type",
    "period",
    "amount",
    "crawl_time",
]

FACTS = T.StructType(
    [
        T.StructField("order_no", T.IntegerType(), True),
        T.StructField("year", T.StringType(), True),
        T.StructField("mm", T.StringType(), True),
        T.StructField("receipt_ymd", T.StringType(), True),
        T.StructField("corp_code", T.StringType(), True),
        T.StructField("corp_name", T.StringType(), True),
        T.StructField("report_type", T.StringType(), True),
        T.StructField("report_name", T.StringType(), True),
        T.StructField("account_id", T.StringType(), True),
        T.StructField("account_name", T.StringType(), True),
        T.StructField("account_name_en", T.StringType(), True),
        T.StructField("class1", T.StringType(), True),
        T.StructField("class2", T.StringType(), True),
        T.StructField("class3", T.StringType(), True),
        T.StructField("class1_id", T.StringType(), True),
        T.StructField("class2_id", T.StringType(), True),
        T.StructField("class3_id", T.StringType(), True),
        T.StructField("fs_type", T.StringType(), True),
        T.StructField("period", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("crawl_time", T.StringType(), True),
    ]
)

# facts as produced by the extract kernel, before the corp_map broadcast
# join fills corp_name (the join stays in Catalyst, not in the UDF).
FACTS_PRE_JOIN = T.StructType(
    [f for f in FACTS.fields if f.name != "corp_name"]
)

# ---------------------------------------------------------------------------
# crawl_metrics — per-round per-partition lineage counters (north_rule:
# fetched / deduped / failed / robots_blocked).
# ---------------------------------------------------------------------------
CRAWL_METRICS = T.StructType(
    [
        T.StructField("round_id", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def ddl(schema: T.StructType) -> str:
    """Schema as a DDL string (for mapInPandas / applyInPandas)."""
    return schema.simpleString()[len("struct<") : -1].replace(":", " ")
