#!/usr/bin/env python
"""Extra noop-sink micro-benchmarks (guide §1.4) used during the r06
optimization round.  NOT part of the frozen driver bench — bench.py is
untouched; numbers from here are cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [target ...]
  targets: headline | insert | pop | extract | canon | all (default)

Each target is timed in THIS process (32-core session unless
SPARK_GRAFT_CPUS says otherwise) with the noop sink, best-of-N wall
seconds printed as one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("BENCH_EXTRA_REPEAT", "3"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _best(fn, n=REPEAT) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    targets = set(sys.argv[1:]) or {"all"}
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from dart_xbrl_crawler_spark.plans import bench_support as B
    from dart_xbrl_crawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "bench_extra", cores=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    sc = spark.sparkContext
    out: dict[str, float] = {}
    qs = E.queries()

    if targets & {"headline", "all"}:
        _noop(qs["q01_pricing_summary"](spark, SF))  # warm
        for name in (
            "q01_pricing_summary", "q02_dim_join_revenue",
            "q05_top5_per_customer", "q18_distinct_counts",
            "q21_host_budget_topk", "q24_dedup_exact", "q28_fingerprint",
            "q30_minhash_lsh", "q32_cosine_topk",
        ):
            sc.setJobDescription(f"bench_extra:{name}")
            out[name] = _best(lambda n=name: _noop(qs[n](spark, SF)))

    if targets & {"canon", "insert", "pop", "all"}:
        from dart_xbrl_crawler_spark.functions.urls import with_url_canon

        n_urls = int(os.environ.get("BENCH_EXTRA_URLS", "2000000"))
        if targets & {"canon", "all"}:
            sc.setJobDescription("bench_extra:canon")
            df = with_url_canon(B._batch_urls(spark, n_urls)).select(
                "url_canon", "host", "url_hash"
            )
            _noop(df)  # warm python workers
            out["canon_2m"] = _best(lambda: _noop(df))

        bench = B.CrawlBench(spark, n_urls, pop_mult=8)
        if targets & {"insert", "all"}:
            sc.setJobDescription("bench_extra:insert")
            out["insert_2m"] = _best(bench.insert_job)
        if targets & {"pop", "all"}:
            sc.setJobDescription("bench_extra:pop")
            out["pop_16m"] = _best(bench.pop_job)
            out["pop_probe_500k"] = _best(bench.pop_probe_job)

    if targets & {"extract", "all"}:
        pages_dir = os.environ.get(
            "BENCH_EXTRA_PAGES", "/dev/shm/bench_pages_60000"
        )
        if os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
            sc.setJobDescription("bench_extra:extract")
            B.extract_job(spark, pages_dir, limit=5_000)  # warm
            out["extract_60k"] = _best(
                lambda: B.extract_job(spark, pages_dir)
            )
        else:
            print("no pages dir; run bench.py once first", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
