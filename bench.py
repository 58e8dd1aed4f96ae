#!/usr/bin/env python
"""Benchmark harness.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workloads:
  * headline catalog queries at $SPARK_GRAFT_SF_DIR (default sf0.1),
    materialized via the noop sink (all columns computed, nothing kept);
  * crawl pipeline: synth skewed frontier → canonicalize → bloom dedup →
    politeness pop (frontier_pops/s) → extract kernel (pages/s);
  * scaling evidence (north_rule): the same extract + frontier-pop jobs
    at local[8] vs local[32] in fresh subprocesses on the SAME input →
    throughput at both + efficiency = (T8/T32)/(32/8).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_DOCS (default 120000), SPARK_GRAFT_SKIP_SCALING=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q01_pricing_summary",
    "q02_dim_join_revenue",
    "q05_top5_per_customer",
    "q18_distinct_counts",
    "q21_host_budget_topk",
    "q24_dedup_exact",
    "q28_fingerprint",
    "q30_minhash_lsh",
    "q32_cosine_topk",
]


def _noop_materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _cpu_calibration() -> dict:
    """Measure THIS HOST's effective parallel speedup 8→32 procs with a
    pure-python burn (no Spark).  The sandbox VM is co-tenant: observed
    same-day swings from 30.7× to 17.6× aggregate speedup at 32 procs.
    Scaling efficiency of Spark jobs is reported both raw and against
    this machine ceiling."""
    import multiprocessing as mp

    def burn(q):
        t0 = time.time()
        x = n = 0
        while time.time() - t0 < 2.0:
            for i in range(100000):
                x += i * i
            n += 1
        q.put(n)

    agg = {}
    for N in (8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(N)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        agg[N] = sum(q.get() for _ in ps)
    return {
        "burn_agg_8": agg[8],
        "burn_agg_32": agg[32],
        "machine_speedup_8_to_32": round(agg[32] / agg[8], 3),
    }


def _crawl_subprocess(cores: int, pages_path: str, n_urls: int) -> dict:
    """Measure the crawl jobs in a FRESH JVM at `cores`: warm-up pass,
    then best-of-2 (in-process session reuse and leaked caches poison
    repeated measurements — measured 10× swings; a clean subprocess per
    point is the only stable protocol on this box)."""
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from dart_xbrl_crawler_spark.session import get_spark
from dart_xbrl_crawler_spark.plans import bench_support as B
spark = get_spark("scale{cores}", cores={cores}, shuffle_partitions={cores})
B.extract_job(spark, {pages_path!r})          # warm workers + page cache
B.frontier_scale_job(spark, 50_000)
r = dict(cores={cores})
for name, fn in (("ext", lambda: B.extract_job(spark, {pages_path!r})),
                 ("pop", lambda: B.frontier_scale_job(spark, {n_urls}))):
    spark.catalog.clearCache()
    t0 = time.time(); n = fn()
    r["t_" + name], r["n_" + name] = time.time() - t0, n
print("RESULT " + json.dumps(r))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"crawl run at {cores} cores failed:\n{out.stderr[-2000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    from dart_xbrl_crawler_spark.plans import bench_support as B
    from dart_xbrl_crawler_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    qs = E.queries()
    timings: dict[str, float] = {}

    # warm the JVM/Arrow paths once so per-query timings are stable
    _noop_materialize(qs["q01_pricing_summary"](spark, sf_dir))

    for name in HEADLINE:
        t0 = time.time()
        _noop_materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # crawl pipeline over a synthesized skewed frontier ------------------
    pages_dir = os.path.join(
        tempfile.gettempdir(), f"bench_pages_{n_docs}"
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        t0 = time.time()
        B.synth_pages(spark, n_docs, n_parts=cpus * 4).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        timings["crawl_synth"] = round(time.time() - t0, 3)
    spark.stop()

    n_urls = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "500000"))

    # interleave the parallelism points (8, 32, 8, 32) and take the
    # per-config best: the co-tenant host drifts on minute timescales,
    # so alternating exposes both configs to the same conditions
    def _best(runs: list[dict]) -> dict:
        out = dict(runs[0])
        for r in runs[1:]:
            for part in ("ext", "pop"):
                if r["t_" + part] < out["t_" + part]:
                    out["t_" + part] = r["t_" + part]
                    out["n_" + part] = r["n_" + part]
        return out

    skip_scaling = os.environ.get("SPARK_GRAFT_SKIP_SCALING") == "1"
    lo = hi = None
    if not skip_scaling:
        try:
            lo_runs, hi_runs = [], []
            for _ in range(2):
                lo_runs.append(_crawl_subprocess(8, pages_dir, n_urls))
                hi_runs.append(_crawl_subprocess(32, pages_dir, n_urls))
            lo, hi = _best(lo_runs), _best(hi_runs)
        except Exception as exc:  # scaling must never eat the JSON line
            print(f"scaling runs failed: {exc}", file=sys.stderr)
            skip_scaling = True
    if skip_scaling and hi is None:
        main = _crawl_subprocess(cpus, pages_dir, n_urls)
    else:
        main = hi if cpus == 32 else lo
    timings["crawl_frontier_pop"] = round(main["t_pop"], 3)
    timings["crawl_extract"] = round(main["t_ext"], 3)
    throughput = {
        "frontier_pops_per_s": round(main["n_pop"] / main["t_pop"], 1),
        "pages_per_s": round(main["n_ext"] / main["t_ext"], 1),
        "n_docs": n_docs,
        "n_urls": n_urls,
    }

    # scaling evidence: N vs 4N parallelism on the same input ------------
    if not skip_scaling:
        calib = _cpu_calibration()
        t8 = lo["t_pop"] + lo["t_ext"]
        t32 = hi["t_pop"] + hi["t_ext"]
        machine_ceiling = min(4.0, calib["machine_speedup_8_to_32"])
        throughput["scaling"] = {
            "cores_lo": 8,
            "cores_hi": 32,
            "pages_per_s_8": round(lo["n_ext"] / lo["t_ext"], 1),
            "pages_per_s_32": round(hi["n_ext"] / hi["t_ext"], 1),
            "pops_per_s_8": round(lo["n_pop"] / lo["t_pop"], 1),
            "pops_per_s_32": round(hi["n_pop"] / hi["t_pop"], 1),
            "efficiency": round((t8 / t32) / 4.0, 3),
            "efficiency_vs_machine_ceiling": round(
                (t8 / t32) / machine_ceiling, 3
            ),
            **calib,
        }
        timings["scaling_8"] = round(t8, 3)
        timings["scaling_32"] = round(t32, 3)

    result = {
        "metric": "headline queries + crawl pipeline (frontier pops, extract pages)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "throughput": throughput,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
