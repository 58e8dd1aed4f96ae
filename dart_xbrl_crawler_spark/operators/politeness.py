"""Politeness scheduler: robots gating + per-host budgets as a window
top-k, with explicit salting for giant hosts.

Reference analog: a global 60 ms sleep (dart_api_manager.py:44-46,
199-205) and a 0.1 s inter-download pause (dart_api_manager.py:538) —
wall-clock throttling in one process.  Distributed, the budget becomes
*data*: each crawl round grants every host
``round_ms / crawl_delay_ms`` fetch slots; candidate URLs rank within
their host (priority desc, discovered_ts, url_hash — explicit
tie-breaks) and only ``rank <= budget`` rows are popped.

Skew: one giant host (dart.fss.or.kr, ≥60% of the frontier) would pin
one task.  The *budget* must be host-global (computed pre-salt via the
window), but the *fetch work* is salted: ``salt = pmod(url_hash, S)``
and a ``repartition(host, salt)`` spreads the giant host over S tasks.
AQE skew-join handles residual imbalance (session.py enables it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY_MS = 1000


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Mark rows blocked by robots rules: host fully blocked
    (disallow_prefix='/') or url path under the disallowed prefix.
    robots is a tiny dim → broadcast join.  Adds ``robots_blocked``."""
    rules = robots.select(
        "host",
        "disallow_prefix",
        F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)).alias(
            "crawl_delay_ms"
        ),
    )
    joined = frontier.join(F.broadcast(rules), "host", "left")
    path = F.parse_url(F.col("url_canon"), F.lit("PATH"))
    blocked = F.col("disallow_prefix").isNotNull() & path.startswith(
        F.col("disallow_prefix")
    )
    return joined.withColumn(
        "robots_blocked", F.coalesce(blocked, F.lit(False))
    ).withColumn(
        "crawl_delay_ms",
        F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)),
    )


def pop_round(
    frontier: DataFrame,
    robots: DataFrame,
    round_ms: int = 60_000,
    salt_buckets: int = 32,
    max_per_host: int | None = None,
) -> DataFrame:
    """Select this round's fetch set.

    Returns the frontier columns + ``robots_blocked`` + ``host_rank`` +
    ``selected`` + ``partition_salt`` so the caller can transition
    states (selected → fetch; robots_blocked → terminal) and
    repartition by (host, partition_salt) for the fetch stage.
    """
    gated = apply_robots(frontier, robots).withColumn(
        "partition_salt",
        F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int"),
    )
    budget = F.floor(F.lit(round_ms) / F.col("crawl_delay_ms"))
    if max_per_host is not None:
        budget = F.least(budget, F.lit(max_per_host))
    gated = gated.withColumn("_budget", budget)

    # Per-host candidate counts: hosts whose whole queue fits the budget
    # (the common case, including under-filled giant hosts) BYPASS
    # ranking entirely — Amdahl's law otherwise pins the round on the
    # one task that sorts the giant host.
    counts = (
        gated.filter(~F.col("robots_blocked"))
        .groupBy("host")
        .agg(F.count("*").alias("_n_cand"))
    )
    gated = gated.join(counts, "host", "left").withColumn(
        "_n_cand", F.coalesce("_n_cand", F.lit(0))
    )

    # Over-budget hosts rank in two phases:
    #   phase 1 — window over (host, salt): any row in the true global
    #   top-k of its host has <k rows above it, hence <k above it in its
    #   own salt bucket → salt-rank ≤ k.  Skew-free (salt spreads the
    #   giant host over `salt_buckets` tasks) and cuts survivors to
    #   ≤ budget·salt_buckets per host.
    #   phase 2 — exact window over (host) on survivors only.
    order = [
        F.col("robots_blocked").asc(),
        F.col("priority").desc(),
        F.col("discovered_ts").asc(),
        F.col("url_hash").asc(),
    ]
    w1 = Window.partitionBy("host", "partition_salt").orderBy(*order)
    ranked = gated.withColumn("_rn1", F.row_number().over(w1))

    over = F.col("_n_cand") > F.col("_budget")
    w2 = Window.partitionBy("host").orderBy(*order)
    # phase-2 rank computed only where it can matter; survivors of
    # phase 1 elsewhere get null and fall through to the bypass rule
    need2 = over & (F.col("_rn1") <= F.col("_budget")) & ~F.col("robots_blocked")
    ranked = ranked.withColumn(
        "_rn2",
        F.when(
            need2,
            F.row_number().over(
                Window.partitionBy("host", need2.cast("int")).orderBy(*order)
            ),
        ),
    )
    selected = (~F.col("robots_blocked")) & F.coalesce(
        F.when(over, F.col("_rn2") <= F.col("_budget")).otherwise(F.lit(True)),
        F.lit(False),  # over-budget non-survivors have null _rn2
    )
    host_rank = F.when(
        F.col("robots_blocked"), F.lit(None).cast("int")
    ).otherwise(
        F.when(over, F.col("_rn2")).otherwise(F.col("_rn1")).cast("int")
    )
    return (
        ranked.withColumn("selected", selected)
        .withColumn("host_rank", host_rank)
        .drop("_rn1", "_rn2", "_n_cand", "_budget", "disallow_prefix")
    )


def fetch_partitioning(selected: DataFrame, n_partitions: int) -> DataFrame:
    """Spread the selected set for the fetch stage: co-locate by host
    for connection reuse, salt so a giant host spans many tasks."""
    return selected.repartition(n_partitions, "host", "partition_salt")
