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
    gated = apply_robots(frontier, robots)
    # ONE window pass: blocked rows sort last within their host, so
    # candidate ranks 1..k are identical to ranking candidates alone —
    # no filter+union (which would recompute the whole upstream twice)
    w = Window.partitionBy("host").orderBy(
        F.col("robots_blocked").asc(),
        F.col("priority").desc(),
        F.col("discovered_ts").asc(),
        F.col("url_hash").asc(),
    )
    budget = F.floor(F.lit(round_ms) / F.col("crawl_delay_ms"))
    if max_per_host is not None:
        budget = F.least(budget, F.lit(max_per_host))
    rn = F.row_number().over(w)
    ranked = (
        gated.withColumn("_rn", rn)
        .withColumn(
            "host_rank",
            F.when(~F.col("robots_blocked"), F.col("_rn")).cast("int"),
        )
        .withColumn(
            "selected",
            (~F.col("robots_blocked")) & (F.col("_rn") <= budget),
        )
        .drop("_rn")
    )
    return ranked.withColumn(
        "partition_salt",
        F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int"),
    ).drop("disallow_prefix")


def fetch_partitioning(selected: DataFrame, n_partitions: int) -> DataFrame:
    """Spread the selected set for the fetch stage: co-locate by host
    for connection reuse, salt so a giant host spans many tasks."""
    return selected.repartition(n_partitions, "host", "partition_salt")
