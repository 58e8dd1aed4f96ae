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

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_CRAWL_DELAY_MS = 1000

# ---------------------------------------------------------------------
# robots.txt parsing (REP, RFC 9309): user-agent groups, multiple
# Allow/Disallow lines, longest-path-match precedence (Allow wins ties),
# crawl-delay.  The reference has no robots handling at all — its
# analog is the hard-coded report-name filter + global sleep
# (dart_api_manager.py:298-326, 44-46).
# ---------------------------------------------------------------------

ROBOTS_RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("prefix", T.StringType(), False),
                        T.StructField("allow", T.BooleanType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("crawl_delay_ms", T.LongType(), True),
    ]
)

# Extended rules dim emitted by robots_rules_from_txt: each rule carries
# the literal prefix up to the first wildcard (cheap Catalyst prefilter),
# an anchored Java regex when the raw rule used RFC 9309 '*'/'$' special
# characters (null otherwise — the common case never pays a regex), and
# the raw rule's octet length for most-specific-match precedence.
ROBOTS_RULES_WILD_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("prefix", T.StringType(), False),
                        T.StructField("pattern", T.StringType(), True),
                        T.StructField("allow", T.BooleanType(), False),
                        T.StructField("rlen", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("crawl_delay_ms", T.LongType(), True),
    ]
)


def _rule_to_match(path_rule: str) -> tuple[str, str | None]:
    """RFC 9309 rule path → (literal_prefix, anchored_regex|None).

    '*' matches any run of octets; a TRAILING '$' anchors the end of the
    path ('$' anywhere else is a literal).  Rules without either special
    character return (rule, None) and match by plain prefix."""
    if "*" not in path_rule and not path_rule.endswith("$"):
        return path_rule, None
    end_anchor = path_rule.endswith("$")
    body = path_rule[:-1] if end_anchor else path_rule
    parts = body.split("*")
    regex = "^" + ".*".join(re.escape(p) for p in parts)
    if end_anchor:
        regex += "$"
    return parts[0], regex


def parse_robots_txt(
    text: str, user_agent: str = "dart-xbrl-crawler"
) -> tuple[list[tuple[str, bool]], int | None]:
    """robots.txt body → ([(path_prefix, allow)], crawl_delay_ms|None).

    Group selection per RFC 9309 §2.2.1: the group whose user-agent
    token is the LONGEST match for our product token wins; ``*`` is the
    fallback.  Empty Disallow means allow-all (dropped).  Crawl-delay
    is read from the chosen group (de-facto extension, seconds)."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None
        in_group_body = False

    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if value:  # empty Disallow = allow everything = no rule
                cur_rules.append((value, field == "allow"))
        elif field == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = float(value)
            except ValueError:
                pass
    flush()

    best: tuple[int, list[tuple[str, bool]], float | None] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif a in ua:
                score = len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules, delay)
    if best is None:
        return [], None
    # Clamp to ≥1 ms: 'Crawl-delay: 0' (or negative) means "no delay
    # requested", NOT "divide the round budget by zero" — an unclamped 0
    # crashes the budget division under ANSI mode and silently starves
    # the host under non-ANSI (null budget passes no branch filter).
    delay_ms = max(1, int(best[2] * 1000)) if best[2] is not None else None
    return best[1], delay_ms


def robots_rules_from_txt(
    spark: SparkSession,
    robots_txt: DataFrame,
    user_agent: str = "dart-xbrl-crawler",
) -> DataFrame:
    """(host, robots_txt) → rules dim matching ROBOTS_RULES_WILD_SCHEMA
    (literal prefix + optional anchored regex for '*'/'$' rules + raw
    rule length for precedence).  Tiny-dim path: parsing runs in a
    pandas UDF batch; the result is broadcast by apply_robots."""
    import pandas as pd

    def parse(it):
        for pdf in it:
            hosts, rules_col, delays = [], [], []
            for host, txt in zip(pdf["host"], pdf["robots_txt"]):
                rules, delay = parse_robots_txt(txt or "", user_agent)
                hosts.append(host)
                structs = []
                for p, a in rules:
                    prefix, pattern = _rule_to_match(p)
                    structs.append(
                        {
                            "prefix": prefix,
                            "pattern": pattern,
                            "allow": a,
                            "rlen": len(p),
                        }
                    )
                rules_col.append(structs)
                delays.append(delay)
            yield pd.DataFrame(
                {"host": hosts, "rules": rules_col, "crawl_delay_ms": delays}
            )

    return robots_txt.mapInPandas(parse, schema=ROBOTS_RULES_WILD_SCHEMA)


def robots_from_pages(
    pages: DataFrame, user_agent: str = "dart-xbrl-crawler"
) -> DataFrame:
    """Derive the parsed-rules dim from fetched ``/robots.txt`` pages —
    closes the crawl loop: round N's fetches feed round N+1's gating.

    Selection is pure Catalyst (path == '/robots.txt' on the canonical
    url; latest fetch per host wins by warc_ts then url_hash); only the
    tiny robots subset reaches the python parser.  Output matches
    ROBOTS_RULES_WILD_SCHEMA and broadcasts in apply_robots."""
    from ..functions.urls import with_url_canon

    src = pages if "url_canon" in pages.columns else with_url_canon(pages)
    path = F.parse_url(F.col("url_canon"), F.lit("PATH"))
    robots_pages = src.filter(path == "/robots.txt").select(
        "host",
        F.col("html").cast("binary").alias("body"),
        F.col("warc_ts") if "warc_ts" in src.columns else F.lit(None).cast(
            "timestamp"
        ).alias("warc_ts"),
        F.col("url_hash") if "url_hash" in src.columns else F.lit(0).alias(
            "url_hash"
        ),
    )
    latest = (
        robots_pages.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.col("warc_ts").desc_nulls_last(), F.col("url_hash").asc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        # permissive decode: a server that answers /robots.txt with
        # binary garbage must not kill the round (links.decode_permissive
        # contract) — invalid bytes become U+FFFD and match no REP rule
        .select(
            "host",
            F.make_valid_utf8(F.col("body").cast("string")).alias(
                "robots_txt"
            ),
        )
    )
    return robots_rules_from_txt(latest.sparkSession, latest, user_agent)


def _eval_rules(path):
    """Longest-match REP evaluation as ONE Catalyst expression over the
    broadcast rules array — no row multiplication, no UDF.  Struct
    max-ordering on (rule_length, allow) makes Allow win exact-length
    ties, per Google/RFC-9309 semantics.  Rules are normalized structs
    (prefix, pattern, allow, rlen): the literal prefix prefilters cheap,
    the regex (only present for '*'/'$' rules) decides wildcard rules."""
    matched = F.filter(
        F.col("rules"),
        lambda r: path.startswith(r["prefix"])
        & (r["pattern"].isNull() | F.regexp_like(path, r["pattern"])),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(r["rlen"].alias("l"), r["allow"].alias("allow")),
        )
    )
    return F.when(best.isNotNull(), ~best["allow"]).otherwise(F.lit(False))


def _normalize_rules(rules_col, rules_type: T.ArrayType):
    """Lift a plain (prefix, allow) rules array into the wildcard-aware
    (prefix, pattern, allow, rlen) shape so one evaluator serves both."""
    names = rules_type.elementType.names  # type: ignore[union-attr]
    if "pattern" in names:
        return rules_col
    return F.transform(
        rules_col,
        lambda r: F.struct(
            r["prefix"].alias("prefix"),
            F.lit(None).cast("string").alias("pattern"),
            r["allow"].alias("allow"),
            F.length(r["prefix"]).cast("int").alias("rlen"),
        ),
    )


def apply_robots(
    frontier: DataFrame, robots: DataFrame, broadcast_robots: bool = True
) -> DataFrame:
    """Mark rows blocked by robots rules; adds ``robots_blocked`` and
    ``crawl_delay_ms``.

    ``broadcast_robots`` (default True) forces a broadcast join — right
    for the common case of a dim orders of magnitude smaller than the
    frontier.  Pass False when the dim itself is web-scale (10^7-10^8
    hosts × rules arrays): a forced broadcast of that would OOM the
    driver, while the plain equality join shuffles only the dim side
    against the frontier's existing distribution (AQE picks the
    strategy, including its own broadcast if the dim turns out small).

    Accepts either dim shape:
      * parsed-rules dim (host, rules array<struct<prefix,allow>>,
        crawl_delay_ms) from robots_rules_from_txt — full REP
        longest-match semantics;
      * legacy single-prefix dim (host, disallow_prefix,
        crawl_delay_ms) — treated as one Disallow rule."""
    side = F.broadcast if broadcast_robots else (lambda df: df)
    path = F.parse_url(F.col("url_canon"), F.lit("PATH"))
    if "rules" in robots.columns:
        rules_type = robots.schema["rules"].dataType
        dim = robots.select(
            "host",
            _normalize_rules(F.col("rules"), rules_type).alias("rules"),
            F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)).alias(
                "crawl_delay_ms"
            ),
        )
        joined = frontier.join(side(dim), "host", "left")
        blocked = F.when(
            F.col("rules").isNotNull(), _eval_rules(path)
        ).otherwise(F.lit(False))
        return joined.withColumn("robots_blocked", blocked).withColumn(
            "crawl_delay_ms",
            F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)),
        ).drop("rules")
    rules = robots.select(
        "host",
        "disallow_prefix",
        F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)).alias(
            "crawl_delay_ms"
        ),
    )
    joined = frontier.join(side(rules), "host", "left")
    blocked = F.col("disallow_prefix").isNotNull() & path.startswith(
        F.col("disallow_prefix")
    )
    return joined.withColumn(
        "robots_blocked", F.coalesce(blocked, F.lit(False))
    ).withColumn(
        "crawl_delay_ms",
        F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)),
    )


def apply_backoff(
    robots: DataFrame,
    host_stats: DataFrame,
    factor: float = 4.0,
    max_multiplier: float = 16.0,
    broadcast: bool = True,
) -> DataFrame:
    """Adaptive politeness: scale each host's crawl delay by its
    observed failure rate — delay × (1 + factor·fail_rate), capped.
    A host erroring on every fetch ends up factor+1× slower; a clean
    host keeps its robots/default delay exactly.  host_stats comes from
    FrontierStore.host_stats (the per-host metrics chain — never a
    frontier scan); the reference has no analog (its single loop simply
    sleeps a constant).  Returns a robots dim of the same shape with
    adjusted crawl_delay_ms, so it drops into pop_round unchanged.

    Failing hosts OUTSIDE the robots dim (newly discovered hosts get
    the default delay without a robots row) are appended with null
    rules and the default delay so backoff covers every observed host —
    a left join into robots alone would silently exempt them.  Both
    legs stay broadcast-friendly: a full-outer join can't broadcast-
    hash, so this is left-join + anti-join-union instead.  Pass
    ``broadcast=False`` when the dims are themselves web-scale (10^8
    hosts) — the joins fall back to shuffle joins under AQE."""
    side = F.broadcast if broadcast else (lambda df: df)
    stats = host_stats.select("host", "fail_rate")
    mult = F.least(
        F.lit(1.0) + F.lit(factor) * F.coalesce("fail_rate", F.lit(0.0)),
        F.lit(max_multiplier),
    )
    base_delay = F.coalesce(
        F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)
    )
    known = robots.join(side(stats), "host", "left")
    missing = stats.join(
        side(robots.select("host")), "host", "left_anti"
    )
    for field in robots.schema.fields:
        if field.name in ("host", "crawl_delay_ms"):
            continue
        missing = missing.withColumn(
            field.name, F.lit(None).cast(field.dataType)
        )
    missing = missing.withColumn(
        "crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS).cast("long")
    ).select(*known.columns)
    return (
        known.unionByName(missing)
        .withColumn("crawl_delay_ms", F.ceil(base_delay * mult).cast("long"))
        .drop("fail_rate")
    )


def pop_round(
    frontier: DataFrame,
    robots: DataFrame,
    round_ms: int = 60_000,
    salt_buckets: int = 32,
    max_per_host: int | None = None,
    exact_rank_max: int = 100_000,
    broadcast_hosts_max: int = 262_144,
    n_hosts_hint: int | None = None,
    broadcast_robots: bool = True,
) -> DataFrame:
    """Select this round's fetch set.

    Returns the frontier columns + ``robots_blocked`` + ``host_rank`` +
    ``selected`` + ``partition_salt`` so the caller can transition
    states (selected → fetch; robots_blocked → terminal) and
    repartition by (host, partition_salt) for the fetch stage.
    ``broadcast_robots=False`` for a web-scale rules dim (see
    apply_robots).
    """
    gated = apply_robots(
        frontier, robots, broadcast_robots=broadcast_robots
    ).withColumn(
        "partition_salt",
        F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int"),
    )
    # ≥1 ms guard: a rules dim built outside parse_robots_txt may carry
    # crawl_delay_ms=0 ("no delay requested") — clamp instead of ANSI
    # DIVIDE_BY_ZERO / a silent null budget that starves the host.
    budget = F.floor(
        F.lit(round_ms) / F.greatest(F.lit(1), F.col("crawl_delay_ms"))
    )
    if max_per_host is not None:
        budget = F.least(budget, F.lit(max_per_host))
    gated = gated.withColumn("_budget", budget)

    # Per-host candidate counts: hosts whose whole queue fits the budget
    # (the common case, including under-filled giant hosts) BYPASS
    # ranking entirely — Amdahl's law otherwise pins the round on the
    # one task that sorts the giant host.  counts is one row per host —
    # a few thousand at DART shape but up to 10^8 on the open web, so
    # the broadcast is GATED on the true cardinality: the aggregate is
    # materialized once (localCheckpoint truncates the lineage so the
    # count and the join reuse the same blocks; cleanup rides the
    # ContextCleaner), counted, and only broadcast when it fits —
    # otherwise a plain shuffle join with AQE skew-split takes over
    # instead of OOMing the driver on a forced 10^8-row broadcast.
    counts = (
        gated.filter(~F.col("robots_blocked"))
        .groupBy("host")
        .agg(F.count("*").alias("_n_cand"))
    )
    if n_hosts_hint is not None:
        # caller-supplied cardinality bound: zero extra jobs — straight
        # broadcast when it fits, straight shuffle join when it doesn't
        counts_side = (
            F.broadcast(counts) if n_hosts_hint <= broadcast_hosts_max else counts
        )
    else:
        counts = counts.localCheckpoint(eager=True)
        counts_side = (
            F.broadcast(counts)
            if counts.count() <= broadcast_hosts_max
            else counts
        )
    gated = gated.join(counts_side, "host", "left").withColumn(
        "_n_cand", F.coalesce("_n_cand", F.lit(0))
    )
    over = F.col("_n_cand") > F.col("_budget")

    # The frame splits BEFORE any window — windows only ever touch
    # over-budget hosts' candidates:
    #   bypass branch — under-budget hosts (and every robots-blocked
    #   row): no ranking work at all.  host_rank is null here: a rank
    #   was never computed (the old salt-bucket pseudo-rank was
    #   misleading), and nothing downstream consumes it.
    #   ranked branch — phase 1: window over (host, salt): any row in
    #   the true global top-k of its host has <k rows above it, hence
    #   <k above it in its own salt bucket → salt-rank ≤ k.  Skew-free
    #   (salt spreads the giant host over `salt_buckets` tasks) and
    #   cuts survivors to ≤ budget·salt_buckets per host.
    #   phase 2 — exact window over (host) on phase-1 survivors only, a
    #   linear continuation of the same pipeline (no join-back, no
    #   full-frame re-sort).  A when()-guarded window over the full
    #   frame instead would sort every bypass host's whole queue into
    #   one task (the giant host = one straggler; measured as the
    #   8→32-core anti-scaling culprit).
    #   quota branch — over-budget hosts whose budget EXCEEDS
    #   exact_rank_max: ranking millions of rows per host would funnel
    #   the phase-2 sort into one task however it's expressed (k-sized
    #   sorts don't salt).  A politeness budget is a capacity bound,
    #   not an exact-order contract at that magnitude, so each salt
    #   bucket gets an equal slot quota (⌊budget/S⌋, remainder spread
    #   one-per-bucket to salts < budget%S — deterministic), selection
    #   is bucket-local rank ≤ quota, and host_rank stays null (no
    #   global rank was computed).  With hash-uniform salting every
    #   bucket holds ≥ quota candidates whenever n_cand exceeds the
    #   budget by the multinomial deviation, so the host pops exactly
    #   its budget; the constraint ≤ budget holds unconditionally.
    null_rank = F.lit(None).cast("int")
    bypass = gated.filter(~over | F.col("robots_blocked")).select(
        *gated.columns,
        (~F.col("robots_blocked")).alias("selected"),
        null_rank.alias("host_rank"),
    )

    cand = gated.filter(over & ~F.col("robots_blocked"))
    order = [
        F.col("priority").desc(),
        F.col("discovered_ts").asc(),
        F.col("url_hash").asc(),
    ]
    w1 = Window.partitionBy("host", "partition_salt").orderBy(*order)

    # Regime split BEFORE the window, not after: quota_mode is constant
    # per host (budget derives from the host's crawl delay) and w1
    # partitions by (host, salt), so filtering whole hosts out ahead of
    # the window leaves _rn1 for the remaining hosts unchanged — while
    # each branch's window Exchange now carries only its own regime's
    # rows.  The previous shape filtered AFTER the window (the regime
    # predicate is not a partition-key column, so Catalyst cannot push
    # it below the Window) and therefore shuffled+sorted the full
    # candidate set once per branch — with one giant quota-regime host
    # that was two redundant full sorts of ~60% of the frontier.
    quota_mode = F.col("_budget") > F.lit(exact_rank_max)
    s = F.lit(salt_buckets)
    quota = F.floor(F.col("_budget") / s) + F.when(
        F.col("partition_salt") < F.pmod(F.col("_budget"), s), F.lit(1)
    ).otherwise(F.lit(0))
    quota_rows = (
        cand.filter(quota_mode)
        .withColumn("_rn1", F.row_number().over(w1))
        .select(
            *gated.columns,
            (F.col("_rn1") <= quota).alias("selected"),
            null_rank.alias("host_rank"),
        )
    )

    exact = cand.filter(~quota_mode).withColumn("_rn1", F.row_number().over(w1))
    losers = exact.filter(F.col("_rn1") > F.col("_budget")).select(
        *gated.columns,
        F.lit(False).alias("selected"),
        null_rank.alias("host_rank"),
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    surv = (
        exact.filter(F.col("_rn1") <= F.col("_budget"))
        .withColumn("_rn2", F.row_number().over(w2))
        .select(
            *gated.columns,
            (F.col("_rn2") <= F.col("_budget")).alias("selected"),
            F.col("_rn2").cast("int").alias("host_rank"),
        )
    )

    return (
        bypass.unionByName(quota_rows)
        .unionByName(losers)
        .unionByName(surv)
        .drop("_n_cand", "_budget", "disallow_prefix")
    )


def fetch_partitioning(
    selected: DataFrame,
    n_partitions: int | None = None,
    target_rows_per_task: int = 5_000,
) -> DataFrame:
    """Spread the selected set for the fetch stage: co-locate by host
    for connection reuse, salt so a giant host spans many tasks.

    ``n_partitions=None`` (the default) derives the task count from the
    selected set itself — ceil(|selected| / target_rows_per_task),
    floored at the session's default parallelism — so a 10× larger
    politeness budget gets proportionally more fetch tasks without the
    caller re-tuning a constant.  The count is an aggregation over the
    pop's already-persisted output, never a second frontier scan."""
    if n_partitions is None:
        n = selected.count()
        n_partitions = max(
            -(-n // target_rows_per_task),
            selected.sparkSession.sparkContext.defaultParallelism,
        )
    return selected.repartition(n_partitions, "host", "partition_salt")
