"""The crawl frontier: state machine + round driver + lineage.

Replaces the reference's /tmp sidecars + directory rescans
(/root/reference/xbrl_batch_processor.py:86-166,
dart_api_manager.py:543-578) with a snapshot-checkpointed MERGE table:
every round appends one immutable DELTA snapshot holding only the rows
it changed (O(|round|) bytes — never a full-frontier rewrite, which at
10^10 rows would be the pipeline's scale-killer); readers reconstruct
state last-wins-by-key, and the chain compacts periodically.  A killed
round leaves the previous snapshot chain authoritative, so resume is
simply "read latest and go" (idempotent — tested by kill-and-resume).

States: queued → fetched | failed | robots_blocked;
new URLs entering the frontier that are already seen → deduped (they
are counted, not inserted twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.urls import with_url_canon
from ..sources.checkpoint import MergeTable, SnapshotTable
from . import dedup as D
from . import politeness as P


class FrontierStore:
    """``expected_keys`` fixes the Bloom bitmap sizing for the table's
    lifetime so per-insert filters OR-merge with the stored one (same
    m_bits per shard) — the filter is a durable artifact built
    incrementally from each batch, never rebuilt from the full frontier
    (at 10^10 rows a rebuild is a full scan per insert).  Exactness
    never depends on it: an overgrown filter only raises fpp, and every
    flagged hash is exactly confirmed in the shard cogroup."""

    def __init__(
        self,
        path: str,
        n_bloom_shards: int = 64,
        expected_keys: int = 1 << 22,
        compact_every: int = 16,
        expire_keep_last: int | None = None,
        storage: str = "parquet",
        n_buckets: int = 64,
        metrics_compact_every: int = 64,
        seen_filter: str | None = None,
        filter_keep_last: int = 4,
    ):
        if storage == "bucketed":
            # 10^10-row layout: base bucketed by url_hash → merge-on-read
            # and every url_hash join reuse the bucket layout instead of
            # shuffling the frontier (sources/checkpoint.BucketedMergeTable)
            import re as _re

            from ..sources.checkpoint import BucketedMergeTable

            prefix = _re.sub(r"[^A-Za-z0-9_]", "_", path.strip("/"))[-48:].lstrip("_")
            self.table = BucketedMergeTable(
                path,
                table_prefix=f"frontier_{prefix}",
                key="url_hash",
                n_buckets=n_buckets,
                compact_every=compact_every,
            )
        else:
            self.table = MergeTable(
                path,
                key="url_hash",
                compact_every=compact_every,
                expire_keep_last=expire_keep_last,
            )
        self.table_path = path
        self.host_metrics = SnapshotTable(path + "_host_metrics")
        self.metrics = SnapshotTable(path + "_metrics")
        self.bloom = SnapshotTable(path + "_bloom")
        self.n_bloom_shards = n_bloom_shards
        self.expected_keys = expected_keys
        # metrics chains grow one snapshot per round/insert; past this
        # many they fold into running sums (read_all stays O(1) files)
        self.metrics_compact_every = metrics_compact_every
        # 'bloom' (OR-merge incremental) or 'cuckoo' (insert/delete
        # incremental — supports retiring keys on expiry, which a Bloom
        # structurally cannot); both probe through the same dedup plan.
        # The choice is a STORE property, not a session one: it persists
        # in a config sidecar so a later process (e.g. the CLI's expire)
        # reopens the store with the right filter semantics; an explicit
        # conflicting argument is an error, not a silent mix.
        self.seen_filter = self._resolve_seen_filter(path, seen_filter)
        # every filter commit is a FULL filter image (at the 10^10-url
        # design point ≈ 12 GB for the bloom) — an unbounded chain is a
        # real disk leak over a long crawl.  Keep the last few (enough
        # to pair with MergeTable rollbacks of recent snapshots); the
        # latest is the only one reads ever touch.
        self.filter_keep_last = filter_keep_last
        # previous round's fetch cache: must outlive run_round's return
        # (fetched_pages derives from it) but not the NEXT round —
        # released at the following run_round / release()
        self._prev_fetched: DataFrame | None = None
        # legacy-store queue undercount (see lineage_counts) — measured
        # once per process by an exact scan, then applied as an offset
        self._queued_correction: int | None = None

    @staticmethod
    def _resolve_seen_filter(path: str, requested: str | None) -> str:
        import json
        import os

        if requested is not None and requested not in ("bloom", "cuckoo"):
            raise ValueError(f"unknown seen_filter {requested!r}")
        cfg_path = path + "_config.json"
        stored = None
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                stored = json.load(f).get("seen_filter")
        if stored is not None:
            if requested is not None and requested != stored:
                raise ValueError(
                    f"store at {path} was created with seen_filter="
                    f"{stored!r}; cannot reopen as {requested!r}"
                )
            return stored
        # no stored config: resolve but do NOT stamp here — a read-only
        # open (status/a pre-bootstrap probe) must not pin the filter
        # kind.  The stamp happens at the first WRITE (_stamp_config
        # from bootstrap/insert), so every created store is pinned and
        # a later conflicting explicit reopen still errors.
        return requested or "bloom"

    def _stamp_config(self) -> None:
        """Persist the resolved filter kind at store-creation time (the
        first write path) if not already pinned."""
        import json
        import os

        cfg_path = self.table_path + "_config.json"
        if os.path.exists(cfg_path):
            return
        os.makedirs(os.path.dirname(cfg_path) or ".", exist_ok=True)
        tmp = cfg_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"seen_filter": self.seen_filter}, f)
        os.replace(tmp, cfg_path)

    def _commit_bloom_batch(
        self, spark: SparkSession, hashes: DataFrame, note: str
    ) -> None:
        """Fold a batch of url_hashes into the stored seen filter —
        bloom: partial build + OR-merge; cuckoo: shard-aligned
        incremental insert into the stored tables."""
        self._stamp_config()  # first write pins the filter kind
        if self.seen_filter == "cuckoo":
            if self.bloom.snapshots():
                merged = D.cuckoo_insert(
                    self.bloom.read(spark),
                    hashes,
                    n_shards=self.n_bloom_shards,
                    expected_per_shard=self.expected_keys // self.n_bloom_shards + 1,
                )
            else:
                merged = D.build_cuckoo_filter(
                    hashes,
                    n_shards=self.n_bloom_shards,
                    expected_keys=self.expected_keys,
                )
            self.bloom.commit(merged, note=note)
            self.bloom.expire(self.filter_keep_last)
            return
        batch = D.build_seen_filter(
            hashes,
            n_shards=self.n_bloom_shards,
            expected_keys=self.expected_keys,
        )
        if self.bloom.snapshots():
            merged = D.merge_seen_filters(self.bloom.read(spark), batch)
        else:
            merged = batch
        self.bloom.commit(merged, note=note)
        self.bloom.expire(self.filter_keep_last)

    def retire_seen(self, spark: SparkSession, hashes: DataFrame) -> None:
        """Remove url_hashes from the seen filter (cuckoo only —
        deletion is the capability the cuckoo variant exists for;
        e.g. retiring expired frontier rows so their urls can recrawl).
        Commits a new filter snapshot."""
        if self.seen_filter != "cuckoo":
            raise ValueError("retire_seen requires seen_filter='cuckoo'")
        self.bloom.commit(
            D.cuckoo_delete(
                self.bloom.read(spark), hashes, n_shards=self.n_bloom_shards
            ),
            note="retire",
        )
        self.bloom.expire(self.filter_keep_last)

    def _commit_insert_metrics(
        self, spark: SparkSession, fresh: DataFrame, n_fresh: int, n_dup: int
    ) -> None:
        """Lineage rows for an insert: per-partition queued counts for
        the rows that entered + one 'deduped' counter (a lineage state,
        not a table state — duplicates are counted, never inserted).
        All inputs are already-materialized caches: O(|batch|)."""
        parts = []
        if n_fresh:
            parts.append(
                fresh.groupBy(
                    F.lit(-1).alias("round_id"),
                    F.spark_partition_id().alias("partition_id"),
                    F.lit("queued").alias("state"),
                )
                .count()
                .withColumnRenamed("count", "n")
            )
        if n_dup:
            parts.append(
                spark.createDataFrame(
                    [(-1, -1, "deduped", n_dup)],
                    schema="round_id int, partition_id int, state string, n long",
                )
            )
        if parts:
            m = parts[0]
            for p in parts[1:]:
                m = m.unionByName(p)
            self.metrics.commit(m, note="insert lineage")

    # -- bootstrap -----------------------------------------------------
    def bootstrap(self, urls: DataFrame, run_ts: str) -> str:
        """urls(url, priority [, seed_rcp_no]) → initial queued frontier.
        Canonicalize once, dedup within the batch (first-wins on the
        canonical hash — deterministic via priority desc, url asc)."""
        canon = with_url_canon(urls)
        if "seed_rcp_no" not in canon.columns:
            canon = canon.withColumn("seed_rcp_no", F.lit(None).cast("string"))
        ranked = canon.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url_hash").orderBy(
                    F.col("priority").desc(), F.col("url").asc()
                )
            ),
        )
        frontier = (
            ranked.filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("depth", F.lit(0))
            .withColumn("state", F.lit("queued"))
            .withColumn("discovered_ts", F.to_timestamp(F.lit(run_ts)))
            .withColumn("fetch_ts", F.lit(None).cast("timestamp"))
            .withColumn("partition_salt", F.lit(0))
        )
        # bloom first (see insert() for the ordering argument); persist:
        # the canonicalizer UDF lineage feeds both the bloom build and
        # the base commit
        frontier = frontier.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            spark = urls.sparkSession
            self._commit_bloom_batch(
                spark, frontier.select("url_hash"), "bootstrap"
            )
            snap = self.table.commit_base(frontier, note="bootstrap")
            self._commit_insert_metrics(spark, frontier, frontier.count(), 0)
            return snap
        finally:
            frontier.unpersist()

    # -- insert newly-discovered urls (dedup vs whole frontier) ---------
    def insert(
        self, spark: SparkSession, urls: DataFrame, run_ts: str, depth: int = 1
    ) -> tuple[str, int, int]:
        """Dedup incoming urls against the frontier (bloom prefilter +
        shard-aligned exact confirm), append survivors as a queued DELTA
        (O(|batch|) bytes).  Returns (snapshot_id, n_inserted,
        n_deduped).

        The batch is persisted once and every count comes off that
        cache — the round-1 version recomputed the canonicalizer +
        dedup lineage three times (canon.count, fresh.count, commit).
        The Bloom filter is the STORED one, incrementally OR-merged with
        this batch's filter afterwards — one O(|batch|) build per
        insert, never a rebuild from the full frontier."""
        frontier = self.table.read(spark)
        batch = with_url_canon(urls).dropDuplicates(["url_hash"]).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            canon = batch
            if "seed_rcp_no" not in canon.columns:
                canon = canon.withColumn("seed_rcp_no", F.lit(None).cast("string"))
            if "priority" not in canon.columns:
                canon = canon.withColumn("priority", F.lit(0.0))
            if self.bloom.snapshots():
                bloom = self.bloom.read(spark)
            else:  # recovery / legacy store: rebuild once from the table
                self._commit_bloom_batch(
                    spark, frontier.select("url_hash"), "rebuild"
                )
                bloom = self.bloom.read(spark)
            n_in = batch.count()
            seen = frontier
            if self.seen_filter == "cuckoo":
                # expired rows are tombstones: retire_seen already pulled
                # their hashes from the filter, but a filter false
                # positive (~1.2e-4 at 16-bit tags) would exact-confirm
                # against the tombstone row itself and permanently dedup
                # a url expire() promised could resurrect — the exact
                # confirm must never see tombstones
                seen = frontier.filter(F.col("state") != "expired")
            fresh = (
                D.dedup_urls(
                    canon,
                    seen,
                    bloom,
                    self.n_bloom_shards,
                    # overlap ≤ |batch| — keeps dedup's zero-extra-action
                    # broadcast plan whenever the batch itself is small
                    max_confirmed_hint=n_in,
                )
                .withColumn("depth", F.lit(depth))
                .withColumn("state", F.lit("queued"))
                .withColumn("discovered_ts", F.to_timestamp(F.lit(run_ts)))
                .withColumn("fetch_ts", F.lit(None).cast("timestamp"))
                .withColumn("partition_salt", F.lit(0))
                .select("url_hash", *[c for c in frontier.columns if c != "url_hash"])
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            n_fresh = fresh.count()
            # bloom FIRST, frontier delta second: a crash in between
            # leaves extra bloom keys (harmless — exact confirm rejects
            # them), while the reverse order could leave a frontier row
            # the filter doesn't know → a later duplicate insert would
            # last-wins reset that row's state
            if n_fresh:
                self._commit_bloom_batch(
                    spark, fresh.select("url_hash"), f"insert depth={depth}"
                )
            snap = self.table.commit_delta(
                spark, fresh, note=f"insert depth={depth}"
            )
            self._commit_insert_metrics(spark, fresh, n_fresh, n_in - n_fresh)
            fresh.unpersist()
            return snap, n_fresh, n_in - n_fresh
        finally:
            batch.unpersist()

    # -- one crawl round -------------------------------------------------
    def run_round(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        run_ts: str,
        round_id: int = 0,
        round_ms: int = 60_000,
        salt_buckets: int = 32,
        max_per_host: int | None = None,
        n_partitions: int | None = None,
        n_hosts_hint: int | None = None,
        broadcast_robots: bool = True,
    ) -> tuple[str, DataFrame]:
        """Pop a politeness-bounded batch, 'fetch' it (bytes come from
        the pages table — the sandbox stand-in for HTTP), transition
        states, commit ONE delta snapshot holding only the touched rows.
        Returns (snapshot_id, fetched pages DataFrame ready for the
        extract stage).

        Metrics-chain compaction deliberately does NOT run here: the
        returned fetched_pages (and the incoming backoff-adjusted
        robots) carry lazy lineage into the chain files, and compaction
        deletes them.  run_crawl folds the chains between rounds;
        callers driving run_round directly over many rounds should call
        ``_maybe_compact_metrics`` between rounds the same way."""
        # release the PREVIOUS round's fetch cache (it had to outlive
        # that round's return — fetched_pages derives from it)
        if self._prev_fetched is not None:
            self._prev_fetched.unpersist()
            self._prev_fetched = None

        frontier = self.table.read(spark)
        queued = frontier.filter(F.col("state") == "queued")

        # popped feeds three consumers (fetch set, robots transitions,
        # lineage) → materialize once
        popped = P.pop_round(
            queued,
            robots,
            round_ms=round_ms,
            salt_buckets=salt_buckets,
            max_per_host=max_per_host,
            n_hosts_hint=n_hosts_hint,
            broadcast_robots=broadcast_robots,
        ).persist(StorageLevel.MEMORY_AND_DISK)

        selected = popped.filter(F.col("selected"))
        fetch_in = P.fetch_partitioning(selected, n_partitions)

        # fetch = equi-join bytes by canonical url (pages keyed the same
        # way once, at ingest)
        page_bytes = (
            with_url_canon(pages)
            .select("url_hash", "html", "warc_ts")
            .dropDuplicates(["url_hash"])
        )
        fetched = fetch_in.join(page_bytes, "url_hash", "left").persist(
            StorageLevel.MEMORY_AND_DISK
        )

        ok = fetched.filter(F.col("html").isNotNull())
        missing = fetched.filter(F.col("html").isNull())

        # state transitions → DELTA rows: only the touched frontier rows
        # are rewritten (append-only MERGE, SURVEY.md §2.9).  popped
        # already carries every frontier column, so the delta derives
        # straight from the round's own (persisted) frames — NO second
        # read of the full frontier: the only O(|frontier|) work in a
        # round is the pop's own scan.
        fcols = frontier.columns
        fetch_ts = F.to_timestamp(F.lit(run_ts))
        # fetch_ts stamps EVERY transition (fetched = success time,
        # failed = attempt time, robots_blocked = decision time) — the
        # freshness loop's `fetch_ts < cutoff` predicates must be able
        # to select failed/blocked rows for retry/expiry; a NULL there
        # made those states permanently terminal (never matched)
        changed = (
            ok.withColumn("state", F.lit("fetched"))
            .withColumn("fetch_ts", fetch_ts)
            .select(*fcols)
            .unionByName(
                missing.withColumn("state", F.lit("failed"))
                .withColumn("fetch_ts", fetch_ts)
                .select(*fcols)
            )
            .unionByName(
                popped.filter(F.col("robots_blocked"))
                .withColumn("state", F.lit("robots_blocked"))
                .withColumn("fetch_ts", fetch_ts)
                .select(*fcols)
            )
        )
        snap = self.table.commit_delta(spark, changed, note=f"round={round_id}")

        # per-partition lineage counters (north_rule): derived from the
        # round's OWN delta (cached upstream frames) — O(|round|), never
        # a post-commit scan of the merged 10^10-row frontier.  Running
        # totals come from folding the metrics chain (lineage_counts).
        metrics = (
            changed.groupBy(
                F.lit(round_id).alias("round_id"),
                F.spark_partition_id().alias("partition_id"),
                "state",
            )
            .count()
            .withColumnRenamed("count", "n")
        )
        self.metrics.commit(metrics, note=f"round={round_id}")
        # per-host outcome counters — the input to adaptive politeness
        # backoff (politeness.apply_backoff); O(|round| hosts) rows
        self.host_metrics.commit(
            changed.groupBy(F.lit(round_id).alias("round_id"), "host", "state")
            .count()
            .withColumnRenamed("count", "n"),
            note=f"round={round_id}",
        )

        fetched_pages = ok.select(
            "url",
            "url_canon",
            "url_hash",
            "host",
            "seed_rcp_no",
            "priority",
            "host_rank",
            "html",
            "warc_ts",
        )
        popped.unpersist()  # snapshot committed — drop the round's caches
        self._prev_fetched = fetched  # released at the next round's start
        return snap, fetched_pages

    # -- recrawl / expiry ----------------------------------------------
    def recrawl(
        self,
        spark: SparkSession,
        before_ts: str,
        states: tuple[str, ...] = ("fetched", "failed"),
    ) -> int:
        """Re-queue rows whose fetch is older than ``before_ts`` — the
        freshness loop every production crawler runs (the reference
        re-downloads nothing, ever).  One O(|frontier|) scan selects the
        stale rows; the commit is an O(|stale|) delta flipping them back
        to 'queued' (last-wins merge), so the next pop_round refetches
        them under the normal politeness budget.  The seen filter is
        untouched: these urls remain known — rediscovered copies must
        keep deduping while the refetch is pending."""
        frontier = self.table.read(spark)
        stale = frontier.filter(
            F.col("state").isin(*states)
            & (F.col("fetch_ts") < F.to_timestamp(F.lit(before_ts)))
        )
        # localCheckpoint, not persist: `changed` is consumed AFTER
        # commit_delta flips these very rows to 'queued' — a lost cache
        # block would recompute the filter over the post-commit frontier
        # and silently see nothing; checkpointing truncates the lineage
        # so the pre-commit selection is pinned (same pattern as
        # dedup_urls' confirmed set)
        changed = stale.withColumn("state", F.lit("queued")).withColumn(
            "fetch_ts", F.lit(None).cast("timestamp")
        ).localCheckpoint(eager=True)
        n = changed.count()
        if n:
            self.table.commit_delta(spark, changed, note=f"recrawl<{before_ts}")
            self.metrics.commit(
                changed.groupBy(
                    F.lit(-3).alias("round_id"),
                    F.spark_partition_id().alias("partition_id"),
                    F.lit("queued").alias("state"),
                )
                .count()
                .withColumnRenamed("count", "n"),
                note="recrawl lineage",
            )
        return n

    def recrawl_hints(self, spark: SparkSession, hints) -> int:
        """Targeted freshness: re-queue exactly the urls a sitemap/feed
        advertises as changed (``hints`` = (url, lastmod) from
        functions.links.extract_sitemap_entries — q73's output shape),
        instead of recrawl()'s blanket timestamp cutoff.

        Shape: canonicalize the hint urls (one Arrow batch over
        O(|hints|) rows), one equality join on url_hash against the
        frontier, flip rows whose fetch predates the advertised
        lastmod.  The commit is an O(|stale|) delta; the frontier scan
        is the join's build side at 10^10 rows — bucketed on url_hash,
        so the hint side shuffles, the base doesn't.  Lastmod accepts
        both W3C forms (date-only and full ISO 8601); unparseable
        hints are dropped, surfaced by the returned count only."""
        from ..functions.urls import with_url_canon

        lastmod_ts = F.coalesce(
            F.try_to_timestamp(F.col("lastmod")),
            F.try_to_timestamp(
                F.col("lastmod"), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")
            ),
            F.try_to_timestamp(F.col("lastmod"), F.lit("yyyy-MM-dd")),
        )
        h = (
            with_url_canon(hints.select("url", "lastmod"))
            .select("url_hash", lastmod_ts.alias("_lastmod"))
            .filter(F.col("_lastmod").isNotNull())
            .groupBy("url_hash")
            .agg(F.max("_lastmod").alias("_lastmod"))
        )
        frontier = self.table.read(spark)
        stale = (
            frontier.join(h, "url_hash")
            .filter(
                F.col("state").isin("fetched", "failed")
                & (F.col("fetch_ts") < F.col("_lastmod"))
            )
            .drop("_lastmod")
        )
        changed = stale.withColumn("state", F.lit("queued")).withColumn(
            "fetch_ts", F.lit(None).cast("timestamp")
        ).localCheckpoint(eager=True)  # pin pre-commit selection
        n = changed.count()
        if n:
            self.table.commit_delta(spark, changed, note="recrawl-hints")
            self.metrics.commit(
                changed.groupBy(
                    F.lit(-3).alias("round_id"),
                    F.spark_partition_id().alias("partition_id"),
                    F.lit("queued").alias("state"),
                )
                .count()
                .withColumnRenamed("count", "n"),
                note="recrawl-hints lineage",
            )
        return n

    def expire(
        self,
        spark: SparkSession,
        before_ts: str,
        states: tuple[str, ...] = ("fetched", "failed", "robots_blocked"),
    ) -> int:
        """Retire terminal rows older than ``before_ts`` from the crawl:
        an O(|expired|) delta marks them ``state='expired'`` (a terminal
        tombstone — the row stays for lineage/time-travel) and, on a
        cuckoo-backed store, their hashes leave the seen filter, so a
        LATER rediscovery inserts a fresh queued row whose last-wins
        merge resurrects the url.  Reference analog: the 7-day mtime
        cleanup (/root/reference/dart_api_manager.py:582-602), as state
        data instead of filesystem deletes.  On a bloom-backed store the
        filter keeps the hash (deletions are impossible there) — expired
        urls then stay deduped until a compaction rebuild; that asymmetry
        is exactly why the cuckoo variant exists."""
        frontier = self.table.read(spark)
        old = frontier.filter(
            F.col("state").isin(*states)
            & (F.col("fetch_ts") < F.to_timestamp(F.lit(before_ts)))
        )
        # localCheckpoint, not persist: retire_seen reads `changed` AFTER
        # commit_delta has flipped these rows to 'expired' — if a cache
        # block were lost in between, the recomputed filter (state in
        # `states`) would match nothing post-commit, retire_seen would
        # delete nothing from the cuckoo filter, and the expired urls
        # could never resurrect.  Checkpointing pins the pre-commit rows.
        changed = old.withColumn("state", F.lit("expired")).localCheckpoint(
            eager=True
        )
        n = changed.count()
        if n:
            self.table.commit_delta(spark, changed, note=f"expire<{before_ts}")
            self.metrics.commit(
                changed.groupBy(
                    F.lit(-3).alias("round_id"),
                    F.spark_partition_id().alias("partition_id"),
                    F.lit("expired").alias("state"),
                )
                .count()
                .withColumnRenamed("count", "n"),
                note="expire lineage",
            )
            if self.seen_filter == "cuckoo":
                self.retire_seen(spark, changed.select("url_hash"))
        return n

    def _maybe_compact_metrics(self, spark: SparkSession) -> None:
        """Bound the metrics chains: past ``metrics_compact_every``
        snapshots, fold each chain into running sums (round_id/
        partition_id = -2 marker rows, same schema) in ONE atomic
        manifest swap (SnapshotTable.rewrite).  Every consumer
        (lineage_counts, host_stats) aggregates sums, so folding is
        exact; only per-round detail beyond the fold point is dropped.
        Without this, host_stats re-reads O(rounds × hosts) files every
        round — fine for max_rounds=5, unbounded for a long crawl."""
        if len(self.metrics.snapshots()) > self.metrics_compact_every:
            folded = (
                self.metrics.read_all(spark)
                .groupBy("state")
                .agg(F.sum("n").alias("n"))
                .select(
                    F.lit(-2).cast("int").alias("round_id"),
                    F.lit(-2).cast("int").alias("partition_id"),
                    "state",
                    "n",
                )
            )
            self.metrics.rewrite(folded, note="metrics compact")
        if len(self.host_metrics.snapshots()) > self.metrics_compact_every:
            folded = (
                self.host_metrics.read_all(spark)
                .groupBy("host", "state")
                .agg(F.sum("n").alias("n"))
                .select(
                    F.lit(-2).cast("int").alias("round_id"),
                    "host",
                    "state",
                    "n",
                )
            )
            self.host_metrics.rewrite(folded, note="host metrics compact")

    def release(self) -> None:
        """Drop the last round's fetch cache.  Called when a crawl loop
        exits (run_crawl does) — without it the final round's cache
        holds storage memory for the rest of the session."""
        if self._prev_fetched is not None:
            self._prev_fetched.unpersist()
            self._prev_fetched = None

    # -- the full crawl loop -------------------------------------------
    def run_crawl(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        run_ts: str,
        max_rounds: int = 5,
        round_ms: int = 60_000,
        salt_buckets: int = 32,
        max_per_host: int | None = None,
        n_partitions: int | None = None,
        discover: bool = True,
        text_out: str | None = None,
        backoff_factor: float | None = None,
        priority_decay: float = 1.0,
        broadcast_robots: bool = True,
        respect_nofollow: bool = True,
        drop_traps: bool = True,
        drop_assets: bool = True,
    ) -> list[dict]:
        """The reference's main orchestration loop (crawl → extract →
        repeat, /root/reference/lambda_function.py:133-221) as a
        frontier-driven iteration: pop a politeness-bounded batch,
        'fetch' it, DISCOVER links from the fetched html (extract_links
        — pure Catalyst) and insert them as the next depth, until the
        queue drains or ``max_rounds``.  Each round is one delta commit;
        a kill anywhere resumes from the last published snapshot.
        Returns per-round summaries (lineage counters).

        Discovered links INHERIT priority: ``max(parent_priority) −
        priority_decay`` over all parents seen this round, so a
        high-priority seed's frontier subtree outranks a low-priority
        seed's at every depth instead of degenerating to flat 0.0
        (insertion-order popping).

        ``respect_nofollow`` (default on, like CCBot/Nutch) honors the
        robots html companion during discovery: meta-robots-nofollow
        pages contribute no links, rel="nofollow" hrefs are dropped.

        ``drop_traps`` (default on, Heritrix-style) gates discovered
        links through functions.traps.is_trap BEFORE the dedup
        shuffle — calendar descents, segment-echo loops, and facet
        grids never reach the frontier (or the seen-filter).

        ``drop_assets`` (default on, CCBot-style) drops discovered
        links whose path ends in a static-asset extension (css/js/
        media/archives — functions.traps.is_static_asset); a text
        crawl would fetch those bytes only to discard them."""
        from ..functions.links import extract_links

        summaries: list[dict] = []
        try:
            self._crawl_loop(
                spark, pages, robots, run_ts, max_rounds, round_ms,
                salt_buckets, max_per_host, n_partitions, discover,
                text_out, backoff_factor, priority_decay, extract_links,
                summaries, broadcast_robots, respect_nofollow,
                drop_traps, drop_assets,
            )
        finally:
            self.release()
        return summaries

    def _crawl_loop(
        self, spark, pages, robots, run_ts, max_rounds, round_ms,
        salt_buckets, max_per_host, n_partitions, discover, text_out,
        backoff_factor, priority_decay, extract_links, summaries,
        broadcast_robots=True, respect_nofollow=True, drop_traps=True,
        drop_assets=True,
    ) -> None:
        for rid in range(max_rounds):
            # compact the metrics chains BETWEEN rounds, never inside
            # one: compaction rewrites the chains and GCs the old
            # snapshot dirs, and a round's live frames (popped, fetched,
            # the backoff-adjusted robots) all carry lazy lineage into
            # those files — a lost cache block after an in-round
            # compaction would recompute through deleted dirs and throw.
            # Here nothing is live yet: the previous round's fetch cache
            # is released first (its consumers all ran last iteration),
            # and this round's robots frame is built AFTER the fold.
            self.release()
            self._maybe_compact_metrics(spark)
            # O(|metrics|) queue check — never a frontier scan.  A store
            # written before lineage metrics existed has no chain yet:
            # fall back to the exact count once (its first round commits
            # metrics and every later check is chain-based).
            try:
                queued = self.lineage_counts(spark).get("queued", 0)
            except FileNotFoundError:
                queued = self.state_counts(spark).get("queued", 0)
            if queued == 0:
                break
            robots_rid = robots
            if backoff_factor is not None and rid > 0:
                # adaptive politeness: scale delays by the failure rates
                # observed in earlier rounds (per-host metrics chain)
                robots_rid = P.apply_backoff(
                    robots, self.host_stats(spark), factor=backoff_factor,
                    broadcast=broadcast_robots,
                )
            snap, fetched_pages = self.run_round(
                spark,
                pages,
                robots_rid,
                run_ts,
                round_id=rid,
                round_ms=round_ms,
                salt_buckets=salt_buckets,
                max_per_host=max_per_host,
                n_partitions=n_partitions,
                broadcast_robots=broadcast_robots,
            )
            n_fetched = fetched_pages.count()
            if text_out and n_fetched:
                # crawl → extract in one loop (the reference's
                # crawl-then-process orchestration): per-round text
                # extraction appended to a parquet sink.  ZIP payloads
                # run the XBRL kernel; generic html gets stripped text.
                # meta-robots-noindex pages are crawled (their links
                # still feed discovery) but stay out of the content sink
                from . import extract as X
                from ..functions.links import (
                    decode_permissive,
                    meta_robots_flags,
                )

                sink_pages = fetched_pages
                if respect_nofollow:
                    sink_pages = sink_pages.filter(
                        ~meta_robots_flags(
                            decode_permissive(F.col("html"))
                        )["noindex"]
                    )
                X.extract_text(
                    sink_pages.select("url", "html")
                    .withColumn("report_nm", F.lit(None).cast("string"))
                    .withColumn("rcept_dt", F.lit(None).cast("string")),
                    run_ts,
                ).write.mode("append").parquet(text_out)
            n_ins = n_dup = 0
            if discover and n_fetched:
                # carry the parent's priority through the explode (no
                # join-back); a link found under several parents takes
                # the BEST parent minus one decay step
                links = extract_links(
                    fetched_pages.select(
                        "url", "url_canon", "host", "priority", "html"
                    ),
                    carry=("priority",),
                    respect_nofollow=respect_nofollow,
                )
                # sitemap/feed pages are discovery channels too: their
                # <loc>/<link> entries join the edge set with the SAME
                # priority inheritance, carried through the explode
                # like extract_links does (no join-back).  All three
                # extractors are codegen regexp walks over the one
                # fetched frame — a non-sitemap page simply yields no
                # blocks, so this adds no extra scan and no python.
                from ..functions.links import (
                    extract_feed_entries,
                    extract_sitemap_entries,
                )

                src_pages = fetched_pages.select("url", "priority", "html")
                absolute = F.col("link").rlike("^https?://")
                sm = (
                    extract_sitemap_entries(src_pages, carry=("priority",))
                    .select("src_url", F.col("loc").alias("link"), "priority")
                    .filter(absolute)  # locs are absolute by spec
                )
                fd = (
                    extract_feed_entries(src_pages, carry=("priority",))
                    .select("src_url", "link", "priority")
                    .filter(absolute)
                )
                links = links.select(
                    "src_url", "link", "priority"
                ).unionByName(sm).unionByName(fd)
                if drop_traps:
                    # map-side gate BEFORE the dedup shuffle: trapped
                    # urls never cost a shuffle write or a seen-probe
                    from ..functions.traps import is_trap

                    links = links.filter(~is_trap(F.col("link")))
                if drop_assets:
                    from ..functions.traps import is_static_asset

                    links = links.filter(~is_static_asset(F.col("link")))
                discovered = (
                    links.groupBy(F.col("link").alias("url"))
                    .agg(
                        (F.max("priority") - F.lit(priority_decay)).alias(
                            "priority"
                        )
                    )
                )
                _, n_ins, n_dup = self.insert(
                    spark, discovered, run_ts, depth=rid + 1
                )
            summaries.append(
                {
                    "round_id": rid,
                    "snapshot": snap,
                    "fetched": n_fetched,
                    "discovered_new": n_ins,
                    "discovered_dup": n_dup,
                }
            )
            if n_fetched == 0 and n_ins == 0:
                break  # starved round and nothing new → stop

    def state_counts(self, spark: SparkSession) -> dict[str, int]:
        """EXACT per-state counts — one full scan of the merged table.
        Diagnostic surface (cheap at test scale, honest after manual
        rollbacks); the per-round / at-scale path is lineage_counts."""
        rows = (
            self.table.read(spark).groupBy("state").count().collect()
        )
        return {r["state"]: r["count"] for r in rows}

    def host_stats(self, spark: SparkSession) -> DataFrame:
        """(host, n_fetched, n_failed, fail_rate) folded from the
        per-host metrics chain — O(|hosts × rounds|) rows, never a
        frontier scan.  Feed to politeness.apply_backoff."""
        m = self.host_metrics.read_all(spark)
        return (
            m.groupBy("host")
            .pivot("state", ["fetched", "failed", "robots_blocked"])
            .sum("n")
            .select(
                "host",
                F.coalesce("fetched", F.lit(0)).alias("n_fetched"),
                F.coalesce("failed", F.lit(0)).alias("n_failed"),
                F.coalesce("robots_blocked", F.lit(0)).alias("n_robots_blocked"),
            )
            .withColumn(
                "fail_rate",
                F.col("n_failed")
                / F.greatest(F.col("n_fetched") + F.col("n_failed"), F.lit(1)),
            )
        )

    def lineage_counts(self, spark: SparkSession) -> dict[str, int]:
        """Per-state counts folded from the metrics chain — O(|metrics|)
        rows read, NEVER a frontier scan (at 10^10 rows the scan this
        replaces was the one remaining per-round full-table cost).
        'deduped' is a lineage counter (duplicates counted at insert,
        never inserted); queued = inserts − transitions."""
        m = self.metrics.read_all(spark)
        agg = {
            r["state"]: int(r["n"])
            for r in m.groupBy("state").agg(F.sum("n").alias("n")).collect()
        }  # raises FileNotFoundError for a pre-metrics legacy store
        queued_in = agg.pop("queued", 0)
        out = {k: v for k, v in agg.items() if v}
        # 'deduped' is an insert-side counter and 'expired' transitions
        # FROM already-terminal states — neither consumes a queue slot
        n_trans = sum(v for k, v in agg.items() if k not in ("deduped", "expired"))
        if self._queued_correction is None and queued_in < n_trans:
            # store bootstrapped before insert metrics existed: the
            # chain undercounts inserts by a CONSTANT (the unrecorded
            # bootstrap rows).  One exact scan measures that offset;
            # it's memoized in-memory so a long run_crawl's per-round
            # drain checks stay O(|metrics|) — and a read accessor
            # never writes to the store (a concurrent or read-only
            # caller must be safe).
            exact_queued = self.state_counts(spark).get("queued", 0)
            self._queued_correction = exact_queued + n_trans - queued_in
        if self._queued_correction:
            queued_in += self._queued_correction
        if queued_in - n_trans:
            out["queued"] = max(0, queued_in - n_trans)
        return out
