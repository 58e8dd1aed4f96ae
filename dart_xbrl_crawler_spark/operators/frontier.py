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
    ):
        self.table = MergeTable(path, key="url_hash")
        self.metrics = SnapshotTable(path + "_metrics")
        self.bloom = SnapshotTable(path + "_bloom")
        self.n_bloom_shards = n_bloom_shards
        self.expected_keys = expected_keys

    def _commit_bloom_batch(
        self, spark: SparkSession, hashes: DataFrame, note: str
    ) -> None:
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
            return self.table.commit_base(frontier, note="bootstrap")
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
            fresh = (
                D.dedup_urls(canon, frontier, bloom, self.n_bloom_shards)
                .withColumn("depth", F.lit(depth))
                .withColumn("state", F.lit("queued"))
                .withColumn("discovered_ts", F.to_timestamp(F.lit(run_ts)))
                .withColumn("fetch_ts", F.lit(None).cast("timestamp"))
                .withColumn("partition_salt", F.lit(0))
                .select("url_hash", *[c for c in frontier.columns if c != "url_hash"])
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            n_in = batch.count()
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
        n_partitions: int = 32,
    ) -> tuple[str, DataFrame]:
        """Pop a politeness-bounded batch, 'fetch' it (bytes come from
        the pages table — the sandbox stand-in for HTTP), transition
        states, commit ONE delta snapshot holding only the touched rows.
        Returns (snapshot_id, fetched pages DataFrame ready for the
        extract stage)."""
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
        # are rewritten (append-only MERGE, SURVEY.md §2.9)
        trans = (
            ok.select("url_hash", F.lit("fetched").alias("new_state"))
            .unionByName(
                missing.select("url_hash", F.lit("failed").alias("new_state"))
            )
            .unionByName(
                popped.filter(F.col("robots_blocked")).select(
                    "url_hash", F.lit("robots_blocked").alias("new_state")
                )
            )
        )
        changed = (
            frontier.join(trans, "url_hash")  # inner: O(|round|) rows out
            .withColumn("state", F.col("new_state"))
            .withColumn(
                "fetch_ts",
                F.when(
                    F.col("new_state") == "fetched", F.to_timestamp(F.lit(run_ts))
                ).otherwise(F.col("fetch_ts")),
            )
            .drop("new_state")
            .select(*frontier.columns)
        )
        snap = self.table.commit_delta(spark, changed, note=f"round={round_id}")

        # per-partition lineage counters (north_rule) over the merged
        # post-commit state — cheap count aggregate, no extra write of
        # frontier rows
        merged = self.table.read(spark)
        metrics = (
            merged.groupBy(
                F.lit(round_id).alias("round_id"),
                F.spark_partition_id().alias("partition_id"),
                "state",
            )
            .count()
            .withColumnRenamed("count", "n")
        )
        self.metrics.commit(metrics, note=f"round={round_id}")

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
        return snap, fetched_pages

    def state_counts(self, spark: SparkSession) -> dict[str, int]:
        rows = (
            self.table.read(spark).groupBy("state").count().collect()
        )
        return {r["state"]: r["count"] for r in rows}
