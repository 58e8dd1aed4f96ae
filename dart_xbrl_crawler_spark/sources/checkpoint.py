"""Snapshot-checkpointed tables: Iceberg semantics over plain parquet.

The design point is an Iceberg catalog (`df.writeTo(tbl)` + snapshot-id
time travel, hidden partitioning) — but the Iceberg runtime jar is not
in this environment, so the same contract is implemented directly:

* every commit writes a fresh immutable snapshot directory,
* a manifest (JSON, written atomically via tmp+rename) lists committed
  snapshots in order,
* readers resolve the latest committed snapshot — a killed writer can
  never corrupt a reader (its half-written dir is simply never
  committed),
* resume = read latest snapshot (or any pinned snapshot-id).

Swap point: ``IcebergTable`` below gates on the Spark catalog having
Iceberg support; when the jar is present it takes over with the same
API (append/overwrite/commit semantics mapping to real snapshots).
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Append-only snapshot-versioned parquet table."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)["snapshots"]

    def latest_snapshot_id(self) -> str | None:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else None

    def commit(self, df: DataFrame, note: str = "", kind: str = "base") -> str:
        """Write df as a new immutable snapshot; atomically publish it.
        ``kind`` is "base" (full table image) or "delta" (changed rows
        only — see MergeTable).  Returns the snapshot id."""
        snaps = self.snapshots()
        # monotonic, NOT len(snaps): expiry trims the manifest front, and
        # a reused seq would corrupt MergeTable's last-wins-by-_seq merge
        seq = (snaps[-1]["seq"] + 1) if snaps else 0
        snap_id = f"snap-{seq:06d}-{uuid.uuid4().hex[:8]}"
        snap_dir = os.path.join(self.path, snap_id)
        df.write.mode("overwrite").parquet(snap_dir)
        entry = {"id": snap_id, "seq": seq, "note": note, "kind": kind}
        self._publish(snaps + [entry])
        return snap_id

    def _publish(self, snaps: list[dict]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"snapshots": snaps}, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no committed snapshots at {self.path}")
        if snapshot_id is None:
            snapshot_id = snaps[-1]["id"]
        elif snapshot_id not in {s["id"] for s in snaps}:
            raise KeyError(f"unknown snapshot {snapshot_id}")
        return spark.read.parquet(os.path.join(self.path, snapshot_id))

    def read_all(self, spark: SparkSession) -> DataFrame:
        """Union of EVERY committed snapshot (append-only chains like
        per-round metrics, where each commit is an independent batch)."""
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no committed snapshots at {self.path}")
        return spark.read.parquet(
            *[os.path.join(self.path, s["id"]) for s in snaps]
        )

    def rewrite(self, df: DataFrame, note: str = "compact") -> str:
        """Replace the WHOLE chain with one snapshot holding ``df`` —
        the append-only chain's compaction primitive (metrics chains
        fold per-round counter rows into running sums).  Crash-safe in
        one atomic manifest swap: the fold dir is fully written first,
        then the manifest flips to reference ONLY it — a crash before
        the flip leaves an orphan dir (GC'd later), never a chain that
        double-counts fold + originals."""
        import shutil

        snaps = self.snapshots()
        seq = (snaps[-1]["seq"] + 1) if snaps else 0
        snap_id = f"snap-{seq:06d}-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, snap_id))
        self._publish([{"id": snap_id, "seq": seq, "note": note, "kind": "base"}])
        self._gc_orphans(shutil)
        return snap_id

    def rollback_to(self, snapshot_id: str) -> None:
        snaps = self.snapshots()
        keep = []
        for s in snaps:
            keep.append(s)
            if s["id"] == snapshot_id:
                break
        else:
            raise KeyError(f"unknown snapshot {snapshot_id}")
        self._publish(keep)

    def expire(self, keep_last: int) -> list[str]:
        """Retention: drop all but the last ``keep_last`` manifest
        entries, then GC every unreferenced snapshot dir (including
        orphans from crashed writers and past rollbacks).  Manifest
        FIRST, dirs second — a crash in between leaves unreferenced
        dirs (cleaned by the next expire), never a dangling manifest
        entry.  Returns the ids whose dirs were removed."""
        import shutil

        snaps = self.snapshots()
        if keep_last > 0 and len(snaps) > keep_last:
            self._publish(snaps[-keep_last:])
        return self._gc_orphans(shutil)

    def _gc_orphans(self, shutil) -> list[str]:
        live = {s["id"] for s in self.snapshots()}
        removed = []
        for d in os.listdir(self.path):
            if d.startswith("snap-") and d not in live:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
                removed.append(d)
        return removed


class MergeTable:
    """MERGE-INTO semantics over SnapshotTable: base images + append-only
    delta snapshots, last-wins-by-key reconstruction on read, periodic
    compaction.

    This is the scale-critical difference from full-rewrite snapshots
    (SURVEY.md §2.9): a crawl round touches |round| rows of a 10^10-row
    frontier, so the round commit must write O(|round|) bytes, not
    O(|frontier|).  Readers merge base+deltas with one last-wins
    aggregate per key — at scale the frontier is stored bucketed by
    pmod(url_hash, B) (Iceberg ``bucket(url_hash)`` hidden partitioning)
    and that merge needs no shuffle; compaction folds deltas back into a
    new base every ``compact_every`` deltas to bound read amplification.
    """

    def __init__(
        self,
        path: str,
        key: str = "url_hash",
        compact_every: int = 16,
        expire_keep_last: int | None = None,
    ):
        self.table = SnapshotTable(path)
        self.key = key
        self.compact_every = compact_every
        # retention applied after each auto-compaction; None = keep all
        self.expire_keep_last = expire_keep_last

    # -- commits ---------------------------------------------------------
    def commit_base(self, df: DataFrame, note: str = "") -> str:
        return self.table.commit(df, note=note, kind="base")

    def commit_delta(self, spark: SparkSession, df: DataFrame, note: str = "") -> str:
        """Append changed/new FULL rows (same schema as base); last
        write wins per key.  Auto-compacts when the delta chain exceeds
        ``compact_every``."""
        snap = self.table.commit(df, note=note, kind="delta")
        if len(self._deltas_since_base()) > self.compact_every:
            self.compact(
                spark,
                note=f"auto-compact after {note}",
                expire_keep_last=self.expire_keep_last,
            )
        return snap

    def _deltas_since_base(self) -> list[dict]:
        snaps = self.table.snapshots()
        out: list[dict] = []
        for s in snaps:
            if s.get("kind", "base") == "base":
                out = []
            else:
                out.append(s)
        return out

    def _latest_base(self) -> dict | None:
        base = None
        for s in self.table.snapshots():
            if s.get("kind", "base") == "base":
                base = s
        return base

    # -- read (merge-on-read) ---------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """Current state: base ∪ deltas, last-wins per key by commit
        sequence (``max_by`` aggregate — one hash shuffle on the key;
        zero-shuffle when the table is bucketed on the key)."""
        from pyspark.sql import functions as F

        base = self._latest_base()
        if base is None:
            raise FileNotFoundError(f"no base snapshot at {self.table.path}")
        parts = [
            self.table.read(spark, base["id"]).withColumn(
                "_seq", F.lit(int(base["seq"]))
            )
        ]
        for s in self._deltas_since_base():
            parts.append(
                self.table.read(spark, s["id"]).withColumn(
                    "_seq", F.lit(int(s["seq"]))
                )
            )
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.unionByName(p)
        if len(parts) == 1:
            return allp.drop("_seq")
        cols = [c for c in allp.columns if c != "_seq" and c != self.key]
        merged = allp.groupBy(self.key).agg(
            *[
                F.max_by(F.col(c), F.col("_seq")).alias(c)
                for c in cols
            ]
        )
        return merged.select(self.key, *cols)

    def compact(
        self,
        spark: SparkSession,
        note: str = "compact",
        expire_keep_last: int | None = None,
    ) -> str:
        """Fold base+deltas into a fresh base snapshot.  With
        ``expire_keep_last`` set, old snapshots beyond that many are
        expired afterwards and orphan dirs GC'd — without retention the
        store grows one full-table image per compaction, unbounded."""
        snap = self.commit_base(self.read(spark), note=note)
        if expire_keep_last is not None:
            self.expire_snapshots(expire_keep_last)
        return snap

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Retention that can never break reads: the latest base and
        every delta after it are ALWAYS kept (they reconstruct current
        state); beyond that, keep the last ``keep_last`` manifest
        entries for time travel.  Unreferenced dirs (expired, crashed
        writers, rollback leftovers) are deleted — manifest first, dirs
        second.  Reference analog: the 7-day download-retention cleanup
        (/root/reference/dart_api_manager.py:582-602), as snapshot
        retention instead of mtime deletes."""
        import shutil

        snaps = self.table.snapshots()
        base_idx = None
        for i, s in enumerate(snaps):
            if s.get("kind", "base") == "base":
                base_idx = i
        if base_idx is None:
            return []
        cut = min(base_idx, max(0, len(snaps) - keep_last))
        if cut > 0:
            self.table._publish(snaps[cut:])
        return self.table._gc_orphans(shutil)

    # -- snapshot surface (time travel works on the delta chain too:
    # rollback truncates the manifest; read() then merges the latest
    # base at-or-before the cut with the deltas after it) -------------
    def snapshots(self) -> list[dict]:
        return self.table.snapshots()

    def rollback_to(self, snapshot_id: str) -> None:
        self.table.rollback_to(snapshot_id)

    def snapshot_bytes(self, snapshot_id: str) -> int:
        """On-disk size of one snapshot (test/observability surface for
        the O(|round|)-bytes-per-commit invariant)."""
        d = os.path.join(self.table.path, snapshot_id)
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(d)
            for f in files
        )


class BucketedMergeTable:
    """MergeTable semantics with the BASE stored as a bucketed table
    (bucketBy(n_buckets, key), sorted by key) — the 10^10-row layout:

    * merge-on-read never shuffles the base.  read() is
      ``base LEFT ANTI latest_delta_keys ∪ latest_delta_rows``: the
      base side scans its bucket layout in place (EnsureRequirements
      shuffles only the small delta side to match the base's
      HashPartitioning), and the delta chain — O(rounds × |round|)
      rows between compactions — is the only thing that ever moves.
      The plain MergeTable's groupBy-max_by formulation instead
      re-shuffles the FULL table on every read.
    * deltas stay an append-only SnapshotTable chain (O(|round|) bytes
      per commit, crash-safe manifest), exactly as before.
    * compact() folds everything into a fresh bucketed base and resets
      the delta chain.

    Iceberg analog: ``bucket(N, url_hash)`` hidden partitioning with
    merge-on-read deletes + storage-partitioned joins; this is the same
    layout expressed through Spark's bucketed-table catalog.

    Warehouse-layout contract (real-metastore deployments): the base
    is registered as an EXTERNAL bucketed table at an explicit
    ``location`` under ``self.path`` (recorded in the manifest, so
    ``_ensure_registered`` re-registers after catalog loss — e.g. a
    fresh session with a default in-memory catalog).  ``expire``/
    ``compact`` GC by DELETING those location directories directly;
    with a shared Hive/Glue metastore, point ``path`` at storage this
    store exclusively owns — the store assumes nothing else writes
    under it, and a catalog-managed (non-external) table of the same
    name would not survive its warehouse-side deletes.  The Iceberg
    deployment path avoids hand-managed locations entirely:
    IcebergMergeTable below delegates GC to the catalog's own
    snapshot expiry."""

    def __init__(
        self,
        path: str,
        table_prefix: str,
        key: str = "url_hash",
        n_buckets: int = 64,
        compact_every: int = 16,
    ):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.table_prefix = table_prefix
        self.key = key
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        self.deltas = SnapshotTable(os.path.join(path, "deltas"))

    @property
    def _bases_path(self) -> str:
        return os.path.join(self.path, "BASES.json")

    def _bases(self) -> list[dict]:
        if not os.path.exists(self._bases_path):
            return []
        with open(self._bases_path) as f:
            return json.load(f)["bases"]

    def _publish_bases(self, bases: list[dict]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".bases.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"bases": bases}, f, indent=1)
        os.replace(tmp, self._bases_path)

    # -- commits --------------------------------------------------------
    def commit_base(self, df: DataFrame, note: str = "") -> str:
        from .bucketed import write_bucketed

        bases = self._bases()
        seq = (bases[-1]["seq"] + 1) if bases else 0
        tbl = f"{self.table_prefix}_base_{seq:06d}"
        # EXTERNAL table under the store path + schema recorded in the
        # manifest: the in-memory catalog entry dies with the session,
        # so read() re-registers from (location, schema_ddl, bucket
        # spec) — this is what makes kill-anywhere/resume hold for the
        # bucketed layout, not just the parquet MergeTable.
        loc = os.path.join(self.path, "bases", tbl)
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {tbl}")
        write_bucketed(
            df, tbl, key=self.key, n_buckets=self.n_buckets,
            sorted_by=self.key, path=loc,
        )
        self._publish_bases(
            bases
            + [{
                "table": tbl,
                "seq": seq,
                "note": note,
                "location": loc,
                "schema_ddl": df.schema.toDDL(),
            }]
        )
        # base published → the delta chain it supersedes resets
        self.deltas._publish([])
        self.deltas._gc_orphans(__import__("shutil"))
        return tbl

    def _ensure_registered(self, spark: SparkSession, base: dict) -> None:
        from .bucketed import register_bucketed

        if spark.catalog.tableExists(base["table"]):
            return
        if "location" not in base:  # legacy managed-table manifest entry
            raise FileNotFoundError(
                f"base table {base['table']} was written as a managed "
                "table by an earlier version and is not recoverable "
                "across sessions; re-bootstrap the store"
            )
        register_bucketed(
            spark,
            base["table"],
            base["location"],
            base["schema_ddl"],
            key=self.key,
            n_buckets=self.n_buckets,
            sorted_by=self.key,
        )

    def commit_delta(self, spark: SparkSession, df: DataFrame, note: str = "") -> str:
        snap = self.deltas.commit(df, note=note, kind="delta")
        if len(self.deltas.snapshots()) > self.compact_every:
            self.compact(spark, note=f"auto-compact after {note}")
        return snap

    # -- read (merge-on-read, base never shuffles) ----------------------
    def _latest_delta(self, spark: SparkSession) -> DataFrame | None:
        from pyspark.sql import functions as F

        snaps = self.deltas.snapshots()
        if not snaps:
            return None
        parts = [
            self.deltas.read(spark, s["id"]).withColumn("_seq", F.lit(int(s["seq"])))
            for s in snaps
        ]
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.unionByName(p)
        cols = [c for c in allp.columns if c not in ("_seq", self.key)]
        return allp.groupBy(self.key).agg(
            *[F.max_by(F.col(c), F.col("_seq")).alias(c) for c in cols]
        ).select(self.key, *cols)

    def read(self, spark: SparkSession) -> DataFrame:
        bases = self._bases()
        if not bases:
            raise FileNotFoundError(f"no base snapshot at {self.path}")
        self._ensure_registered(spark, bases[-1])
        base = spark.table(bases[-1]["table"])
        latest = self._latest_delta(spark)
        if latest is None:
            return base
        # base-side zero Exchange: the anti-join reuses the bucket
        # layout; only `latest` (small) shuffles to match it
        return base.join(
            latest.select(self.key), self.key, "left_anti"
        ).unionByName(latest.select(*base.columns))

    def compact(self, spark: SparkSession, note: str = "compact") -> str:
        import shutil

        tbl = self.commit_base(self.read(spark), note=note)
        # retention: drop superseded base tables (keep the new one).
        # Data is deleted BY PATH — DROP TABLE alone would silently
        # no-op in a later session (no catalog entry) and leak the
        # superseded bucket files under the store path forever.
        bases = self._bases()
        self._publish_bases(bases[-1:])  # manifest first, dirs second
        for b in bases[:-1]:
            spark.sql(f"DROP TABLE IF EXISTS {b['table']}")
            if "location" in b:
                shutil.rmtree(b["location"], ignore_errors=True)
        return tbl

    def snapshots(self) -> list[dict]:
        return [dict(kind="base", id=b["table"], **{k: b[k] for k in ("seq", "note")})
                for b in self._bases()] + self.deltas.snapshots()


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath (not in this
    sandbox; on a real cluster pass --packages org.apache.iceberg:…)."""
    try:
        spark._jvm.org.apache.iceberg.Table  # type: ignore[union-attr]
        return True
    except Exception:
        return False


class IcebergMergeTable:
    """The MergeTable contract on a REAL Iceberg catalog — the design
    point the parquet emulation above stands in for.  Requires the
    Iceberg Spark runtime jar plus a configured catalog, e.g.::

        --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:…
        --conf spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog
        --conf spark.sql.catalog.ice.type=hadoop
        --conf spark.sql.catalog.ice.warehouse=/path/wh

    Mapping (same API as MergeTable so FrontierStore can swap in):
      commit_base  → createOrReplace (new snapshot, full image)
      commit_delta → MERGE INTO on the key (upsert; Iceberg writes
                     only changed data files — the O(|round|) bytes
                     property comes from the format itself)
      read         → spark.table (current snapshot)
      snapshots    → the table's ``.snapshots`` metadata table
      rollback_to  → system.rollback_to_snapshot procedure
    Bucketed layout: ``bucket(N, key)`` hidden partitioning at create,
    so merge-on-read and key joins reuse the layout (the
    BucketedMergeTable analog) without a catalog bucket spec.

    Exercised by tests/test_round4_fixes.py::test_iceberg_merge_table
    when SPARK_GRAFT_ICEBERG=1 (skipped cleanly in this sandbox)."""

    _IDENT_RE = None  # compiled lazily; class-level to share

    def __init__(
        self,
        spark: SparkSession,
        ident: str,
        key: str = "url_hash",
        n_buckets: int | None = None,
    ):
        if not iceberg_available(spark):
            raise RuntimeError("Iceberg runtime not on the classpath")
        import re

        # ident/key are interpolated into SQL text (MERGE INTO has no
        # parameter binding for table names) — restrict them to plain
        # dotted identifiers so a caller can't smuggle SQL through them
        if IcebergMergeTable._IDENT_RE is None:
            IcebergMergeTable._IDENT_RE = re.compile(
                r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$"
            )
        for label, value in (("ident", ident), ("key", key)):
            if not IcebergMergeTable._IDENT_RE.match(value):
                raise ValueError(f"invalid {label!r}: {value!r}")
        self.spark = spark
        self.ident = ident
        self.key = key
        self.n_buckets = n_buckets
        # per-instance source-view name: a session-global "_ice_delta_src"
        # let concurrent tables in one session clobber each other's views
        self._src_view = f"_ice_delta_src_{id(self):x}"

    def commit_base(self, df: DataFrame, note: str = "") -> str:
        w = df.writeTo(self.ident).using("iceberg")
        if self.n_buckets:
            from pyspark.sql import functions as F

            w = w.partitionedBy(F.bucket(self.n_buckets, self.key))
        w.createOrReplace()
        return str(self._current_snapshot_id())

    def commit_delta(self, spark: SparkSession, df: DataFrame, note: str = "") -> str:
        df.createOrReplaceTempView(self._src_view)
        try:
            spark.sql(
                f"MERGE INTO {self.ident} t USING {self._src_view} s "
                f"ON t.{self.key} = s.{self.key} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            spark.catalog.dropTempView(self._src_view)
        return str(self._current_snapshot_id())

    def read(self, spark: SparkSession | None = None) -> DataFrame:
        return (spark or self.spark).table(self.ident)

    def snapshots(self) -> list[dict]:
        rows = self.spark.sql(
            f"SELECT snapshot_id, operation FROM {self.ident}.snapshots "
            "ORDER BY committed_at"
        ).collect()
        return [
            {"id": str(r["snapshot_id"]), "kind": r["operation"]} for r in rows
        ]

    def rollback_to(self, snapshot_id: str) -> None:
        catalog = self.ident.split(".", 1)[0]
        self.spark.sql(
            f"CALL {catalog}.system.rollback_to_snapshot"
            f"('{self.ident.split('.', 1)[1]}', {int(snapshot_id)})"
        )

    def _current_snapshot_id(self) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row["snapshot_id"])
