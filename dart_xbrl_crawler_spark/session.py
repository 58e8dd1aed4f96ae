"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a 1000-executor cluster:
AQE on (runtime re-plan + skew-join splitting), shuffle partitions sized
to the parallelism level, Arrow enabled for every pandas-UDF boundary,
UTC session timezone so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# Arrow batch size: the extract UDF carries a BINARY html column; keep
# batches small enough that a batch of zipped payloads stays well under
# executor memory even at 100 TB scale (payloads up to ~10 MB each).
_ARROW_MAX_RECORDS = "2048"


def _local_dir() -> str:
    """Shuffle/spill scratch dir.  tmpfs is opt-in-ish: SPARK_GRAFT_TMPFS
    forces it on ('1') or off ('0'); unset, /dev/shm is used only when it
    has generous free space (≥16 GiB).  Unconditional tmpfs would make
    every shuffle spill consume RAM on any Linux host — a shuffle larger
    than tmpfs capacity fails the job, and 'spilling to disk' under
    memory pressure would consume MORE memory."""
    flag = os.environ.get("SPARK_GRAFT_TMPFS")
    if flag != "0" and os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            free = st.f_bavail * st.f_frsize
        except OSError:
            free = 0
        if flag == "1" or free >= 16 * 1024**3:
            path = "/dev/shm/spark_local"
            os.makedirs(path, exist_ok=True)
            return path
    return tempfile.gettempdir()


def get_spark(
    app_name: str = "dart_xbrl_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` → ``local[*]``; otherwise ``local[cores]``.  On a real
    cluster the master comes from spark-submit and these local settings
    are ignored — everything else below applies unchanged.
    """
    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env_cores) if env_cores else 0
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 32) if cores else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", _ARROW_MAX_RECORDS
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # no \r progress spam on stdout: harness output is parsed from
        # the process tail — progress bars can push the result line out
        .config("spark.ui.showConsoleProgress", "false")
        # keep partition-dir values as strings: corp_code=00000037 must
        # NOT read back as int 37 (zero-padded codes are an invariant,
        # /root/reference/xbrl_processor.py:274)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # bucketed tables (co-located joins) land here, not in cwd
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "spark_warehouse"),
        )
        # shuffle/spill files on tmpfs when available: the sandbox's /tmp
        # sits on a ~270 MB/s virtual disk that serializes 32 concurrent
        # shuffle writers (measured: the whole crawl round anti-scaled
        # 8→32 cores on disk I/O).  On a real cluster local dirs are
        # NVMe; tmpfs is the local-mode equivalent.
        .config("spark.local.dir", _local_dir())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
