"""URL-seen dedup: partitioned Bloom filter + exact confirmation.

Reference analog: re-download avoidance by directory existence
(/root/reference/dart_api_manager.py:388-389) — a single-node trick that
cannot scale.  Here (north_rule): a **sharded Bloom filter** keyed by
``xxhash64(url_canon)``.

Scale design (10^10 URLs): ``P`` shards keyed ``pmod(url_hash, P)``.
Each shard's bitmap sizes for n/P keys — at 10^10 keys, 1% fpp,
P=4096 → ~3 MB per shard; a probe task holds exactly one shard bitmap
(cogroup-aligned), never the whole 12 GB filter.  Build is a partial
aggregate per shard (OR-merge associative), probe is shard-aligned
cogroup — no bitmap ever rides a broadcast or a row.

Exactness: Bloom has false positives, so ``dedup_urls`` uses the filter
only as a *prefilter*: rows flagged maybe-seen get an exact left-anti
join against the seen table.  No false negatives (property-tested) →
the surviving set is exactly frontier − seen.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("k_hashes", T.IntegerType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)

_LN2 = float(np.log(2.0))


def _bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for n keys at target fpp; m rounded up to a
    multiple of 64."""
    n = max(n, 1)
    m = int(np.ceil(-n * np.log(fpp) / (_LN2 * _LN2)))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round(m / n * _LN2)))
    return m, k


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates structured keys so bit
    positions stay uniform even for non-xxhash inputs."""
    z = h + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> Iterator[np.ndarray]:
    """k double-hashed bit positions per key; h2 forced odd so the
    stride cycles the whole bitmap."""
    h = hashes.astype(np.uint64)
    h1 = _mix(h)
    h2 = _mix(h ^ np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.uint64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    word = bits[(pos >> np.uint64(6)).astype(np.int64)]
    return (word >> (pos & np.uint64(63))) & np.uint64(1) != 0


def build_seen_filter(
    seen: DataFrame,
    n_shards: int = 64,
    fpp: float = 0.01,
    expected_keys: int | None = None,
) -> DataFrame:
    """seen(url_hash …) → bloom table, one row per shard.

    ``expected_keys`` sizes the bitmaps (per-shard n = expected/P); when
    None, each shard sizes for its actual batch (fine for build-once,
    re-build-per-round usage; incremental union requires fixed sizing).
    """
    per_shard_n = (expected_keys // n_shards + 1) if expected_keys else None

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition partial build, one bitmap per shard present
        acc: dict[int, tuple[np.ndarray, int, int, int]] = {}
        for pdf in it:
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
            shards = pdf["shard"].to_numpy()
            for s in np.unique(shards):
                hs = hashes[shards == s]
                if int(s) not in acc:
                    m, k = _bloom_params(per_shard_n or len(hs), fpp)
                    acc[int(s)] = (np.zeros(m // 64, dtype=np.uint64), m, k, 0)
                bits, m, k, n = acc[int(s)]
                for pos in _positions(hs, m, k):
                    _set_bits(bits, pos)
                acc[int(s)] = (bits, m, k, n + len(hs))
        rows = [
            (s, bits.tobytes(), m, k, n) for s, (bits, m, k, n) in acc.items()
        ]
        yield pd.DataFrame(
            rows, columns=["shard", "bits", "m_bits", "k_hashes", "n_keys"]
        )

    with_shard = seen.select(
        F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard"),
        "url_hash",
    ).repartition(n_shards, "shard")
    partials = with_shard.mapInPandas(build, schema=BLOOM_SCHEMA)

    # OR-merge partials per shard (same sizing ⇒ same m; with dynamic
    # sizing each shard is built in exactly one partition post-
    # repartition, so merge is a no-op pass-through)
    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        m = int(pdf["m_bits"].iloc[0])
        k = int(pdf["k_hashes"].iloc[0])
        assert (pdf["m_bits"] == m).all(), "shard bitmap sizes diverged"
        out = np.zeros(m // 64, dtype=np.uint64)
        for b in pdf["bits"]:
            out |= np.frombuffer(b, dtype=np.uint64)
        return pd.DataFrame(
            {
                "shard": [key[0]],
                "bits": [out.tobytes()],
                "m_bits": [m],
                "k_hashes": [k],
                "n_keys": [int(pdf["n_keys"].sum())],
            }
        )

    return partials.groupBy("shard").applyInPandas(merge, schema=BLOOM_SCHEMA)


_VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("seen_maybe", T.BooleanType(), False),
    ]
)


def probe_seen(
    frontier: DataFrame, bloom: DataFrame, n_shards: int = 64
) -> DataFrame:
    """frontier + ``seen_maybe`` boolean.

    The python side sees ONLY (shard int, url_hash long) — pure numpy,
    no object churn (full string rows through the Arrow channel
    collapsed >8-worker throughput; measured 6× at 32 cores).  The
    boolean verdict joins back to the string payload JVM-side.  Each
    cogroup task holds exactly one shard's bitmap."""
    # distinct: one verdict row per hash, so the join back cannot
    # multiply frontier rows that share a hash
    keyed = frontier.select("url_hash").distinct().withColumn(
        "shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        hashes = left["url_hash"].to_numpy(dtype=np.int64)
        if right.empty:
            hit = np.zeros(len(hashes), dtype=bool)
        else:
            bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint64)
            m = int(right["m_bits"].iloc[0])
            k = int(right["k_hashes"].iloc[0])
            hit = np.ones(len(hashes), dtype=bool)
            for pos in _positions(hashes, m, k):
                hit &= _test_bits(bits, pos)
        return pd.DataFrame({"url_hash": hashes, "seen_maybe": hit})

    verdict = (
        keyed.groupBy("shard")
        .cogroup(bloom.groupBy("shard"))
        .applyInPandas(probe, schema=_VERDICT_SCHEMA)
    )
    return frontier.join(verdict, "url_hash")


def dedup_urls(
    frontier: DataFrame,
    seen: DataFrame,
    bloom: DataFrame | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Exact frontier − seen.

    With a bloom: probe hashes (numeric-only python stage), confirm the
    flagged hashes against the seen set with a semi-join (small: true
    seen + fpp·|new|), then ONE anti-join of the full frontier against
    that confirmed-seen hash set — strings take exactly one JVM shuffle,
    no branch double-compute, no persist barrier needed.
    Without a bloom: plain left-anti on url_hash."""
    seen_hashes = seen.select("url_hash").distinct()
    if bloom is None:
        return frontier.join(seen_hashes, "url_hash", "left_anti")
    keyed = frontier.select("url_hash").withColumn(
        "shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        hashes = left["url_hash"].to_numpy(dtype=np.int64)
        if right.empty:
            hit = np.zeros(len(hashes), dtype=bool)
        else:
            bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint64)
            m = int(right["m_bits"].iloc[0])
            k = int(right["k_hashes"].iloc[0])
            hit = np.ones(len(hashes), dtype=bool)
            for pos in _positions(hashes, m, k):
                hit &= _test_bits(bits, pos)
        return pd.DataFrame(
            {"url_hash": hashes[hit], "seen_maybe": np.ones(int(hit.sum()), bool)}
        )

    flagged = (
        keyed.groupBy("shard")
        .cogroup(bloom.groupBy("shard"))
        .applyInPandas(probe, schema=_VERDICT_SCHEMA)
        .select("url_hash")
    )
    confirmed_seen = flagged.join(seen_hashes, "url_hash", "left_semi")
    return frontier.join(confirmed_seen, "url_hash", "left_anti")
