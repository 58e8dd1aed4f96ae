"""Training-data pipeline operators over documents/embeddings:
dedup (exact, fingerprint, shingles, MinHash-LSH, SimHash), text
analysis (lang-id, quality, tokens), similarity search (brute-force
cosine top-k, LSH ANN, near-dup pairs).

Same conventions as catalog.py.  The xxhash64-based production paths
(q30 MinHash, q31/q43 SimHash, q33 ANN) are not DuckDB-portable and
stay rows-only — but each has a HASH-VERIFIED twin running the
identical pipeline in portable form: q47 (md5-MinHash-LSH), q48
(md5-SimHash + hamming bands), q49 (ANN sign-LSH with the planes,
bucket expression and multi-probe set expressed in SQL).  Only q40
(approx_count_distinct — inherently approximate) has no exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import ORACLE, Q, _dsum, _t, query


# =====================================================================
# exact dedup — hash-groupBy (canonical doc = min doc_id)
# =====================================================================
@query(
    "q24_dedup_exact",
    """
    SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q24(spark, sf):
    d = _t(spark, sf, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("n_copies"),
    )


# =====================================================================
# language-ID — deterministic stopword-vote heuristic
# =====================================================================
@query(
    "q25_lang_id",
    """
    SELECT lang,
           CASE WHEN (' ' || text || ' ') LIKE '% the %' THEN 'en'
                WHEN (' ' || text || ' ') LIKE '% der %'
                  OR (' ' || text || ' ') LIKE '% und %' THEN 'de'
                WHEN (' ' || text || ' ') LIKE '% le %'
                  OR (' ' || text || ' ') LIKE '% la %' THEN 'fr'
                ELSE 'unk' END AS lang_guess,
           COUNT(*) AS n
    FROM documents GROUP BY lang, lang_guess
    """,
)
def q25(spark, sf):
    d = _t(spark, sf, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    guess = (
        F.when(padded.like("% the %"), "en")
        .when(padded.like("% der %") | padded.like("% und %"), "de")
        .when(padded.like("% le %") | padded.like("% la %"), "fr")
        .otherwise("unk")
    )
    return (
        d.select("lang", guess.alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n"))
    )


# =====================================================================
# quality scoring — length/token/stopword ratios (all built-in fns)
# =====================================================================
@query(
    "q26_quality_score",
    """
    SELECT doc_id, n_tokens,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
           ROUND(LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0), 4) AS len_score
    FROM (
      SELECT doc_id, n_chars,
             len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_tokens,
             len(list_filter(str_split(text, ' '),
                             x -> x IN ('a', 'the'))) AS n_stop
      FROM documents)
    WHERE n_tokens > 0
    """,
)
def q26(spark, sf):
    d = _t(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    stop = F.filter(F.split("text", " "), lambda x: x.isin("a", "the"))
    base = d.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(stop).alias("n_stop"),
    ).filter(F.col("n_tokens") > 0)
    return base.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 4).alias(
            "stop_ratio"
        ),
        F.round(
            F.least(F.col("n_chars").cast("double") / 500.0, F.lit(1.0)), 4
        ).alias("len_score"),
    )


# =====================================================================
# token counting — whitespace + per-lang totals
# =====================================================================
@query(
    "q27_token_count",
    """
    SELECT lang,
           CAST(SUM(len(list_filter(str_split(text, ' '), x -> x <> ''))) AS BIGINT)
             AS total_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def q27(spark, sf):
    d = _t(spark, sf, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    return d.groupBy("lang").agg(
        F.sum(n_tok).alias("total_tokens"), F.count("*").alias("n_docs")
    )


# =====================================================================
# document fingerprinting — normalized-text hash
# =====================================================================
@query(
    "q28_fingerprint",
    """
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS n_distinct_fp
    FROM documents GROUP BY source
    """,
)
def q28(spark, sf):
    d = _t(spark, sf, "documents")
    fp = F.md5(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_distinct_fp"),
    )


# =====================================================================
# n-gram shingling — distinct character-3-gram counts (Jaccard basis)
# =====================================================================
@query(
    "q29_shingle_counts",
    """
    SELECT doc_id, COUNT(DISTINCT substr(text, i, 3)) AS n_shingles
    FROM documents, UNNEST(range(1, GREATEST(LENGTH(text) - 2, 0) + 1)) AS t(i)
    WHERE doc_id % 10 = 0 AND LENGTH(text) >= 3
    GROUP BY doc_id
    """,
)
def q29(spark, sf):
    # length>=3 on BOTH sides: a shorter text has no full 3-gram — the
    # SQL's UNNEST emits no row for it while greatest(length-2, 1)
    # would emit one truncated shingle (latent parity flake).
    d = _t(spark, sf, "documents").filter(
        (F.col("doc_id") % 10 == 0) & (F.length("text") >= 3)
    )
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length("text") - 2),
            lambda i: F.substring(F.col("text"), i, F.lit(3)),
        )
    )
    return d.select("doc_id", F.size(shingles).alias("n_shingles"))


# =====================================================================
# embedding near-dup pairs — exact cosine over a deterministic subset
# =====================================================================
@query(
    "q34_embedding_neardup",
    """
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0
      AND ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= 0.2
    """,
)
def q34(spark, sf):
    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") % 5 == 0)
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("label"),
        F.col("embedding").alias("a_emb"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("embedding").alias("b_emb"),
    )
    pairs = a.join(b, (a.label == b.b_label) & (a.a_id < b.b_id))
    sim = F.round(_cosine(F.col("a_emb"), F.col("b_emb")), 4)
    return (
        pairs.select("a_id", "b_id", sim.alias("sim"))
        .filter(F.col("sim") >= 0.2)
    )


def _cosine(a, b):
    """Cosine similarity of two array<float> columns, computed JVM-side
    via higher-order functions (no UDF): dot / (|a| * |b|)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    return dot / (na * nb)


# =====================================================================
# brute-force cosine top-k vs a fixed query vector
# =====================================================================
@query(
    "q32_cosine_topk",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))
    SELECT vec_id, label, sim FROM (
      SELECT vec_id, label,
             ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                          (SELECT qv FROM q)), 4) AS sim,
             ROW_NUMBER() OVER (
               ORDER BY ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                     (SELECT qv FROM q)), 4) DESC,
                        vec_id ASC) AS rk
      FROM embeddings
      WHERE vec_id <> (SELECT MIN(vec_id) FROM embeddings))
    WHERE rk <= 10
    """,
)
def q32(spark, sf):
    e = _t(spark, sf, "embeddings")
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    qv = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    scored = e.filter(F.col("vec_id") != qrow["vec_id"]).select(
        "vec_id",
        "label",
        F.round(_cosine(F.col("embedding"), qv), 4).alias("sim"),
    )
    # top-k via sort+limit (parallel TakeOrdered), NOT a global window
    # (Window.orderBy with no partition key = one task for all rows)
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(10)


# =====================================================================
# MinHash-LSH near-dup candidates (rows-only: xxhash64-based, not
# portable to DuckDB). Word-5-gram shingles → 32 minhashes → 8 bands
# of 4 → band-bucket self-join → candidate pairs w/ estimated Jaccard.
# =====================================================================
N_MINHASH = 32
N_BANDS = 8


def _exploded_shingles(d: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, sh): distinct word-k-gram shingles, one row each.
    Relational form — the shingle expression is built ONCE, then
    exploded; the 32 minhash functions become 32 MIN aggregates over
    these rows (map-side partial aggregation for free).  A nested
    32×transform array expression instead blows up codegen and pins a
    single task — measured, not theoretical."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    return d.select("doc_id", F.explode(shingles).alias("sh"))


def minhash_signatures(d: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """doc_id + h0..h{n-1} minhash columns."""
    ex = _exploded_shingles(d)
    aggs = [
        F.min(F.xxhash64("sh", F.lit(i))).alias(f"h{i}") for i in range(n_hashes)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(d: DataFrame) -> DataFrame:
    """(a_id, b_id, jaccard_est) banded-LSH candidate pairs over
    d(doc_id, text).  Never all-pairs: docs meet only via equal band
    buckets (8 bands × 4 rows), and the pair join is keyed on
    (band, bucket).

    The signature table is localCheckpointed before the self-join:
    both join sides derive from it, and without the checkpoint the
    whole shingle-explode + 32-minhash pipeline (the dominant cost —
    millions of shingle rows) executes once per side (verified in the
    physical plan: two identical Generate→HashAggregate subtrees).
    The checkpoint materializes ~|docs| signature rows once and both
    sides read those blocks; values are unchanged."""
    sigs = minhash_signatures(d).localCheckpoint(eager=True)
    per_band = N_MINHASH // N_BANDS
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * per_band + j}").cast("string")
                        for j in range(per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(N_BANDS)
    ]
    sig_arr = F.array(*[F.col(f"h{i}") for i in range(N_MINHASH)])
    bands = sigs.select(
        "doc_id",
        sig_arr.alias("sig"),
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"), "sig")
    a = bands.select(
        F.col("doc_id").alias("a_id"), "band", "bucket", F.col("sig").alias("a_sig")
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), "band", "bucket", F.col("sig").alias("b_sig")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("a_sig"), F.col("b_sig"), lambda x, y: x == y),
                lambda z: z,
            )
        ).cast("double")
        / N_MINHASH
    )
    # jaccard_est is functionally determined by (a_id, b_id): compute
    # it BEFORE the pair-dedup so the dedup shuffle carries
    # (a_id, b_id, est) instead of two 32-long signature arrays per
    # candidate row (§2.3 shuffle-fewer-bytes); values unchanged
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.round(est, 4).alias("jaccard_est"))
        .dropDuplicates(["a_id", "b_id"])
    )


@query("q30_minhash_lsh", None)
def q30(spark, sf):
    # single-file parquet reads come in as ONE partition — spread the
    # shingle explode across cores before the heavy work
    par = spark.sparkContext.defaultParallelism
    d = _t(spark, sf, "documents").select("doc_id", "text").repartition(par)
    return minhash_lsh_candidates(d)


# =====================================================================
# SimHash (rows-only): 16-bit token-majority signature + hamming-band
# candidate pairing — a signature alone dedups nothing
# =====================================================================
SIMHASH_BITS = 16
SIMHASH_BANDS = 4  # 4 bands × 4 bits: hamming ≤ 3 ⇒ ≥1 untouched band


def simhash_signatures(d: DataFrame) -> DataFrame:
    """(doc_id, simhash16): relational simhash — explode distinct
    tokens → per-doc majority vote per bit as 16 SUM aggregates (same
    explode-don't-nest rule as minhash)."""
    ex = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
        ).alias("tok"),
    ).withColumn("th", F.xxhash64("tok"))
    aggs = [F.count("*").alias("n_tok")] + [
        F.sum(
            F.when(F.col("th").bitwiseAND(F.lit(int(2**i))) != 0, 1).otherwise(0)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    per_doc = ex.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sim = sim + F.when(
            F.col(f"b{i}") * 2 > F.col("n_tok"), F.lit(int(2**i)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per_doc.select("doc_id", sim.alias("simhash16"))


def simhash_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(a_id, b_id, hamming) near-dup pairs from simhash signatures.

    Pigeonhole banding: split the 16 bits into 4 bands of 4; any pair
    with hamming ≤ 3 differs in at most 3 bands, so it collides on at
    least one band bucket — candidates come from equality joins on
    (band, band_bits), NEVER an all-pairs product.  The exact hamming
    distance (bit_count of xor) then filters candidates.

    ``sigs`` is localCheckpointed first: both join sides derive from
    it, and without the checkpoint the caller's signature pipeline
    (token explode + 17 aggregates) executes once per side — same
    single-pass fix as minhash_lsh_candidates, measured 12.8 s → ~3 s
    on q43 at sf0.1.  Values unchanged."""
    sigs = sigs.localCheckpoint(eager=True)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash16"), b * 4).bitwiseAND(F.lit(0xF)).alias(
                "band_bits"
            ),
        )
        for b in range(SIMHASH_BANDS)
    ]
    bands = sigs.select(
        "doc_id",
        "simhash16",
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select("doc_id", "simhash16", "bb.band", "bb.band_bits")
    a = bands.select(
        F.col("doc_id").alias("a_id"),
        F.col("simhash16").alias("a_sig"),
        "band",
        "band_bits",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"),
        F.col("simhash16").alias("b_sig"),
        "band",
        "band_bits",
    )
    hamming = F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig")))
    # hamming is functionally determined by (a_id, b_id), so the
    # distance filter and the narrow projection commute with the
    # pair-dedup — applying them FIRST shrinks the dedup shuffle from
    # every band collision (signatures included) to just the surviving
    # (a_id, b_id, hamming) rows (§2.3 shuffle-fewer-bytes; measured
    # 12.8 s → ~3 s on q43's collision-dense 5 k-doc corpus)
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_id", "b_id"])
    )


@query("q31_simhash", None)
def q31(spark, sf):
    par = spark.sparkContext.defaultParallelism
    d = _t(spark, sf, "documents").select("doc_id", "text").repartition(par)
    return simhash_signatures(d)


@query("q43_simhash_pairs", None)
def q43(spark, sf):
    par = spark.sparkContext.defaultParallelism
    d = _t(spark, sf, "documents").select("doc_id", "text").repartition(par)
    return simhash_pairs(simhash_signatures(d))


# =====================================================================
# ANN via LSH bucketing (rows-only): random-hyperplane sign bits →
# bucket join vs the brute-force scan path
# =====================================================================
def _lsh_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic DECORRELATED hyperplanes.  (A smooth family like
    sin(a·p + b·i) yields nearly-parallel planes — measured recall 0.0
    at radius 1 on the test corpus; large-stride sine hashing behaves
    like seeded Gaussian planes.)"""
    import math

    return [
        [
            math.sin((p * 7919 + i * 104729 + 1) * 12.9898)
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def ann_sign_lsh(
    e: DataFrame,
    n_planes: int = 8,
    probe_radius: int = 2,
    k: int = 10,
) -> DataFrame:
    """Approximate top-k cosine neighbors of the min-vec_id query vector
    via sign-LSH bucketing + multi-probe.

    Scale path: each vector hashes to one of 2^n_planes buckets (a
    single Catalyst expression — no UDF); only vectors in the query's
    bucket or its hamming ≤ probe_radius neighbors are scored.  radius 2
    probes 1+n+n(n-1)/2 of 2^n buckets (37/256 at n=8).  Multi-probe is
    load-bearing: a true neighbor that sits near any hyperplane flips
    that sign bit, so the exact bucket alone has a recall cliff.
    Recall is corpus-dependent: this engine's test corpus has top-10
    cosine ≈ 0.3 (≈72° — sign agreement per plane only 0.6), where NO
    sub-linear index is near-exact; on genuinely near-duplicate vectors
    (cosine ≥ 0.9) the same index recalls ≥ 0.8 (planted-pair test)."""
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    planes = _lsh_planes(n_planes, len(qv))

    def sign_bits(col):
        bits = []
        for p, plane in enumerate(planes):
            dot = F.aggregate(
                F.zip_with(
                    F.transform(col, lambda x: x.cast("double")),
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            bits.append(F.when(dot >= 0, F.lit(2**p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    q_bucket = 0
    for p, plane in enumerate(planes):
        if sum(x * w for x, w in zip(qv, plane)) >= 0:
            q_bucket += 2**p

    probes = {q_bucket}
    if probe_radius >= 1:
        probes |= {q_bucket ^ (1 << p) for p in range(n_planes)}
    if probe_radius >= 2:
        probes |= {
            q_bucket ^ (1 << p) ^ (1 << r)
            for p in range(n_planes)
            for r in range(p + 1, n_planes)
        }
    bucketed = e.withColumn("bucket", sign_bits(F.col("embedding")))
    cand = bucketed.filter(
        F.col("bucket").isin(sorted(probes))
        & (F.col("vec_id") != qrow["vec_id"])
    )
    qv_col = F.array(*[F.lit(x) for x in qv])
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(_cosine(F.col("embedding"), qv_col), 4).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


@query("q33_ann_lsh", None)
def q33(spark, sf):
    return ann_sign_lsh(_t(spark, sf, "embeddings"))


# =====================================================================
# sessionization — lag + gap cumsum (common streaming-ish pattern)
# =====================================================================
@query(
    "q35_sessionize",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(1 + SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions
    FROM (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - CAST(FLOOR(epoch(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
               AS gap_s
      FROM events WHERE user_id % 100 = 0)
    GROUP BY user_id
    """,
)
def q35(spark, sf):
    e = _t(spark, sf, "events").filter(F.col("user_id") % 100 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        e.withColumn("gap_s", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                1 + F.sum(F.when(F.col("gap_s") > 1800, 1).otherwise(0))
            ).alias("n_sessions"),
        )
    )


__all__ = ["Q", "ORACLE"]


# =====================================================================
# Athena corp-map SQL shape (fixed_corp_map_lambda.py:76-190): LPAD
# normalization + GROUP BY dedup + ORDER BY, as plain spark.sql
# =====================================================================
@query(
    "q36_corp_map_sql",
    """
    SELECT c_name AS dart_corp,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS dart_corp_code,
           LPAD(CAST(c_nationkey AS VARCHAR), 6, '0') AS stock_code
    FROM customer
    GROUP BY c_name, c_custkey, c_nationkey
    ORDER BY dart_corp
    """,
)
def q36(spark, sf):
    _t(spark, sf, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_name AS dart_corp,
               LPAD(CAST(c_custkey AS STRING), 8, '0') AS dart_corp_code,
               LPAD(CAST(c_nationkey AS STRING), 6, '0') AS stock_code
        FROM customer_v
        GROUP BY c_name, c_custkey, c_nationkey
        ORDER BY dart_corp
        """
    )


# =====================================================================
# collect_set + priority pick (s3_uploader.py:108-115: prefer 'BS'
# among a group's report types, else the min)
# =====================================================================
@query(
    "q37_priority_pick",
    """
    SELECT o_custkey,
           CASE WHEN list_contains(list(DISTINCT o_orderstatus), 'F')
                THEN 'F' ELSE MIN(o_orderstatus) END AS picked_status,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders GROUP BY o_custkey
    """,
)
def q37(spark, sf):
    o = _t(spark, sf, "orders")
    statuses = F.collect_set("o_orderstatus")
    return o.groupBy("o_custkey").agg(
        F.when(F.array_contains(statuses, "F"), "F")
        .otherwise(F.min("o_orderstatus"))
        .alias("picked_status"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


# =====================================================================
# page-1 truncation (dart_api_manager.py:241-242): global sort + limit
# with full tie-break
# =====================================================================
@query(
    "q38_page_truncation",
    """
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 100
    """,
)
def q38(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(100)
        .select("o_orderkey", "o_custkey")
    )


# =====================================================================
# Structured Streaming twin of q19: file-source stream over the same
# events parquet, complete-mode windowed agg — must equal the batch
# oracle exactly (exactly-once file source, no late data in replay)
# =====================================================================
_STREAM_SEQ = [0]


@query(
    "q39_stream_hourly",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H') AS hour_bucket,
           event_type, COUNT(*) AS n
    FROM events GROUP BY hour_bucket, event_type
    """,
)
def q39(spark, sf):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour_bucket"),
            "event_type",
            "n",
        )
    )
    _STREAM_SEQ[0] += 1
    name = f"q39_stream_out_{_STREAM_SEQ[0]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


# =====================================================================
# approx_count_distinct (frontier cardinality metric) + from_json with
# explicit schema — rows-only (HLL sketches are engine-specific)
# =====================================================================
# =====================================================================
# document fingerprinting — polynomial ROLLING hash over codepoints
# (Rabin-Karp style; complements q28's md5 content fingerprint)
# =====================================================================
@query(
    "q45_rolling_fingerprint",
    """
    SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_filter(string_split_regex(text, ''), x -> x <> ''),
                 x -> CAST(ord(x) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS fp,
           LENGTH(text) AS n_chars
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def q45(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("doc_id") % 25 == 0)
    codes = F.transform(
        F.filter(F.split("text", ""), lambda x: x != ""),
        lambda c: F.ascii(c).cast("long"),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda a, c: F.pmod(a * 31 + c, F.lit(2147483647).cast("long")),
    )
    return d.select(
        "doc_id", fp.alias("fp"), F.length("text").cast("long").alias("n_chars")
    )


# =====================================================================
# exact n-gram Jaccard near-dup pairs (blocked on lang — never
# all-pairs); the exact counterpart of the MinHash estimate (q30)
# =====================================================================
@query(
    "q46_ngram_jaccard_pairs",
    """
    WITH s AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, GREATEST(LENGTH(text) - 2, 0) + 1),
               i -> substr(text, CAST(i AS INT), 3))) AS sh
      FROM documents WHERE doc_id % 20 = 0 AND LENGTH(text) >= 3)
    SELECT a_id, b_id, jaccard FROM (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
      FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id)
    WHERE jaccard >= 0.05
    """,
)
def q46(spark, sf):
    d = _t(spark, sf, "documents").filter(
        (F.col("doc_id") % 20 == 0) & (F.length("text") >= 3)
    )
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length("text") - 2),
            lambda i: F.substring(F.col("text"), i, F.lit(3)),
        )
    )
    s = d.select("doc_id", "lang", sh.alias("sh"))
    a = s.select(
        F.col("doc_id").alias("a_id"), "lang", F.col("sh").alias("a_sh")
    )
    b = s.select(
        F.col("doc_id").alias("b_id"), "lang", F.col("sh").alias("b_sh")
    )
    jac = F.round(
        F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        / F.size(F.array_union("a_sh", "b_sh")),
        4,
    )
    return (
        a.join(b, "lang")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.05)
    )


@query("q40_approx_cardinality", None)
def q40(spark, sf):
    from pyspark.sql import types as T

    e = _t(spark, sf, "events")
    props_schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = e.withColumn("pk", F.from_json("props", props_schema).getField("k"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.approx_count_distinct("pk").alias("approx_k"),
            F.count("*").alias("n"),
        )
    )


# =====================================================================
# rollup — hierarchical totals (region → nation → grand total)
# =====================================================================
@query(
    "q41_rollup_revenue",
    """
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q41(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(_dsum(F.col("o_totalprice")).alias("revenue"))
    )


# =====================================================================
# pivot — wide by linestatus (the reference's wide→long inverse)
# =====================================================================
@query(
    "q42_pivot_status",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q42(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_dsum(F.col("l_quantity")))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


# =====================================================================
# MinHash-LSH, md5-hashed twin — the SAME shingle→signature→band→
# candidate pipeline as q30, with every hash derived from md5 (first
# 15 hex digits → 60-bit int) instead of xxhash64, so DuckDB can run
# it verbatim and the driver can hash-verify the full banded-LSH
# dataflow (q30 keeps the cheaper xxhash64 production path).
# =====================================================================
_PER_BAND = N_MINHASH // N_BANDS


def _md5h(col, seed) -> F.Column:
    """Portable 60-bit hash: conv(substr(md5(x || '|seed'), 1, 15), 16, 10).
    15 hex digits keep the value positive inside a signed int64 on both
    engines (DuckDB: CAST('0x…' AS BIGINT))."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"|{seed}"))), 1, 15), 16, 10
    ).cast("long")


def _q47_sql() -> str:
    h = (
        lambda expr, seed: "CAST(CONCAT('0x', substr(md5("
        + expr
        + f" || '|{seed}'),1,15)) AS BIGINT)"
    )
    sig_cols = ",\n         ".join(
        f"MIN({h('sh', i)}) AS h{i}" for i in range(N_MINHASH)
    )
    band_selects = []
    for b in range(N_BANDS):
        cat = " || ',' || ".join(
            f"CAST(h{b * _PER_BAND + j} AS VARCHAR)" for j in range(_PER_BAND)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {h('(' + cat + ')', 99)} AS bucket FROM sig"
        )
    bands = "\n  UNION ALL ".join(band_selects)
    matches = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)"
        for i in range(N_MINHASH)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents WHERE doc_id % 4 = 0),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(tk, i, i + 4), ' ') AS sh
      FROM toks, UNNEST(range(1, GREATEST(len(tk) - 4, 1) + 1)) AS t(i)),
    sig AS (
      SELECT doc_id,
         {sig_cols}
      FROM sh GROUP BY doc_id),
    bands AS (
      {bands}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
    SELECT c.a_id, c.b_id,
           ROUND(({matches}) / 32.0, 4) AS jaccard_est
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.a_id
    JOIN sig sb ON sb.doc_id = c.b_id
    """


@query("q47_minhash_md5_lsh", _q47_sql())
def q47(spark, sf):
    par = spark.sparkContext.defaultParallelism
    d = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "text")
        .repartition(par)
    )
    ex = _exploded_shingles(d)
    sigs = ex.groupBy("doc_id").agg(
        *[F.min(_md5h(F.col("sh"), i)).alias(f"h{i}") for i in range(N_MINHASH)]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            _md5h(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * _PER_BAND + j}").cast("string")
                        for j in range(_PER_BAND)
                    ],
                ),
                99,
            ).alias("bucket"),
        )
        for b in range(N_BANDS)
    ]
    sig_arr = F.array(*[F.col(f"h{i}") for i in range(N_MINHASH)])
    bands = sigs.select(
        "doc_id", sig_arr.alias("sig"), F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "sig",
    )
    a = bands.select(
        F.col("doc_id").alias("a_id"), "band", "bucket", F.col("sig").alias("a_sig")
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), "band", "bucket", F.col("sig").alias("b_sig")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("a_sig"), F.col("b_sig"), lambda x, y: x == y),
                lambda z: z,
            )
        ).cast("double")
        / N_MINHASH
    )
    # jaccard_est is functionally determined by (a_id, b_id): compute
    # it BEFORE the pair-dedup so the dedup shuffle carries
    # (a_id, b_id, est) instead of two 32-long signature arrays per
    # candidate row (§2.3 shuffle-fewer-bytes); values unchanged
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.round(est, 4).alias("jaccard_est"))
        .dropDuplicates(["a_id", "b_id"])
    )


# =====================================================================
# SimHash, md5-hashed twin — same 16-bit majority-vote signature and
# pigeonhole hamming-band pairing as q31/q43, with the token hash
# derived from md5 so DuckDB can verify the WHOLE pipeline by hash
# (q31/q43 keep the cheaper xxhash64 production path).
# =====================================================================
def _q48_sql() -> str:
    h = "CAST(CONCAT('0x', substr(md5(tok || '|0'),1,15)) AS BIGINT)"
    bsum = ",\n             ".join(
        f"SUM(CASE WHEN (th & {2**i}) != 0 THEN 1 ELSE 0 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN b{i} * 2 > n_tok THEN {2**i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents WHERE doc_id % 4 = 0)),
    th AS (SELECT doc_id, {h} AS th FROM toks),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_tok,
             {bsum}
      FROM th GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash16 FROM agg),
    bands AS (
      SELECT doc_id, simhash16, band,
             (simhash16 >> (band * 4)) & 15 AS band_bits
      FROM sig, (VALUES (0), (1), (2), (3)) AS t(band)),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.simhash16 AS a_sig, b.simhash16 AS b_sig
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_bits = b.band_bits
       AND a.doc_id < b.doc_id)
    SELECT a_id, b_id,
           CAST(bit_count(xor(a_sig, b_sig)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(a_sig, b_sig)) <= 3
    """


@query("q48_simhash_md5_pairs", _q48_sql())
def q48(spark, sf):
    par = spark.sparkContext.defaultParallelism
    d = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "text")
        .repartition(par)
    )
    ex = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
        ).alias("tok"),
    ).withColumn("th", _md5h(F.col("tok"), 0))
    aggs = [F.count("*").alias("n_tok")] + [
        F.sum(
            F.when(F.col("th").bitwiseAND(F.lit(int(2**i))) != 0, 1).otherwise(0)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    per_doc = ex.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sim = sim + F.when(
            F.col(f"b{i}") * 2 > F.col("n_tok"), F.lit(int(2**i)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    sigs = per_doc.select("doc_id", sim.alias("simhash16"))
    return simhash_pairs(sigs)


# =====================================================================
# ANN sign-LSH, oracle-verifiable form — the SAME deterministic
# hyperplanes, bucket expression and radius-2 multi-probe as q33,
# expressed so DuckDB can run it verbatim: plane weights inlined as
# list literals, the query bucket and its probe set computed IN SQL
# (bit tricks over the 8 sign bits).  No hashes involved — q33 was
# rows-only simply because nobody had written the SQL.
# =====================================================================
def _q49_sql(n_planes: int = 8, dim: int = 64) -> str:
    planes = _lsh_planes(n_planes, dim)
    plane_rows = ",\n        ".join(
        # repr() round-trips doubles exactly — a rounded literal could
        # flip a near-zero dot's sign and change bucket membership
        f"({p}, [{', '.join(repr(w) for w in planes[p])}])"
        for p in range(n_planes)
    )
    return f"""
    WITH planes(p, w) AS (VALUES
        {plane_rows}),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
          WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    qbits AS (
      SELECT CAST(SUM(CASE WHEN list_dot_product((SELECT qv FROM q), w) >= 0
                      THEN 1 << p ELSE 0 END) AS BIGINT) AS qb
      FROM planes),
    radius_masks AS (
      SELECT DISTINCT
             xor((SELECT qb FROM qbits),
                 CAST((CASE WHEN a.p >= 0 THEN 1 << a.p ELSE 0 END)
                    | (CASE WHEN b.p >= 0 THEN 1 << b.p ELSE 0 END) AS BIGINT))
               AS probe
      FROM (SELECT p FROM planes UNION ALL SELECT -1) a,
           (SELECT p FROM planes UNION ALL SELECT -1) b
      WHERE a.p <= b.p OR a.p = -1 OR b.p = -1),
    bucketed AS (
      SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS emb,
             (SELECT CAST(SUM(CASE WHEN
                 list_dot_product(CAST(e.embedding AS DOUBLE[]), w) >= 0
               THEN 1 << p ELSE 0 END) AS BIGINT) FROM planes) AS bucket
      FROM embeddings e),
    cand AS (
      SELECT vec_id, label,
             ROUND(list_cosine_similarity(emb, (SELECT qv FROM q)), 4) AS sim
      FROM bucketed
      WHERE bucket IN (SELECT probe FROM radius_masks)
        AND vec_id <> (SELECT MIN(vec_id) FROM embeddings))
    SELECT vec_id, label, sim FROM cand
    ORDER BY sim DESC, vec_id ASC LIMIT 10
    """


@query("q49_ann_lsh_sql", _q49_sql())
def q49(spark, sf):
    return ann_sign_lsh(_t(spark, sf, "embeddings"))


# =====================================================================
# link extraction + resolution (crawl discovery edge) — pages are
# synthesized identically inside both queries (the driver's DuckDB
# views have no html table), so the oracle verifies the operator:
# href regex walk + absolute/root-relative/relative/protocol-relative
# resolution + scheme-drop rules, per src page, deduped.
# =====================================================================
@query(
    "q50_link_extract",
    """
    WITH pages AS (
      SELECT 'https://h' || CAST(o_custkey % 5 AS VARCHAR)
               || '.ex/dir/page' || CAST(o_orderkey AS VARCHAR) || '.html'
               AS src_url,
             'h' || CAST(o_custkey % 5 AS VARCHAR) || '.ex' AS host,
             '<a href="/abs/' || CAST(o_orderkey AS VARCHAR) || '">a</a>'
             || '<a href="p' || CAST(o_orderkey % 7 AS VARCHAR) || '.html">b</a>'
             || '<a href="https://ext.example/' || CAST(o_orderkey % 13 AS VARCHAR) || '">c</a>'
             || '<a href="//cdn.example/x.js">d</a>'
             || '<a href="mailto:x@y.example">e</a>'
             || '<a href="#frag">f</a>' AS html
      FROM orders WHERE o_orderkey % 20 = 0),
    hrefs AS (
      SELECT src_url, host,
             UNNEST(regexp_extract_all(html, 'href="([^"#][^"]*)"', 1)) AS href
      FROM pages),
    resolved AS (
      SELECT DISTINCT src_url,
        CASE
          WHEN lower(href) SIMILAR TO 'https?://.*' THEN href
          WHEN href LIKE '//%' THEN 'https:' || href
          WHEN href LIKE '/%' THEN 'https://' || host || href
          WHEN lower(href) SIMILAR TO '(javascript:|mailto:|tel:|data:).*'
            THEN NULL
          WHEN lower(href) SIMILAR TO '[a-z][a-z0-9+.-]*:.*' THEN NULL
          ELSE 'https://' || host || '/dir/' || href
        END AS link
      FROM hrefs)
    SELECT link, CAST(COUNT(*) AS BIGINT) AS n_refs
    FROM resolved WHERE link IS NOT NULL AND link LIKE '%.ex%'
    GROUP BY link ORDER BY n_refs DESC, link LIMIT 50
    """,
)
def q50(spark, sf):
    from ..functions.links import extract_links

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 20 == 0)
    url = F.concat(
        F.lit("https://h"), (F.col("o_custkey") % 5).cast("string"),
        F.lit(".ex/dir/page"), F.col("o_orderkey").cast("string"),
        F.lit(".html"),
    )
    html = F.concat(
        F.lit('<a href="/abs/'), F.col("o_orderkey").cast("string"), F.lit('">a</a>'),
        F.lit('<a href="p'), (F.col("o_orderkey") % 7).cast("string"),
        F.lit('.html">b</a>'),
        F.lit('<a href="https://ext.example/'),
        (F.col("o_orderkey") % 13).cast("string"), F.lit('">c</a>'),
        F.lit('<a href="//cdn.example/x.js">d</a>'),
        F.lit('<a href="mailto:x@y.example">e</a>'),
        F.lit('<a href="#frag">f</a>'),
    )
    pages = o.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    links = extract_links(pages)
    return (
        links.filter(F.col("link").contains(".ex"))
        .groupBy("link")
        .agg(F.count("*").alias("n_refs"))
        .orderBy(F.col("n_refs").desc(), F.col("link").asc())
        .limit(50)
    )


# =====================================================================
# dedup clusters — connected components over near-dup pairs (the
# keep-one decision a training pipeline makes AFTER pair generation).
# Spark side: iterative min-label propagation (operators/components.py,
# localCheckpoint per round).  Oracle: DuckDB WITH RECURSIVE computes
# the same min-reachable-node component — an iterative Spark algorithm
# hash-verified end-to-end.
# =====================================================================
@query(
    "q51_dedup_components",
    """
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0
        AND ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 4) >= 0.2),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    reach(node, comp) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
    comps AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node)
    SELECT component AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MAX(node) AS BIGINT) AS max_doc_id
    FROM comps GROUP BY component
    """,
)
def q51(spark, sf):
    from ..operators.components import connected_components

    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") % 5 == 0)
    a = e.select(
        F.col("vec_id").alias("a_id"), "label", F.col("embedding").alias("a_emb")
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("embedding").alias("b_emb"),
    )
    pairs = (
        a.join(b, (a.label == b.b_label) & (a.a_id < b.b_id))
        .filter(F.round(_cosine(F.col("a_emb"), F.col("b_emb")), 4) >= 0.2)
        .select("a_id", "b_id")
    )
    comp = connected_components(pairs)
    return comp.groupBy(F.col("component").alias("canonical_id")).agg(
        F.count("*").alias("cluster_size"),
        F.max("node").alias("max_doc_id"),
    )


# =====================================================================
# BPE-ish token counting — a GPT-2-style pretokenizer split (letter
# runs / digit runs / punctuation runs, each with an optional leading
# space).  The pattern is kept RE2-compatible (no lookahead, no
# contraction alternates) so the DuckDB oracle runs it verbatim; both
# engines count regexp_extract_all matches.  Complements q27's
# whitespace count: BPE-ish tokens are the unit LLM data budgets are
# written in.
# =====================================================================
_BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


@query(
    "q52_bpe_token_count",
    f"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT)
             AS total_bpe_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(len(regexp_extract_all(text, '{_BPE_RE}')))
                 / CAST(COUNT(*) AS DOUBLE), 4) AS avg_tokens_per_doc
    FROM documents GROUP BY lang
    """,
)
def q52(spark, sf):
    d = _t(spark, sf, "documents")
    n_tok = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))
    )
    return d.groupBy("lang").agg(
        F.sum(n_tok).alias("total_bpe_tokens"),
        F.count("*").alias("n_docs"),
        F.round(
            F.sum(n_tok) / F.count("*").cast("double"), 4
        ).alias("avg_tokens_per_doc"),
    )


# =====================================================================
# q53 — discovery priority inheritance (round-4 crawl-loop semantics):
# each parent page carries a priority; a discovered link inherits
# max(parent_priority) − 1 over all parents that reference it — the
# rule FrontierStore.run_crawl applies at insert (frontier.py), here
# oracle-checked end-to-end through the same Catalyst link extraction.
# =====================================================================
@query(
    "q53_link_priority_inherit",
    """
    WITH pages AS (
      SELECT 'https://h' || CAST(o_custkey % 5 AS VARCHAR)
               || '.ex/p' || CAST(o_orderkey AS VARCHAR) AS src_url,
             'h' || CAST(o_custkey % 5 AS VARCHAR) || '.ex' AS host,
             CAST(o_orderkey % 97 AS DOUBLE) AS priority,
             '<a href="/child/' || CAST(o_orderkey % 11 AS VARCHAR) || '">x</a>'
             || '<a href=''/child/' || CAST(o_orderkey % 7 AS VARCHAR) || '''>y</a>'
             AS html
      FROM orders WHERE o_orderkey % 10 = 0),
    hrefs AS (
      SELECT src_url, host, priority,
             UNNEST(regexp_extract_all(html, 'href="([^"#][^"]*)"', 1)
                    || regexp_extract_all(html, 'href=''([^''#][^'']*)''', 1))
               AS href
      FROM pages),
    resolved AS (
      SELECT DISTINCT src_url, priority,
             'https://' || host || href AS link
      FROM hrefs)
    SELECT link,
           MAX(priority) - 1.0 AS inherited_priority,
           CAST(COUNT(*) AS BIGINT) AS n_parents
    FROM resolved
    GROUP BY link ORDER BY link
    """,
)
def q53(spark, sf):
    from ..functions.links import extract_links

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0)
    url = F.concat(
        F.lit("https://h"), (F.col("o_custkey") % 5).cast("string"),
        F.lit(".ex/p"), F.col("o_orderkey").cast("string"),
    )
    html = F.concat(
        F.lit('<a href="/child/'), (F.col("o_orderkey") % 11).cast("string"),
        F.lit('">x</a>'),
        F.lit("<a href='/child/"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit("'>y</a>"),
    )
    pages = o.select(
        url.alias("url"),
        (F.col("o_orderkey") % 97).cast("double").alias("priority"),
        F.encode(html, "UTF-8").alias("html"),
    )
    links = extract_links(pages, carry=("priority",))
    return (
        links.groupBy("link")
        .agg(
            (F.max("priority") - F.lit(1.0)).alias("inherited_priority"),
            F.count("*").alias("n_parents"),
        )
        .orderBy("link")
    )


# =====================================================================
# PageRank frontier prioritization — iterative link-authority scoring
# (operators/components.pagerank; fixed 5 iterations, damping 0.85,
# leaked dangling mass — exactly the unrolled SQL below, so the oracle
# is exact up to the final ROUND(,4))
# =====================================================================
_PR_EDGES = """
    SELECT DISTINCT o_custkey % 97 AS src, o_orderkey % 97 AS dst
    FROM orders WHERE o_orderkey % 4 = 0 AND o_custkey % 97 <> o_orderkey % 97
"""
_PR_ITER = """
    it{k} AS (
      SELECT nodes.node,
             (0.15 / (SELECT n FROM nn))
             + 0.85 * COALESCE(m.mass, 0) AS pr
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, SUM(p.pr / d.out_deg) AS mass
        FROM edges e
        JOIN it{prev} p ON p.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst) m USING (node))
"""


@query(
    "q54_pagerank",
    "WITH edges AS ({edges}),\n".format(edges=_PR_EDGES)
    + """
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
    it0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
"""
    + ",\n".join(_PR_ITER.format(k=k, prev=k - 1) for k in range(1, 6))
    + """
    SELECT node, ROUND(pr, 4) AS pr FROM it5 ORDER BY node
    """,
)
def q54(spark, sf):
    from ..operators.components import pagerank

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 4 == 0)
    edges = o.select(
        (F.col("o_custkey") % 97).alias("src"),
        (F.col("o_orderkey") % 97).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    pr = pagerank(edges, n_iter=5, damping=0.85)
    return pr.select("node", F.round("pr", 4).alias("pr")).orderBy("node")


# =====================================================================
# Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
# Language Models: ... Gopher" §A1.1 repetition filters): per-doc
# duplicate-line fraction and top-bigram fraction.  The corpus docs
# are single-line word soup, so "lines" are the 8-word chunks of the
# whitespace token stream — deterministic and engine-portable.  All
# per-row array expressions: NO shuffle, NO UDF — at 100 TB this is a
# map-only codegen pass (the cheapest possible quality sweep), unlike
# the explode+groupBy formulation which shuffles |corpus|·|lines|
# rows.  Bigram top-count is O(distinct·n) per doc — bounded by doc
# length, not corpus size.
# =====================================================================
@query(
    "q55_repetition_signals",
    """
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS w
      FROM documents),
    chunked AS (
      SELECT doc_id, w,
             list_transform(
               generate_series(1, CAST(ceil(len(w) / 8.0) AS INT)),
               i -> array_to_string(w[((i-1)*8+1):least((i-1)*8+8, len(w))],
                                    ' ')) AS lines,
             CASE WHEN len(w) >= 2 THEN
               list_transform(generate_series(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1])
             ELSE [] END AS bg
      FROM tok)
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           ROUND(CASE WHEN len(lines) = 0 THEN 0.0
                 ELSE (len(lines) - len(list_distinct(lines)))
                      / CAST(len(lines) AS DOUBLE) END, 4) AS dup_line_frac,
           ROUND(CASE WHEN len(bg) = 0 THEN 0.0
                 ELSE list_max(list_transform(list_distinct(bg),
                        b -> len(list_filter(bg, x -> x = b))))
                      / CAST(len(bg) AS DOUBLE) END, 4) AS top_bigram_frac
    FROM chunked ORDER BY doc_id
    """,
)
def q55(spark, sf):
    # single-row-group scan + word-array/line-building higher-order
    # expressions: spread rows before the map (see q69 note)
    par = spark.sparkContext.defaultParallelism
    d = _t(spark, sf, "documents").repartition(par)
    w = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    d = d.select("doc_id", w.alias("w"))
    n = F.size("w")
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) while
    # DuckDB's generate_series(1, 0) is empty — a whitespace-only doc
    # must produce zero lines in both engines
    lines = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), F.ceil(n / F.lit(8.0)).cast("int")),
            lambda i: F.array_join(
                F.slice(F.col("w"), (i - 1) * 8 + 1, 8), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = F.when(
        n >= 2,
        F.zip_with(
            F.slice(F.col("w"), 1, n - 1),
            F.slice(F.col("w"), 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.select("doc_id", lines.alias("lines"), bg.alias("bg"))
    nl = F.size("lines").cast("double")
    nb = F.size("bg").cast("double")
    top = F.array_max(
        F.transform(
            F.array_distinct("bg"),
            lambda b: F.size(F.filter(F.col("bg"), lambda x: x == b)),
        )
    ).cast("double")
    return d.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.round(
            F.when(nl == 0, F.lit(0.0)).otherwise(
                (nl - F.size(F.array_distinct("lines"))) / nl
            ),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(nb == 0, F.lit(0.0)).otherwise(top / nb), 4
        ).alias("top_bigram_frac"),
    ).orderBy("doc_id")


# =====================================================================
# SURT keys + CDX index records — the web-archive index format
# (Common Crawl's cdx-*.gz / OpenWayback CDXJ): one record per
# capture, keyed by (SURT urlkey, 14-digit timestamp).  Sorting by
# urlkey range-partitions every subdomain of a domain into one key
# range — at 100 TB the sort IS the index build (rangepartition +
# per-partition write of sorted runs).  Pages are synthesized from
# orders (the driver's DuckDB views carry no html table), with
# mixed-case hosts, a leading www. and unsorted query params so the
# oracle verifies every SURT rule.
# =====================================================================
@query(
    "q56_cdx_index",
    """
    WITH pages AS (
      SELECT 'h' || CAST(o_custkey % 7 AS VARCHAR) || '.Example.COM' AS host_raw,
             '/p/' || CAST(o_orderkey AS VARCHAR) || '.html' AS path,
             'b=' || CAST(o_orderkey % 3 AS VARCHAR)
               || '&a=' || CAST(o_custkey % 5 AS VARCHAR) AS query,
             strftime(o_orderdate, '%Y%m%d%H%M%S') AS ts14,
             'page body ' || CAST(o_orderkey AS VARCHAR) AS body
      FROM orders WHERE o_orderkey % 10 = 0)
    SELECT array_to_string(list_reverse(string_split(lower(host_raw), '.')), ',')
             || ')' || path || '?'
             || array_to_string(list_sort(string_split(query, '&')), '&')
             AS urlkey,
           ts14,
           'https://www.' || lower(host_raw) || path || '?' || query AS url,
           md5(body) AS digest,
           CAST(length(body) AS BIGINT) AS length
    FROM pages ORDER BY urlkey, ts14, url
    """,
)
def q56(spark, sf):
    from ..functions.urls import surt_key

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0)
    host_raw = F.concat(
        F.lit("h"), (F.col("o_custkey") % 7).cast("string"),
        F.lit(".Example.COM"),
    )
    path = F.concat(
        F.lit("/p/"), F.col("o_orderkey").cast("string"), F.lit(".html")
    )
    query = F.concat(
        F.lit("b="), (F.col("o_orderkey") % 3).cast("string"),
        F.lit("&a="), (F.col("o_custkey") % 5).cast("string"),
    )
    body = F.concat(F.lit("page body "), F.col("o_orderkey").cast("string"))
    # the crawl store keeps url_canon with a lowercased host; the raw
    # url keeps its www. + case to exercise surt_key's normalization
    url = F.concat(F.lit("https://www."), F.lower(host_raw), path,
                   F.lit("?"), query)
    pages = o.select(
        url.alias("url"),
        F.concat(F.lit("www."), F.lower(host_raw)).alias("host"),
        F.date_format("o_orderdate", "yyyyMMddHHmmss").alias("ts14"),
        body.alias("body"),
    )
    return pages.select(
        surt_key(F.col("url"), F.col("host")).alias("urlkey"),
        "ts14",
        "url",
        F.md5(F.encode("body", "UTF-8")).alias("digest"),
        F.octet_length("body").cast("long").alias("length"),
    ).orderBy("urlkey", "ts14", "url")


# =====================================================================
# anchor-text index — aggregate link text per TARGET url (the classic
# web-search / pretraining signal: what other pages call a page).
# Spark side: extract_anchor_texts (pure Catalyst element walk) →
# groupBy(link, anchor) → top anchor per link by count.  Equality-
# keyed shuffles only; candidate volume is |anchors|, never |pages|².
# =====================================================================
@query(
    "q57_anchor_text_index",
    """
    WITH pages AS (
      SELECT 'https://h' || CAST(o_custkey % 5 AS VARCHAR)
               || '.ex/dir/page' || CAST(o_orderkey AS VARCHAR) || '.html'
               AS src_url,
             'h' || CAST(o_custkey % 5 AS VARCHAR) || '.ex' AS host,
             '<a href="/t/' || CAST(o_orderkey % 11 AS VARCHAR)
               || '" rel="x">Topic ' || CAST(o_orderkey % 3 AS VARCHAR)
               || '</a> <a href="n' || CAST(o_orderkey % 7 AS VARCHAR)
               || '.html">  read  more  </a>'
               || '<a href="#skip">never kept</a>' AS html
      FROM orders WHERE o_orderkey % 8 = 0),
    elems AS (
      SELECT src_url, host,
             UNNEST(regexp_extract_all(html,
               '(?is)(<a\\s[^>]*>[^<]*</a>)', 1)) AS e
      FROM pages),
    pairs AS (
      SELECT src_url, host,
             regexp_extract(e, 'href="([^"#][^"]*)"', 1) AS href,
             trim(regexp_extract(e, '>([^<]*)<', 1)) AS anchor
      FROM elems WHERE regexp_extract(e, 'href="([^"#][^"]*)"', 1) <> ''),
    resolved AS (
      SELECT CASE
               WHEN href LIKE '/%' THEN 'https://' || host || href
               ELSE 'https://' || host || '/dir/' || href
             END AS link,
             anchor
      FROM pairs),
    counted AS (
      SELECT link, anchor, COUNT(*) AS n
      FROM resolved GROUP BY link, anchor),
    ranked AS (
      SELECT link, anchor, n,
             ROW_NUMBER() OVER (PARTITION BY link
                                ORDER BY n DESC, anchor) AS rk,
             SUM(n) OVER (PARTITION BY link) AS n_refs
      FROM counted)
    SELECT link, anchor AS top_anchor, CAST(n AS BIGINT) AS top_anchor_refs,
           CAST(n_refs AS BIGINT) AS n_refs
    FROM ranked WHERE rk = 1 ORDER BY link
    """,
)
def q57(spark, sf):
    from ..functions.links import extract_anchor_texts

    # single-row-group scan + anchor-extraction regexes: spread first
    par = spark.sparkContext.defaultParallelism
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 8 == 0).repartition(par)
    url = F.concat(
        F.lit("https://h"), (F.col("o_custkey") % 5).cast("string"),
        F.lit(".ex/dir/page"), F.col("o_orderkey").cast("string"),
        F.lit(".html"),
    )
    html = F.concat(
        F.lit('<a href="/t/'), (F.col("o_orderkey") % 11).cast("string"),
        F.lit('" rel="x">Topic '), (F.col("o_orderkey") % 3).cast("string"),
        F.lit('</a> <a href="n'), (F.col("o_orderkey") % 7).cast("string"),
        F.lit('.html">  read  more  </a>'),
        F.lit('<a href="#skip">never kept</a>'),
    )
    pages = o.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    anchors = extract_anchor_texts(pages)
    counted = anchors.groupBy("link", "anchor").agg(F.count("*").alias("n"))
    wrank = Window.partitionBy("link").orderBy(
        F.col("n").desc(), F.col("anchor").asc()
    )
    wsum = Window.partitionBy("link")
    return (
        counted.withColumn("rk", F.row_number().over(wrank))
        .withColumn("n_refs", F.sum("n").over(wsum))
        .filter(F.col("rk") == 1)
        .select(
            "link",
            F.col("anchor").alias("top_anchor"),
            F.col("n").cast("long").alias("top_anchor_refs"),
            F.col("n_refs").cast("long").alias("n_refs"),
        )
        .orderBy("link")
    )


# =====================================================================
# deterministic hash-stratified sampling — the training-mix rebalance
# step (downsample the majority language, keep the tail).  The keep
# decision is md5(doc_id) < per-stratum hex threshold: reproducible
# across engines/runs/cluster sizes (no RNG, no seed drift between
# partitions), embarrassingly parallel (map-only filter — the sample
# never shuffles), and composable (the same row is kept in every
# rerun, so incremental pipelines don't churn).  Thresholds: en keeps
# md5 < '4' (~25%), everything else < 'c' (~75%).
# =====================================================================
@query(
    "q58_stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) <
          CASE WHEN lang = 'en' THEN '4' ELSE 'c' END
    ORDER BY doc_id
    """,
)
def q58(spark, sf):
    d = _t(spark, sf, "documents")
    thr = F.when(F.col("lang") == "en", F.lit("4")).otherwise(F.lit("c"))
    return (
        d.filter(F.md5(F.col("doc_id").cast("string")) < thr)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# =====================================================================
# IVF ANN — the coarse-quantizer scale path for similarity search
# (operators/ann.py).  Rows-only by design: the deterministic k-means
# codebook is not reasonably expressible in SQL; instead the local
# test suite pins the strongest possible property — ivf_search with
# nprobe = k returns EXACTLY the brute-force top-k (ids and order),
# and partial probe is measured as recall against it with verified
# partition pruning (test_video_links_sampling).  Sits outside the
# driver's 50-query grading window with the other no-oracle entries.
# =====================================================================
@query("q59_ivf_ann", None)
def q59(spark, sf):
    from ..operators.ann import ivf_assign, ivf_search, train_ivf_codebook

    e = _t(spark, sf, "embeddings")
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    cent = train_ivf_codebook(e, k=16, n_iter=3)
    indexed = ivf_assign(e.filter(F.col("vec_id") != qrow["vec_id"]), cent)
    return ivf_search(indexed, cent, qrow["embedding"], k=10, nprobe=4)


# =====================================================================
# trigram-LM rarity score — the CCNet-style cheap LM quality signal
# (Wenzek et al. 2020 score docs by LM perplexity; avg corpus n-gram
# frequency is its standard two-pass SQL-exact proxy).  Pass 1 builds
# the LM: corpus char-trigram counts.  Pass 2 joins each doc's
# trigrams back and averages.  Scale shape: the LM table is bounded by
# |alphabet|^3 rows regardless of corpus size, so at 100 TB pass 2 is
# a BROADCAST join against a few-MB dimension (AQE picks this up from
# the aggregated size; no hint needed at bench scale) — the corpus
# shuffles once, in pass 1, with map-side partial aggregation.  The
# score is SUM(freq)/COUNT(*) over exact integers — one final
# division, so no float-summation-order drift between engines.
# =====================================================================
@query(
    "q60_trigram_lm_score",
    """
    WITH tri AS (
      SELECT doc_id, substr(text, i, 3) AS tri
      FROM documents,
           UNNEST(range(1, GREATEST(LENGTH(text) - 2, 0) + 1)) AS t(i)
      WHERE LENGTH(text) >= 3),
    lm AS (SELECT tri, COUNT(*) AS freq FROM tri GROUP BY tri)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tri,
           CAST(SUM(freq) AS BIGINT) AS sum_freq,
           ROUND(SUM(freq) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_tri_freq
    FROM tri JOIN lm USING (tri)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def q60(spark, sf):
    # single-row-group scan + a ~10M-row trigram explode consumed by
    # BOTH the LM aggregate and the scoring join: spread rows so the
    # two subtree executions at least run parallel (see q69 note)
    par = spark.sparkContext.defaultParallelism
    d = _t(spark, sf, "documents").filter(F.length("text") >= 3).repartition(par)
    tri_arr = F.transform(
        F.sequence(F.lit(1), F.length("text") - 2),
        lambda i: F.substring(F.col("text"), i, F.lit(3)),
    )
    ex = d.select("doc_id", F.explode(tri_arr).alias("tri"))
    lm = ex.groupBy("tri").agg(F.count("*").alias("freq"))
    return (
        ex.join(lm, "tri")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tri"),
            F.sum("freq").cast("long").alias("sum_freq"),
        )
        .withColumn(
            "avg_tri_freq", F.round(F.col("sum_freq") / F.col("n_tri"), 4)
        )
        .orderBy("doc_id")
    )


# =====================================================================
# C4-style line-level cross-corpus dedup (Raffel et al. 2020 §2.2:
# drop any line occurring more than once in the corpus, keep the rest
# of the doc).  Lines are the same 8-word chunks as q55.  Scale shape:
# the occurrence count groups by md5(line) so only 32-byte hashes
# shuffle, never the line text (the same narrow-shuffle trick as the
# URL-seen path, dedup.py); reassembly is one groupBy(doc_id) with an
# in-memory array_sort over that doc's own lines — bounded by doc
# length, not corpus size.  text_hash returns md5 of the rebuilt doc
# so the parity check pins the full reassembled text without moving
# it through the driver.
# =====================================================================
@query(
    "q61_line_dedup",
    """
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS w
      FROM documents),
    lines AS (
      SELECT doc_id, i AS idx,
             array_to_string(w[((i-1)*8+1):least((i-1)*8+8, len(w))],
                             ' ') AS line
      FROM tok,
           UNNEST(generate_series(1, CAST(ceil(len(w) / 8.0) AS INT)))
             AS t(i)),
    flagged AS (
      SELECT doc_id, idx, line,
             COUNT(*) OVER (PARTITION BY md5(line)) AS n_occ
      FROM lines)
    SELECT doc_id,
           CAST(SUM(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(COALESCE(string_agg(CASE WHEN n_occ = 1 THEN line END,
                                   ' ' ORDER BY idx), '')) AS text_hash
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
)
def q61(spark, sf):
    d = _t(spark, sf, "documents")
    w = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    docs = d.select("doc_id", w.alias("w"))
    n = F.size("w")
    lines_arr = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), F.ceil(n / F.lit(8.0)).cast("int")),
            lambda i: F.array_join(F.slice(F.col("w"), (i - 1) * 8 + 1, 8), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # posexplode on an empty array emits nothing — a whitespace-only
    # doc is absent from the output in both engines
    lines = docs.select(
        "doc_id", F.posexplode(lines_arr).alias("pos", "line")
    ).withColumn("lh", F.md5("line"))
    cnt = lines.groupBy("lh").agg(F.count("*").alias("n_occ"))
    flagged = lines.join(cnt, "lh")
    kept_struct = F.when(
        F.col("n_occ") == 1, F.struct(F.col("pos"), F.col("line"))
    )  # collect_list skips the NULLs of removed lines
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("n_occ") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["line"],
                    ),
                    " ",
                )
            ).alias("text_hash"),
        )
        .orderBy("doc_id")
    )


# =====================================================================
# benchmark-contamination scan — flag corpus docs containing any
# 13-word span of a benchmark set (the n-gram-overlap decontamination
# check of GPT-3 appx. C / PaLM: 13-grams).  The benchmark here is
# synthesized deterministically from the corpus itself (words 5..17
# of every doc_id % 37 == 0 doc), so source docs are guaranteed hits
# and exact-dup partners surface as cross-doc contamination; a
# production run would feed real benchmark rows and add
# `g.doc_id != b.bench_id`.  Scale shape: the benchmark side is tiny
# and explicitly broadcast — the 13-gram explode of the corpus is
# map-only, joins against the broadcast on a 32-byte md5 key, and
# never shuffles (contamination at 100 TB is a scan, not a shuffle).
# =====================================================================
@query(
    "q62_contamination_13gram",
    """
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS w
      FROM documents),
    bench AS (
      SELECT doc_id AS bench_id, array_to_string(w[5:17], ' ') AS ngram
      FROM tok WHERE doc_id % 37 = 0 AND len(w) >= 17),
    grams AS (
      SELECT doc_id, array_to_string(w[i:i+12], ' ') AS ngram
      FROM tok, UNNEST(generate_series(1, len(w) - 12)) AS t(i)
      WHERE len(w) >= 13)
    SELECT g.doc_id,
           CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_hits
    FROM grams g JOIN bench b ON md5(g.ngram) = md5(b.ngram)
    GROUP BY g.doc_id ORDER BY g.doc_id
    """,
)
def q62(spark, sf):
    d = _t(spark, sf, "documents")
    w = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    docs = d.select("doc_id", w.alias("w"))
    bench = docs.filter((F.col("doc_id") % 37 == 0) & (F.size("w") >= 17)).select(
        F.col("doc_id").alias("bench_id"),
        F.md5(F.array_join(F.slice(F.col("w"), 5, 13), " ")).alias("gh"),
    )
    grams = docs.filter(F.size("w") >= 13).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 12),
                lambda i: F.md5(F.array_join(F.slice(F.col("w"), i, 13), " ")),
            )
        ).alias("gh"),
    )
    return (
        grams.join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(F.count_distinct("bench_id").cast("long").alias("n_bench_hits"))
        .orderBy("doc_id")
    )


# =====================================================================
# adaptive recrawl-interval estimation — the freshness policy of
# Cho & Garcia-Molina 2003 ("Effective page refresh policies"): watch
# each url's content signature across fetches, estimate its change
# rate, and set the next revisit interval by linear interpolation
# between a 6 h floor (always changing) and a 168 h ceiling (never
# changed).  Fetch history is synthesized from orders (url_id, fetch
# ts, signature), ordered by (ts, tie) so LAG is deterministic under
# same-day fetches.  Scale shape: one window partitioned by url_id —
# url cardinality IS the parallelism at 10^10 urls; the interpolation
# is a single exact-integer division (no float-order drift).  Feeds
# FrontierStore.recrawl's next_fetch_after the same way the fixed
# interval does today.
# =====================================================================
@query(
    "q63_recrawl_interval",
    """
    WITH hist AS (
      SELECT o_custkey % 101 AS url_id, o_orderdate AS ts,
             o_orderkey AS tie, o_orderkey % 3 AS sig
      FROM orders WHERE o_orderkey % 5 = 0),
    lagged AS (
      SELECT url_id, sig,
             LAG(sig) OVER (PARTITION BY url_id ORDER BY ts, tie)
               AS prev_sig
      FROM hist)
    SELECT url_id,
           CAST(COUNT(*) AS BIGINT) AS n_fetches,
           CAST(SUM(CASE WHEN prev_sig IS NOT NULL AND sig <> prev_sig
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
           ROUND(CASE WHEN COUNT(*) <= 1 THEN 168.0
                 ELSE 6 + 162 * (COUNT(*) - 1
                        - SUM(CASE WHEN prev_sig IS NOT NULL
                                    AND sig <> prev_sig
                              THEN 1 ELSE 0 END))
                      / CAST(COUNT(*) - 1 AS DOUBLE) END, 4)
             AS next_interval_h
    FROM lagged GROUP BY url_id ORDER BY url_id
    """,
)
def q63(spark, sf):
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0)
    hist = o.select(
        (F.col("o_custkey") % 101).alias("url_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tie"),
        (F.col("o_orderkey") % 3).alias("sig"),
    )
    w = Window.partitionBy("url_id").orderBy("ts", "tie")
    lagged = hist.withColumn("prev_sig", F.lag("sig").over(w))
    changed = F.when(
        F.col("prev_sig").isNotNull() & (F.col("sig") != F.col("prev_sig")), 1
    ).otherwise(0)
    agg = lagged.groupBy("url_id").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum(changed).cast("long").alias("n_changes"),
    )
    pairs = (F.col("n_fetches") - 1).cast("double")
    interval = F.when(F.col("n_fetches") <= 1, F.lit(168.0)).otherwise(
        6 + 162 * (pairs - F.col("n_changes")) / pairs
    )
    return agg.withColumn("next_interval_h", F.round(interval, 4)).orderBy(
        "url_id"
    )


# =====================================================================
# redirect-chain resolution — follow each url's 3xx redirect edge to
# its terminal target, depth-bounded at 8 hops, flagging cycles (the
# canonical-url step every crawler runs before frontier insert; cf.
# RFC 9110 §15.4 redirect loops).  The redirect map is functional
# (GROUP BY src MIN(dst) pins one edge per source deterministically).
# Spark side: 7 successive LEFT joins — an already-terminal row finds
# no match and carries unchanged, so the loop is a fixed-point walk
# identical to the oracle's depth-bounded recursive CTE; lineage is
# cut every 3 hops (localCheckpoint, the components.py pattern).
# Scale shape: each hop is one equality join on the current node —
# O(|urls| · maxdepth) total work, no window, no cross product; at
# 10^10 urls the map side would be bucketed by src so every hop
# reuses the same partitioning.
# =====================================================================
@query(
    "q64_redirect_resolve",
    """
    WITH RECURSIVE raw AS (
      SELECT o_orderkey % 211 AS src, (o_orderkey * 3 + 1) % 211 AS dst
      FROM orders
      WHERE o_orderkey % 4 = 1 AND (o_orderkey % 211) % 3 <> 0
      UNION ALL SELECT 300, 301 UNION ALL SELECT 301, 300),
    edges AS (SELECT src, MIN(dst) AS dst FROM raw GROUP BY src),
    walk AS (
      SELECT src AS start, dst AS cur, 1 AS depth FROM edges
      UNION ALL
      SELECT w.start, e.dst, w.depth + 1
      FROM walk w JOIN edges e ON w.cur = e.src
      WHERE w.depth < 8),
    final AS (
      SELECT start, cur, depth,
             ROW_NUMBER() OVER (PARTITION BY start
                                ORDER BY depth DESC) AS rk
      FROM walk)
    SELECT f.start AS src,
           CAST(f.cur AS BIGINT) AS final_url,
           CAST(f.depth AS BIGINT) AS hops,
           CASE WHEN e.src IS NULL THEN 'resolved' ELSE 'loop' END
             AS status
    FROM final f LEFT JOIN edges e ON f.cur = e.src
    WHERE f.rk = 1 ORDER BY f.start
    """,
)
def q64(spark, sf):
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderkey") % 4 == 1)
        & ((F.col("o_orderkey") % 211) % 3 != 0)  # ~1/3 of nodes terminal
    )
    raw = o.select(
        (F.col("o_orderkey") % 211).alias("src"),
        ((F.col("o_orderkey") * 3 + 1) % 211).alias("dst"),
    ).unionByName(  # planted 2-cycle exercises the loop-detection branch
        o.sparkSession.createDataFrame(
            [(300, 301), (301, 300)], schema="src long, dst long"
        )
    )
    edges = raw.groupBy("src").agg(F.min("dst").alias("dst")).localCheckpoint()
    e2 = edges.select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
    )
    state = edges.select(
        F.col("src").alias("start"),
        F.col("dst").alias("cur"),
        F.lit(1).alias("depth"),
    )
    for hop in range(2, 9):
        state = (
            state.join(e2, state["cur"] == e2["e_src"], "left")
            .select(
                "start",
                F.coalesce("e_dst", "cur").alias("cur"),
                F.when(F.col("e_dst").isNotNull(), F.col("depth") + 1)
                .otherwise(F.col("depth"))
                .alias("depth"),
            )
        )
        if hop % 3 == 0:
            state = state.localCheckpoint()
    return (
        state.join(e2, state["cur"] == e2["e_src"], "left")
        .select(
            F.col("start").alias("src"),
            F.col("cur").cast("long").alias("final_url"),
            F.col("depth").cast("long").alias("hops"),
            F.when(F.col("e_src").isNull(), F.lit("resolved"))
            .otherwise(F.lit("loop"))
            .alias("status"),
        )
        .orderBy("src")
    )


# =====================================================================
# BPE vocabulary induction — the tokenizer-training step
# (operators/bpe.py).  Rows-only by design: the merge loop is
# iterative (argmax → rewrite → recount), not SQL; the local gate pins
# the strongest property instead — the full merge list equals an
# independent single-process reference implementation over the same
# corpus, and is invariant under repartitioning.  Scale: the loop runs
# on the distinct-word frequency table (one corpus pass, then ~10^7
# rows for web text no matter how many TB feed it); pair counting is
# pure Catalyst, one driver row per iteration.
# =====================================================================
@query("q65_bpe_vocab", None)
def q65(spark, sf):
    from ..operators.bpe import train_bpe

    d = _t(spark, sf, "documents")
    merges = train_bpe(d, n_merges=8)
    return spark.createDataFrame(
        [
            (i, a, b, a + b, cnt)
            for i, (a, b, cnt) in enumerate(merges)
        ],
        schema="rank long, left string, right string, merged string, cnt long",
    )


# =====================================================================
# WET-style visible-text extraction (functions/wet.py) — the
# Common-Crawl html→text step: script/style/comment blocks removed
# wholly, tags → space, core entities decoded, whitespace collapsed.
# Pure chained regexp_replace in whole-stage codegen; the oracle runs
# the IDENTICAL regex chain in DuckDB ('g' flag = Spark's replace-all
# default), so the parity gate pins every rule.  Pages are synthesized
# from orders with script/style/comment/entity plantings.
# =====================================================================
@query(
    "q66_wet_extract",
    r"""
    WITH pages AS (
      SELECT o_orderkey AS page_id,
             '<html><head><title>T' || CAST(o_orderkey % 7 AS VARCHAR)
               || '</title><style>p { color: red }</style>'
               || '<script type="text/javascript">var x = 1 < 2;</script>'
               || '</head><body><!-- hidden ' || CAST(o_orderkey % 5 AS VARCHAR)
               || ' --><h1>Heading&nbsp;' || CAST(o_orderkey % 3 AS VARCHAR)
               || '</h1><p>A &amp; B &lt;tag&gt; &quot;q&quot; it&#39;s</p>'
               || '<div>word' || CAST(o_orderkey % 11 AS VARCHAR)
               || '</div></body></html>' AS html_text
      FROM orders WHERE o_orderkey % 6 = 0)
    SELECT page_id,
           trim(regexp_replace(
             regexp_replace(
              regexp_replace(
               regexp_replace(
                regexp_replace(
                 regexp_replace(
                  regexp_replace(
                   regexp_replace(
                    regexp_replace(
                     regexp_replace(
                      regexp_replace(
                       regexp_replace(html_text,
                        '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
                       '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
                      '(?s)<!--.*?-->', ' ', 'g'),
                     '(?s)<[^>]*>', ' ', 'g'),
                    '&nbsp;', ' ', 'g'),
                   '&amp;', '&', 'g'),
                  '&lt;', '<', 'g'),
                 '&gt;', '>', 'g'),
                '&quot;', '"', 'g'),
               '&#0*39;', chr(39), 'g'),
              '&apos;', chr(39), 'g'),
             '\s+', ' ', 'g')) AS text
    FROM pages ORDER BY page_id
    """,
)
def q66(spark, sf):
    from ..functions.wet import strip_markup

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 6 == 0)
    html = F.concat(
        F.lit("<html><head><title>T"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit("</title><style>p { color: red }</style>"),
        F.lit('<script type="text/javascript">var x = 1 < 2;</script>'),
        F.lit("</head><body><!-- hidden "), (F.col("o_orderkey") % 5).cast("string"),
        F.lit(" --><h1>Heading&nbsp;"), (F.col("o_orderkey") % 3).cast("string"),
        F.lit("</h1><p>A &amp; B &lt;tag&gt; &quot;q&quot; it&#39;s</p>"),
        F.lit("<div>word"), (F.col("o_orderkey") % 11).cast("string"),
        F.lit("</div></body></html>"),
    )
    pages = o.select(F.col("o_orderkey").alias("page_id"), html.alias("html_text"))
    return pages.select("page_id", strip_markup("html_text").alias("text")).orderBy(
        "page_id"
    )


# =====================================================================
# PII redaction (functions/pii.py) — the C4/CCNet pre-training scrub:
# emails / IPv4 / international phones → tags, chained regexp_replace
# restricted to Java-regex ∩ RE2 syntax so the DuckDB oracle pins each
# rule byte-exactly.  Flags are computed on the ORIGINAL text (audit
# contract); redaction order email → ip → phone is part of the
# contract and exercised by the plantings (dotted quads would feed the
# phone rule's digit groups if reordered).
# =====================================================================
@query(
    "q67_pii_redact",
    r"""
    WITH pages AS (
      SELECT o_orderkey AS page_id,
             'User u' || CAST(o_orderkey % 7 AS VARCHAR)
               || ' mail u' || CAST(o_orderkey % 7 AS VARCHAR)
               || '@ex' || CAST(o_orderkey % 3 AS VARCHAR)
               || '.org ip 10.0.' || CAST(o_orderkey % 5 AS VARCHAR)
               || '.' || CAST(o_orderkey % 9 AS VARCHAR)
               || ' call +82 010-12' || CAST(o_orderkey % 10 AS VARCHAR)
               || '4-5678 ver v1.' || CAST(o_orderkey % 4 AS VARCHAR)
               || ' price $42' AS text
      FROM orders WHERE o_orderkey % 6 = 1)
    SELECT page_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+\d{1,2}[ -]?\d{3}[ -]?\d{3,4}[ -]?\d{4}\b',
             '<PHONE>', 'g') AS text,
           regexp_matches(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS has_email,
           regexp_matches(text,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b') AS has_ip,
           regexp_matches(text,
             '\+\d{1,2}[ -]?\d{3}[ -]?\d{3,4}[ -]?\d{4}\b') AS has_phone
    FROM pages ORDER BY page_id
    """,
)
def q67(spark, sf):
    from ..functions.pii import pii_flags, redact_pii

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 6 == 1)
    text = F.concat(
        F.lit("User u"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit(" mail u"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit("@ex"), (F.col("o_orderkey") % 3).cast("string"),
        F.lit(".org ip 10.0."), (F.col("o_orderkey") % 5).cast("string"),
        F.lit("."), (F.col("o_orderkey") % 9).cast("string"),
        F.lit(" call +82 010-12"), (F.col("o_orderkey") % 10).cast("string"),
        F.lit("4-5678 ver v1."), (F.col("o_orderkey") % 4).cast("string"),
        F.lit(" price $42"),
    )
    pages = o.select(F.col("o_orderkey").alias("page_id"), text.alias("text"))
    flags = pii_flags("text")
    return pages.select(
        "page_id",
        redact_pii("text").alias("text"),
        flags["has_email"].alias("has_email"),
        flags["has_ip"].alias("has_ip"),
        flags["has_phone"].alias("has_phone"),
    ).orderBy("page_id")


# =====================================================================
# robots html companion in link discovery (functions/links.py
# respect_nofollow): meta-robots-nofollow pages contribute no links,
# rel="nofollow" anchors are dropped (both attribute orders).  The
# oracle re-states the semantics relationally: href extraction minus
# an anti-join on the nofollow'd href set, page-gated on the meta tag.
# =====================================================================
@query(
    "q68_nofollow_links",
    """
    WITH pages AS (
      SELECT 'https://h' || CAST(o_custkey % 5 AS VARCHAR)
               || '.ex/d/p' || CAST(o_orderkey AS VARCHAR) AS src_url,
             'h' || CAST(o_custkey % 5 AS VARCHAR) || '.ex' AS host,
             CASE WHEN o_orderkey % 4 = 0
                  THEN '<meta name="robots" content="noindex, nofollow">'
                  ELSE '' END
               || '<a href="/keep/' || CAST(o_orderkey % 7 AS VARCHAR)
               || '">k</a><a rel="nofollow" href="/drop1/'
               || CAST(o_orderkey % 3 AS VARCHAR)
               || '">n</a><a href="/drop2/' || CAST(o_orderkey % 3 AS VARCHAR)
               || '" rel="ugc nofollow">m</a>' AS html
      FROM orders WHERE o_orderkey % 10 = 2),
    hrefs AS (
      SELECT src_url, host,
             UNNEST(regexp_extract_all(html, 'href="([^"#][^"]*)"', 1)) AS href
      FROM pages
      WHERE NOT regexp_matches(html,
        '<meta[^>]*name="robots"[^>]*content="[^"]*nofollow')),
    nof AS (
      SELECT src_url, UNNEST(regexp_extract_all(html,
        '<a[^>]*rel="[^"]*nofollow[^"]*"[^>]*href="([^"#][^"]*)"', 1)) AS href
      FROM pages
      UNION ALL
      SELECT src_url, UNNEST(regexp_extract_all(html,
        '<a[^>]*href="([^"#][^"]*)"[^>]*rel="[^"]*nofollow[^"]*"', 1)) AS href
      FROM pages),
    kept AS (
      SELECT h.src_url, h.host, h.href
      FROM hrefs h LEFT JOIN (SELECT DISTINCT * FROM nof) n
        ON h.src_url = n.src_url AND h.href = n.href
      WHERE n.href IS NULL)
    SELECT src_url, 'https://' || host || href AS link
    FROM kept ORDER BY src_url, link
    """,
)
def q68(spark, sf):
    from ..functions.links import extract_links

    # single-row-group scan + link/meta-robots regexes: spread first
    par = spark.sparkContext.defaultParallelism
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 2).repartition(par)
    url = F.concat(
        F.lit("https://h"), (F.col("o_custkey") % 5).cast("string"),
        F.lit(".ex/d/p"), F.col("o_orderkey").cast("string"),
    )
    html = F.concat(
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.lit('<meta name="robots" content="noindex, nofollow">'),
        ).otherwise(F.lit("")),
        F.lit('<a href="/keep/'), (F.col("o_orderkey") % 7).cast("string"),
        F.lit('">k</a><a rel="nofollow" href="/drop1/'),
        (F.col("o_orderkey") % 3).cast("string"),
        F.lit('">n</a><a href="/drop2/'), (F.col("o_orderkey") % 3).cast("string"),
        F.lit('" rel="ugc nofollow">m</a>'),
    )
    pages = o.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    return (
        extract_links(pages, respect_nofollow=True)
        .select(F.col("src_url"), F.col("link"))
        .orderBy("src_url", "link")
    )


# =====================================================================
# crawl-trap detection — Heritrix-style frontier hygiene (functions/
# traps.py): calendar descents (path depth), segment-echo loops
# (/s/x/s/x/…), facet grids (query-param count), session-id accretion
# (url length), each ONE Catalyst expression over the discovered url —
# map-only, no shuffle at 10^10 urls; run_crawl(drop_traps=True) gates
# links through it BEFORE the dedup shuffle.  Semantics are regex-
# backreference-free (RE2 oracle-portable): segments = split(path,'/'),
# repeat = max over segments of its occurrence count.  Urls synthesized
# from orders with planted traps of all four kinds.
# =====================================================================
@query(
    "q69_crawl_traps",
    """
    WITH u AS (
      SELECT 'https://h' || CAST(o_custkey % 20 AS VARCHAR) || '.ex' ||
        CASE o_orderkey % 23
          WHEN 0 THEN '/a1/a2/a3/a4/a5/a6/a7/a8/a9/a10/a11/a12/a13'
          WHEN 1 THEN '/s/x/s/x/s/x/s/' || CAST(o_orderkey AS VARCHAR)
          WHEN 2 THEN '/q?p1=1&p2=2&p3=3&p4=4&p5=5&p6=6&p7=7&p8=8&p9=9&p10=10&p11=11'
          WHEN 3 THEN '/long/' || repeat('z', 600)
          ELSE '/a/b' || CAST(o_orderkey % 7 AS VARCHAR) ||
               '?x=' || CAST(o_orderkey % 5 AS VARCHAR)
        END AS url
      FROM orders),
    g AS (
      SELECT url, split_part(url, '://', 2) AS rest,
             instr(split_part(url, '://', 2), '?') AS qpos
      FROM u),
    h AS (
      SELECT url, length(url) AS url_len,
        CASE WHEN qpos > 0 THEN substr(rest, 1, qpos - 1) ELSE rest END AS ph,
        CASE WHEN qpos > 0 THEN substr(rest, qpos + 1) ELSE '' END AS qs
      FROM g),
    i AS (
      SELECT url, url_len, qs,
        list_filter(string_split(ph, '/')[2:], x -> x <> '') AS segs
      FROM h),
    feat AS (
      SELECT url, url_len, len(segs) AS path_depth,
        CASE WHEN len(segs) = 0 THEN 0 ELSE list_max(list_transform(
          segs, s -> len(list_filter(segs, t -> t = s)))) END AS seg_rep,
        CASE WHEN qs = '' THEN 0
             ELSE len(string_split(qs, '&')) END AS n_params
      FROM i)
    SELECT url, CAST(path_depth AS BIGINT) AS path_depth,
           CAST(seg_rep AS BIGINT) AS max_segment_repeat,
           CAST(n_params AS BIGINT) AS n_params,
           CAST(url_len AS BIGINT) AS url_len,
           CASE WHEN path_depth > 12 THEN 'depth'
                WHEN seg_rep > 3 THEN 'segment_repeat'
                WHEN n_params > 10 THEN 'params'
                WHEN url_len > 512 THEN 'length'
                ELSE NULL END AS trap_reason
    FROM feat ORDER BY url
    """,
)
def q69(spark, sf):
    from ..functions.traps import trap_features

    # orders ships as one parquet row group → unsplittable scan; the
    # trap features are heavy interpreted higher-order expressions
    # (seg_rep is O(d²) per row), so spread rows first (9.2 s → ~0.6 s
    # at 32 cores; the crawl-path is_trap gate itself stays map-side —
    # this is query-input parallelism, not an operator change)
    par = spark.sparkContext.defaultParallelism
    o = _t(spark, sf, "orders").repartition(par)
    key = F.col("o_orderkey")
    path = (
        F.when(key % 23 == 0, F.lit("/a1/a2/a3/a4/a5/a6/a7/a8/a9/a10/a11/a12/a13"))
        .when(key % 23 == 1, F.concat(F.lit("/s/x/s/x/s/x/s/"), key.cast("string")))
        .when(
            key % 23 == 2,
            F.lit("/q?p1=1&p2=2&p3=3&p4=4&p5=5&p6=6&p7=7&p8=8&p9=9&p10=10&p11=11"),
        )
        .when(key % 23 == 3, F.concat(F.lit("/long/"), F.repeat(F.lit("z"), 600)))
        .otherwise(
            F.concat(
                F.lit("/a/b"), (key % 7).cast("string"),
                F.lit("?x="), (key % 5).cast("string"),
            )
        )
    )
    url = F.concat(
        F.lit("https://h"), (F.col("o_custkey") % 20).cast("string"),
        F.lit(".ex"), path,
    )
    feats = trap_features(F.col("url"))
    return (
        o.select(url.alias("url"))
        .select("url", *[c.alias(n) for n, c in feats.items()])
        .orderBy("url")
    )


# =====================================================================
# mirror-host detection — hosts serving near-identical document sets
# (operators/hoststats.mirror_host_pairs): distinct (host, signature) →
# frequent-signature guard (a boilerplate sig on k hosts yields
# k(k-1)/2 pairs) → ONE equality self-join on the signature → pair
# counts + jaccard over distinct sigs.  O(matching pairs), never a
# host cross-product; at 10^10 urls the sig join shuffles 8-byte
# hashes.  Hosts/signatures synthesized from orders so host pairs
# share structured overlap.
# =====================================================================
@query(
    "q70_mirror_hosts",
    """
    WITH sigs AS (
      SELECT DISTINCT 'm' || CAST(o_orderkey % 8 AS VARCHAR) AS host,
             o_orderkey % 50 AS sig
      FROM orders WHERE o_orderkey % 3 = 0),
    rare AS (
      SELECT s.host, s.sig FROM sigs s
      JOIN (SELECT sig FROM sigs GROUP BY sig HAVING COUNT(*) <= 64) r
        USING (sig)),
    sizes AS (SELECT host, COUNT(*) AS n_docs FROM rare GROUP BY host),
    shared AS (
      SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS n_shared
      FROM rare a JOIN rare b ON a.sig = b.sig AND a.host < b.host
      GROUP BY a.host, b.host)
    SELECT host_a, host_b, CAST(n_shared AS BIGINT) AS n_shared,
           CAST(sa.n_docs AS BIGINT) AS n_a,
           CAST(sb.n_docs AS BIGINT) AS n_b,
           ROUND(n_shared / CAST(sa.n_docs + sb.n_docs - n_shared AS DOUBLE),
                 4) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.host = shared.host_a
    JOIN sizes sb ON sb.host = shared.host_b
    WHERE n_shared >= 2
    ORDER BY host_a, host_b
    """,
)
def q70(spark, sf):
    from ..operators.hoststats import mirror_host_pairs

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 3 == 0)
    sigs = o.select(
        F.concat(F.lit("m"), (F.col("o_orderkey") % 8).cast("string")).alias(
            "host"
        ),
        (F.col("o_orderkey") % 50).alias("sig"),
    )
    return mirror_host_pairs(
        sigs, host_col="host", sig_col="sig", min_shared=2
    ).orderBy("host_a", "host_b")


# =====================================================================
# host quality rollup — per-host document-quality aggregate feeding
# frontier priority (operators/hoststats.host_quality_rollup): doc
# count, mean length, short-doc fraction, language spread, and a
# priority penalty for hosts whose corpus is mostly fragments.  Exact-
# integer sums with one final division — bit-stable under any
# partitioning; one groupBy, broadcastable host dim at 100 TB (hosts
# ≪ docs).  Hosts synthesized from doc_id.
# =====================================================================
@query(
    "q71_host_quality",
    """
    WITH d AS (
      SELECT 'w' || CAST(doc_id % 11 AS VARCHAR) AS host, text, lang
      FROM documents)
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(length(text)) / CAST(COUNT(*) AS DOUBLE), 4)
             AS mean_chars,
           ROUND(SUM(CASE WHEN length(text) < 200 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS short_frac,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(CASE WHEN SUM(CASE WHEN length(text) < 200 THEN 1 ELSE 0 END)
                          / CAST(COUNT(*) AS DOUBLE) > 0.3
                     THEN -2.0 ELSE 0.0 END AS DOUBLE) AS priority_penalty
    FROM d GROUP BY host ORDER BY host
    """,
)
def q71(spark, sf):
    from ..operators.hoststats import host_quality_rollup

    d = _t(spark, sf, "documents").withColumn(
        "host", F.concat(F.lit("w"), (F.col("doc_id") % 11).cast("string"))
    )
    # 0.3 straddles the synthetic corpus (per-host short fractions
    # spread ~0.15-0.45), so BOTH penalty branches appear in the output
    return host_quality_rollup(d, demote_short_frac=0.3).orderBy("host")


# =====================================================================
# conditional-revalidation accounting (RFC 9110 §13.1 If-None-Match /
# If-Modified-Since): replay each url's fetch history and count the
# refetches where the validator (etag) was unchanged — those would
# have been 304 Not Modified responses, saving the full body transfer.
# Per-url output feeds the fetch planner: a url with high saved_frac
# should be fetched conditionally (cheap) and on a long q63 interval.
# Same scale shape as q63: ONE window partitioned by url_id (url
# cardinality is the parallelism), exact-integer sums, one division.
# =====================================================================
@query(
    "q72_revalidation_savings",
    """
    WITH hist AS (
      SELECT o_custkey % 101 AS url_id, o_orderdate AS ts,
             o_orderkey AS tie, o_orderkey % 4 AS etag,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS body_bytes
      FROM orders WHERE o_orderkey % 7 = 0),
    lagged AS (
      SELECT url_id, etag, body_bytes,
             LAG(etag) OVER (PARTITION BY url_id ORDER BY ts, tie)
               AS prev_etag
      FROM hist)
    SELECT url_id,
           CAST(SUM(CASE WHEN prev_etag IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_refetches,
           CAST(SUM(CASE WHEN prev_etag IS NOT NULL AND etag = prev_etag
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_not_modified,
           CAST(SUM(CASE WHEN prev_etag IS NOT NULL AND etag = prev_etag
                         THEN body_bytes ELSE 0 END) AS BIGINT)
             AS bytes_saved,
           ROUND(CASE WHEN SUM(CASE WHEN prev_etag IS NOT NULL
                                    THEN 1 ELSE 0 END) = 0 THEN 0.0
                 ELSE SUM(CASE WHEN prev_etag IS NOT NULL
                               AND etag = prev_etag THEN 1 ELSE 0 END)
                      / CAST(SUM(CASE WHEN prev_etag IS NOT NULL
                                      THEN 1 ELSE 0 END) AS DOUBLE)
                 END, 4) AS saved_frac
    FROM lagged GROUP BY url_id ORDER BY url_id
    """,
)
def q72(spark, sf):
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 7 == 0)
    hist = o.select(
        (F.col("o_custkey") % 101).alias("url_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tie"),
        (F.col("o_orderkey") % 4).alias("etag"),
        # exact-integer bytes: SUM order must not matter (float
        # accumulation order differs between engines/partitionings)
        F.floor(F.col("o_totalprice")).alias("body_bytes"),
    )
    w = Window.partitionBy("url_id").orderBy("ts", "tie")
    lagged = hist.withColumn("prev_etag", F.lag("etag").over(w))
    refetch = F.when(F.col("prev_etag").isNotNull(), 1).otherwise(0)
    unchanged = F.when(
        F.col("prev_etag").isNotNull() & (F.col("etag") == F.col("prev_etag")), 1
    ).otherwise(0)
    saved = F.when(
        F.col("prev_etag").isNotNull() & (F.col("etag") == F.col("prev_etag")),
        F.col("body_bytes"),
    ).otherwise(F.lit(0))
    agg = lagged.groupBy("url_id").agg(
        F.sum(refetch).cast("long").alias("n_refetches"),
        F.sum(unchanged).cast("long").alias("n_not_modified"),
        F.sum(saved).cast("long").alias("bytes_saved"),
        F.sum(refetch).alias("_nr"),
        F.sum(unchanged).alias("_nm"),
    )
    frac = F.when(F.col("_nr") == 0, F.lit(0.0)).otherwise(
        F.col("_nm") / F.col("_nr").cast("double")
    )
    return (
        agg.withColumn("saved_frac", F.round(frac, 4))
        .drop("_nr", "_nm")
        .orderBy("url_id")
    )


# =====================================================================
# sitemap lastmod entries — sitemaps.org pairs each <loc> with an
# optional <lastmod>; that hint feeds the recrawl policy directly (a
# stored row older than the advertised lastmod re-queues; q63's
# change-rate estimate covers urls without the hint).  Extraction is
# one regexp block-walk in codegen (functions/links.
# extract_sitemap_entries): <url>/<sitemap> blocks → per-block loc +
# nullable lastmod.  The oracle states the EXPECTED rows from the same
# construction (q68 style), so the test pins extraction semantics
# end-to-end — including trim, the missing-lastmod null, and the
# two-entries-per-page explode.
# =====================================================================
@query(
    "q73_sitemap_lastmod",
    """
    WITH k AS (SELECT o_orderkey AS key FROM orders
               WHERE o_orderkey % 6 = 1),
    first_entry AS (
      SELECT 'https://sm.ex/m' || CAST(key AS VARCHAR) AS src_url,
             'https://sm.ex/p' || CAST(key AS VARCHAR) AS loc,
             CASE WHEN key % 3 = 0
                  THEN '2026-0' || CAST(key % 9 + 1 AS VARCHAR) || '-15'
                  ELSE NULL END AS lastmod
      FROM k),
    second_entry AS (
      SELECT 'https://sm.ex/m' || CAST(key AS VARCHAR) AS src_url,
             'https://sm.ex/q' || CAST(key AS VARCHAR) AS loc,
             CAST(NULL AS VARCHAR) AS lastmod
      FROM k WHERE key % 4 = 0)
    SELECT * FROM first_entry UNION ALL SELECT * FROM second_entry
    ORDER BY src_url, loc
    """,
)
def q73(spark, sf):
    from ..functions.links import extract_sitemap_entries

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 6 == 1)
    key = F.col("o_orderkey").cast("string")
    lastmod = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.concat(
            F.lit("<lastmod> 2026-0"),
            ((F.col("o_orderkey") % 9) + 1).cast("string"),
            F.lit("-15 </lastmod>"),
        ),
    ).otherwise(F.lit(""))
    block2 = F.when(
        F.col("o_orderkey") % 4 == 0,
        F.concat(
            F.lit("<url><loc>https://sm.ex/q"), key, F.lit("</loc></url>")
        ),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit("<urlset><url><loc> https://sm.ex/p"), key, F.lit(" </loc>"),
        lastmod, F.lit("</url>"), block2, F.lit("</urlset>"),
    )
    pages = o.select(
        F.concat(F.lit("https://sm.ex/m"), key).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    return extract_sitemap_entries(pages).orderBy("src_url", "loc")


# =====================================================================
# static-asset url filter — CCBot-style discovery hygiene (functions/
# traps.is_static_asset): a text crawl drops css/js/media/archive
# links at discovery (one case-insensitive rlike on the path, query
# string ignored), so those bytes are never fetched.  run_crawl(
# drop_assets=True, default on; --keep-assets).  The oracle states the
# expected flag from the construction: extension membership decides,
# '.PDF' (convertible document) and '.zipper.html' (guard: extension
# anchored at path end) stay followable.
# =====================================================================
@query(
    "q74_asset_filter",
    """
    WITH u AS (
      SELECT o_orderkey AS key,
        CASE o_orderkey % 7 WHEN 0 THEN '.css' WHEN 1 THEN '.js'
          WHEN 2 THEN '.png' WHEN 3 THEN '.zipper.html' WHEN 4 THEN ''
          WHEN 5 THEN '.zip' ELSE '.PDF' END AS ext
      FROM orders)
    SELECT 'https://a' || CAST(key % 13 AS VARCHAR) || '.ex/f' ||
             CAST(key AS VARCHAR) || ext ||
             CASE WHEN key % 2 = 0
                  THEN '?v=' || CAST(key % 5 AS VARCHAR) ELSE '' END
             AS url,
           ext IN ('.css', '.js', '.png', '.zip') AS is_asset
    FROM u ORDER BY url
    """,
)
def q74(spark, sf):
    from ..functions.traps import is_static_asset

    o = _t(spark, sf, "orders")
    key = F.col("o_orderkey")
    ext = (
        F.when(key % 7 == 0, ".css").when(key % 7 == 1, ".js")
        .when(key % 7 == 2, ".png").when(key % 7 == 3, ".zipper.html")
        .when(key % 7 == 4, "").when(key % 7 == 5, ".zip")
        .otherwise(".PDF")
    )
    url = F.concat(
        F.lit("https://a"), (key % 13).cast("string"), F.lit(".ex/f"),
        key.cast("string"), ext,
        F.when(
            key % 2 == 0, F.concat(F.lit("?v="), (key % 5).cast("string"))
        ).otherwise(F.lit("")),
    )
    return (
        o.select(url.alias("url"))
        .withColumn("is_asset", is_static_asset(F.col("url")))
        .orderBy("url")
    )


# =====================================================================
# image near-dup via perceptual hash — the multimodal dedup entry
# (operators/multimodal: encode_png fixture synth → REAL decode_png →
# phash64 → banded pair join).  Rows-only by design: pixel decode has
# no DuckDB twin; exactness is pinned by the planted-pair pytest
# (smooth base vs +noise copy pairs, structurally-different images
# never pair).  Scale shape: hashing is map-only over Arrow batches;
# candidate pairs come from a 16-bit-band equality join (the SimHash
# pigeonhole), never an all-pairs distance.
# =====================================================================
@query("q75_image_neardup", None)
def q75(spark, sf):
    import numpy as np

    from ..operators.multimodal import (
        encode_png,
        extract_phash,
        phash_near_dup_pairs,
    )

    ids = (
        _t(spark, sf, "orders")
        .select((F.col("o_orderkey") % 40).alias("img_id"))
        .distinct()
        .orderBy("img_id")
    )

    def synth(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for img_id in pdf["img_id"]:
                k = int(img_id)
                y, x = np.mgrid[0:24, 0:24]
                base = np.dstack(
                    [
                        127 + 90 * np.cos(y / (3.0 + k % 7)) * np.sin(x / 5.0),
                        127 + 80 * np.sin((x + y) / (4.0 + k % 5)),
                        127 + 70 * np.cos(x / (6.0 + k % 3)),
                    ]
                )
                base = np.clip(np.rint(base), 0, 255).astype(np.uint8)
                rows.append(
                    {"url": f"https://img.ex/{k}.png",
                     "html": encode_png(base)}
                )
                if k % 4 == 0:  # planted near-dup: deterministic +2 shift
                    near = np.clip(base.astype(int) + 2, 0, 255).astype(
                        np.uint8
                    )
                    rows.append(
                        {"url": f"https://img.ex/{k}-copy.png",
                         "html": encode_png(near)}
                    )
            yield pd.DataFrame(rows, columns=["url", "html"])

    pages = ids.mapInPandas(synth, schema="url string, html binary")
    pairs = phash_near_dup_pairs(extract_phash(pages), max_hamming=10)
    return pairs.orderBy("url_a", "url_b")


# =====================================================================
# extended Gopher quality rules — the word-level half of Rae et al.
# 2021 table A1 (complements q55's repetition signals): mean word
# length, alpha-word fraction (≥80% required), symbol-to-word ratio
# ('#'/ellipsis ≤0.1), stopword presence (≥2 of the 8 probe words).
# Map-only array expressions (plans/webtext.gopher_quality_cols);
# exact-integer sums with one final division.
# =====================================================================
@query(
    "q76_gopher_rules",
    """
    WITH w AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS words
      FROM documents),
    f AS (
      SELECT doc_id, text, words, len(words) AS n,
        COALESCE(list_sum(list_transform(words, x -> length(x))), 0)
          AS total_len,
        len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
          AS n_alpha,
        (length(text) - length(replace(text, '#', '')))
          + (length(text) - length(replace(text, '…', '')))
          + (len(string_split(text, '...')) - 1) AS n_sym,
        (CASE WHEN ' ' || lower(text) || ' ' LIKE '% the %' THEN 1 ELSE 0 END
         + CASE WHEN ' ' || lower(text) || ' ' LIKE '% be %' THEN 1 ELSE 0 END
         + CASE WHEN ' ' || lower(text) || ' ' LIKE '% to %' THEN 1 ELSE 0 END
         + CASE WHEN ' ' || lower(text) || ' ' LIKE '% of %' THEN 1 ELSE 0 END
         + CASE WHEN ' ' || lower(text) || ' ' LIKE '% and %' THEN 1 ELSE 0 END
         + CASE WHEN ' ' || lower(text) || ' ' LIKE '% that %' THEN 1 ELSE 0 END
         + CASE WHEN ' ' || lower(text) || ' ' LIKE '% have %' THEN 1 ELSE 0 END
         + CASE WHEN ' ' || lower(text) || ' ' LIKE '% with %' THEN 1 ELSE 0 END
        ) AS n_stop
      FROM w)
    SELECT doc_id, CAST(n AS BIGINT) AS n_words,
           CASE WHEN n = 0 THEN 0.0
                ELSE ROUND(total_len / CAST(n AS DOUBLE), 4)
           END AS mean_word_len,
           CASE WHEN n = 0 THEN 0.0
                ELSE ROUND(n_alpha / CAST(n AS DOUBLE), 4)
           END AS alpha_word_frac,
           CASE WHEN n = 0 THEN 0.0
                ELSE ROUND(n_sym / CAST(n AS DOUBLE), 4)
           END AS symbol_frac,
           CAST(n_stop AS BIGINT) AS n_stopwords
    FROM f ORDER BY doc_id
    """,
)
def q76(spark, sf):
    from .webtext import gopher_quality_cols

    d = _t(spark, sf, "documents")
    cols = gopher_quality_cols()
    return d.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]
    ).orderBy("doc_id")


# =====================================================================
# RSS/Atom feed discovery — the standing freshness channel next to
# sitemaps (functions/links.extract_feed_entries): <item>/<entry>
# block walk in one codegen regexp pass, RSS <link>text</link> +
# <pubDate> and Atom <link href> + <updated>, missing timestamps
# null.  Expected-rows oracle (q68 style) pins the extraction
# semantics end-to-end.
# =====================================================================
@query(
    "q77_feed_entries",
    """
    WITH k AS (SELECT o_orderkey AS key FROM orders
               WHERE o_orderkey % 9 = 2),
    rss AS (
      SELECT 'https://f.ex/rss' || CAST(key AS VARCHAR) AS src_url,
             'https://f.ex/post' || CAST(key AS VARCHAR) AS link,
             CASE WHEN key % 2 = 0
                  THEN 'Mon, 0' || CAST(key % 7 + 1 AS VARCHAR)
                       || ' Jul 2026 10:00:00 GMT'
                  ELSE NULL END AS published
      FROM k),
    atom AS (
      SELECT 'https://f.ex/rss' || CAST(key AS VARCHAR) AS src_url,
             'https://f.ex/alt' || CAST(key AS VARCHAR) AS link,
             CASE WHEN key % 3 = 0
                  THEN '2026-07-0' || CAST(key % 9 + 1 AS VARCHAR)
                       || 'T12:00:00Z'
                  ELSE NULL END AS published
      FROM k WHERE key % 5 = 0)
    SELECT * FROM rss UNION ALL SELECT * FROM atom
    ORDER BY src_url, link
    """,
)
def q77(spark, sf):
    from ..functions.links import extract_feed_entries

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 9 == 2)
    key = F.col("o_orderkey").cast("string")
    pubdate = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.concat(
            F.lit("<pubDate>Mon, 0"),
            ((F.col("o_orderkey") % 7) + 1).cast("string"),
            F.lit(" Jul 2026 10:00:00 GMT</pubDate>"),
        ),
    ).otherwise(F.lit(""))
    atom_upd = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.concat(
            F.lit("<updated> 2026-07-0"),
            ((F.col("o_orderkey") % 9) + 1).cast("string"),
            F.lit("T12:00:00Z </updated>"),
        ),
    ).otherwise(F.lit(""))
    atom_entry = F.when(
        F.col("o_orderkey") % 5 == 0,
        F.concat(
            F.lit('<entry><link rel="alternate" href="https://f.ex/alt'),
            key, F.lit('"/>'), atom_upd, F.lit("</entry>"),
        ),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit("<rss><channel><item><link> https://f.ex/post"), key,
        F.lit(" </link>"), pubdate, F.lit("</item>"), atom_entry,
        F.lit("</channel></rss>"),
    )
    pages = o.select(
        F.concat(F.lit("https://f.ex/rss"), key).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    return extract_feed_entries(pages).orderBy("src_url", "link")


# =====================================================================
# registrable-domain extraction (eTLD+1) — the politeness/budget
# grouping key one level above host (functions/urls.registered_domain,
# compact two-level-suffix table; the full PSL swaps in as a broadcast
# dim at deployment).  Pure Catalyst: split + element_at + isin.  The
# oracle replicates the rule with DuckDB list ops over the SAME
# suffix table inlined.
# =====================================================================
@query(
    "q78_registered_domain",
    """
    WITH h AS (
      SELECT CASE o_orderkey % 6
        WHEN 0 THEN 'dart.fss.or.kr'
        WHEN 1 THEN 'www.example.com'
        WHEN 2 THEN 'a.b.news.co.uk'
        WHEN 3 THEN 'example.com'
        WHEN 4 THEN 'localhost'
        ELSE 'cdn' || CAST(o_orderkey % 11 AS VARCHAR) || '.media.com.au'
      END AS host
      FROM orders WHERE o_orderkey % 4 = 3),
    s AS (
      SELECT host, string_split(host, '.') AS l FROM h),
    f AS (
      SELECT host, len(l) AS n,
             CASE WHEN len(l) >= 2
                  THEN l[len(l)-1] || '.' || l[len(l)] END AS last2,
             CASE WHEN len(l) >= 3
                  THEN l[len(l)-2] || '.' || l[len(l)-1] || '.' || l[len(l)]
             END AS last3
      FROM s)
    SELECT host,
           CASE WHEN n <= 2 THEN host
                WHEN last2 IN ('co.kr','or.kr','go.kr','ne.kr','re.kr',
                  'ac.kr','pe.kr','co.uk','org.uk','ac.uk','gov.uk',
                  'me.uk','net.uk','co.jp','or.jp','ne.jp','ac.jp',
                  'go.jp','com.au','net.au','org.au','edu.au','gov.au',
                  'com.br','net.br','org.br','gov.br','com.cn','net.cn',
                  'org.cn','gov.cn','edu.cn','com.tw','org.tw','net.tw',
                  'co.in','net.in','org.in','gen.in','firm.in','co.za',
                  'org.za','net.za','com.mx','org.mx','net.mx','com.ar',
                  'com.tr','com.sg','com.hk','com.my')
                THEN last3 ELSE last2 END AS domain
    FROM f ORDER BY host, domain
    """,
)
def q78(spark, sf):
    from ..functions.urls import registered_domain

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 4 == 3)
    host = (
        F.when(F.col("o_orderkey") % 6 == 0, F.lit("dart.fss.or.kr"))
        .when(F.col("o_orderkey") % 6 == 1, F.lit("www.example.com"))
        .when(F.col("o_orderkey") % 6 == 2, F.lit("a.b.news.co.uk"))
        .when(F.col("o_orderkey") % 6 == 3, F.lit("example.com"))
        .when(F.col("o_orderkey") % 6 == 4, F.lit("localhost"))
        .otherwise(
            F.concat(
                F.lit("cdn"), (F.col("o_orderkey") % 11).cast("string"),
                F.lit(".media.com.au"),
            )
        )
    )
    return (
        o.select(host.alias("host"))
        .withColumn("domain", registered_domain(F.col("host")))
        .orderBy("host", "domain")
    )


# =====================================================================
# main-content extraction (simplified jusText / trafilatura step above
# the WET tag-strip): block-level classification — nav bars and
# footers are short and link-dense, prose is neither — keeps body
# paragraphs only (functions/maintext.py, Arrow-batched kernel).  The
# oracle states the EXPECTED rows from the same construction (q68
# style): body paragraphs survive, nav/footer/short blocks don't, so
# the test pins the block walk, the link-density rule, and the
# whitespace contract end-to-end.
# =====================================================================
@query(
    "q79_main_content",
    """
    WITH k AS (SELECT o_orderkey AS key FROM orders
               WHERE o_orderkey % 8 = 5),
    e AS (
      SELECT 'https://mc.ex/d' || CAST(key AS VARCHAR) AS url,
        'Body paragraph for item ' || CAST(key AS VARCHAR) ||
          ' with twelve plain prose words inside here.' ||
          CASE WHEN key % 3 = 0
               THEN chr(10) || 'Second paragraph of item ' ||
                    CAST(key AS VARCHAR) ||
                    ' continues with more plain prose words too.'
               ELSE '' END AS main_text,
        CAST(CASE WHEN key % 3 = 0 THEN 4 ELSE 3 END AS INTEGER)
          AS n_blocks,
        CAST(CASE WHEN key % 3 = 0 THEN 2 ELSE 1 END AS INTEGER)
          AS n_body_blocks
      FROM k)
    SELECT * FROM e ORDER BY url
    """,
)
def q79(spark, sf):
    from ..functions.maintext import extract_main_content

    # single-row-group scan + block-classifier regexes: spread first
    par = spark.sparkContext.defaultParallelism
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 8 == 5).repartition(par)
    key = F.col("o_orderkey").cast("string")
    para2 = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.concat(
            F.lit("<p>Second paragraph of item "), key,
            F.lit(" continues with more plain prose words too.</p>"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><body><nav><a href="/a">L1</a> <a href="/b">L2</a> '
              '<a href="/c">L3</a></nav><p>Body paragraph for item '),
        key,
        F.lit(" with twelve plain prose words inside here.</p>"),
        para2,
        F.lit('<footer><a href="/t">Terms</a> <a href="/p">Privacy</a>'
              "</footer></body></html>"),
    )
    pages = o.select(
        F.concat(F.lit("https://mc.ex/d"), key).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return extract_main_content(pages).orderBy("url")


# =====================================================================
# rel=canonical extraction (RFC 6596) — the page-advertised dedup key:
# parameterized/mirrored spellings of one page all point at one
# canonical url, and an indexer groups content by it the same way the
# fetch side groups by redirect target (q64).  One codegen regexp,
# both attribute orders and quote styles; null when absent.
# =====================================================================
@query(
    "q80_canonical_link",
    """
    WITH k AS (SELECT o_orderkey AS key FROM orders
               WHERE o_orderkey % 11 = 4)
    SELECT 'https://cn.ex/p' || CAST(key AS VARCHAR) ||
             '?utm=' || CAST(key % 5 AS VARCHAR) AS url,
           CASE WHEN key % 3 = 0
                THEN 'https://cn.ex/p' || CAST(key AS VARCHAR)
                ELSE NULL END AS canonical
    FROM k ORDER BY url
    """,
)
def q80(spark, sf):
    from ..functions.links import extract_canonical

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 11 == 4)
    key = F.col("o_orderkey").cast("string")
    # attribute order alternates with key parity — both must extract
    head = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.concat(
                F.lit('<link rel="canonical" href="https://cn.ex/p'),
                key, F.lit('">'),
            ),
        ).otherwise(
            F.concat(
                F.lit("<link href='https://cn.ex/p"), key,
                F.lit("' rel='canonical'/>"),
            )
        ),
    ).otherwise(F.lit("<html></html>"))
    pages = o.select(
        F.concat(
            F.lit("https://cn.ex/p"), key, F.lit("?utm="),
            (F.col("o_orderkey") % 5).cast("string"),
        ).alias("url"),
        F.encode(head, "UTF-8").alias("html"),
    )
    return extract_canonical(pages).orderBy("url")


# =====================================================================
# feed autodiscovery — <link rel="alternate" type="application/
# rss+xml|atom+xml"> head elements advertising a page's feeds; the
# urls fetch through the normal loop and q77's entry extraction takes
# over.  Pure Catalyst; both quote styles.
# =====================================================================
@query(
    "q81_feed_autodiscovery",
    """
    WITH k AS (SELECT o_orderkey AS key FROM orders
               WHERE o_orderkey % 13 = 6),
    rss AS (
      SELECT 'https://fa.ex/h' || CAST(key AS VARCHAR) AS src_url,
             '/feed' || CAST(key % 7 AS VARCHAR) || '.xml' AS feed_url,
             'rss' AS feed_type
      FROM k WHERE key % 2 = 0),
    atom AS (
      SELECT 'https://fa.ex/h' || CAST(key AS VARCHAR) AS src_url,
             'https://fa.ex/atom' || CAST(key % 3 AS VARCHAR) AS feed_url,
             'atom' AS feed_type
      FROM k WHERE key % 5 = 0)
    SELECT * FROM rss UNION ALL SELECT * FROM atom
    ORDER BY src_url, feed_type
    """,
)
def q81(spark, sf):
    from ..functions.links import extract_feed_links

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 13 == 6)
    key = F.col("o_orderkey").cast("string")
    rss = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.concat(
            F.lit('<link rel="alternate" type="application/rss+xml" '
                  'href="/feed'),
            (F.col("o_orderkey") % 7).cast("string"), F.lit('.xml">'),
        ),
    ).otherwise(F.lit(""))
    atom = F.when(
        F.col("o_orderkey") % 5 == 0,
        F.concat(
            F.lit("<link rel='alternate' type='application/atom+xml' "
                  "href='https://fa.ex/atom"),
            (F.col("o_orderkey") % 3).cast("string"), F.lit("'>"),
        ),
    ).otherwise(F.lit(""))
    pages = o.select(
        F.concat(F.lit("https://fa.ex/h"), key).alias("url"),
        F.encode(F.concat(F.lit("<head>"), rss, atom, F.lit("</head>")),
                 "UTF-8").alias("html"),
    )
    return extract_feed_links(pages).orderBy("src_url", "feed_type")


# =====================================================================
# n-gram language ID — the SURVEY brief's "language-ID (n-gram
# heuristic)" as distinct from q25's stopword vote: Cavnar-Trenkle
# character-trigram profiles with presence voting (48 instr probes
# folded per row — map-only, NO shuffle at 100 TB; a rank-order
# profile distance would need a per-doc top-k window).  Profiles and
# tie-break precedence identical in both engines (generated from ONE
# table, plans/webtext._TRIGRAM_PROFILES).
# =====================================================================
@query(
    "q82_lang_id_ngram",
    """
    WITH s AS (
      SELECT doc_id,
        (CASE WHEN instr(lower(text), ' th') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'the') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'he ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ing') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' an') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'nd ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' of') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'of ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' to') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ed ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' in') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'er ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'at ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ent') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' co') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ion') > 0 THEN 1 ELSE 0 END) AS s_en,
        (CASE WHEN instr(lower(text), 'der') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ein') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'sch') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ich') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'nde') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'die') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'che') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'und') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' de') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ung') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' ge') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'cht') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'gen') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ber') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' di') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ens') > 0 THEN 1 ELSE 0 END) AS s_de,
        (CASE WHEN instr(lower(text), ' de') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'es ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'le ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'de ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'la ') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' la') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'que') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' qu') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'les') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'our') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' le') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ais') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ons') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'ait') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), ' pa') > 0 THEN 1 ELSE 0 END
           + CASE WHEN instr(lower(text), 'eur') > 0 THEN 1 ELSE 0 END) AS s_fr
      FROM documents)
    SELECT doc_id, CAST(s_en AS BIGINT) AS score_en,
           CAST(s_de AS BIGINT) AS score_de,
           CAST(s_fr AS BIGINT) AS score_fr,
           CASE WHEN greatest(s_en, s_de, s_fr) < 2 THEN 'unk'
                WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_ngram
    FROM s ORDER BY doc_id
""",
)
def q82(spark, sf):
    from .webtext import lang_id_ngram_cols

    d = _t(spark, sf, "documents")
    cols = lang_id_ngram_cols()
    return d.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]
    ).orderBy("doc_id")
