"""Deduplication operators over ``documents``: exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Portability design: every hash is built from ``md5`` (identical in
Spark and DuckDB), so the duckdb oracle computes bit-identical
signatures — the MinHash "permutations" are ``min(md5(j || '|' ||
shingle))`` string minima, and SimHash bits come from the high bit of
successive md5 hex digits. No engine-specific hash functions anywhere.

Scale notes: shingling explodes ~(len-7) rows per doc; the LSH
band-join is a shuffle on band hash (bounded buckets), never an
all-pairs cross join. The exact-Jaccard verifier joins only candidate
pairs that share a shingle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_volume_spark.operators.common import load

N_HASHES = 8
SHINGLE_W = 8  # character shingle width
SIMHASH_BITS = 16
JACCARD_THRESHOLD = 0.25

SHINGLE_STEP = 4  # stride shingle starts: 4x fewer rows, same dedup power

SHINGLES_SQL = f"""
    SELECT doc_id, SUBSTR(text, i, {SHINGLE_W}) AS shingle
    FROM documents,
         UNNEST(GENERATE_SERIES(1, GREATEST(LENGTH(text) - {SHINGLE_W - 1}, 1),
                                {SHINGLE_STEP})) AS t(i)
"""


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length("text") - (SHINGLE_W - 1), F.lit(1)),
                F.lit(SHINGLE_STEP),
            )
        ).alias("i"),
    ).select(
        "doc_id", F.expr(f"substr(text, i, {SHINGLE_W})").alias("shingle")
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groups with canonical (min) doc id."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


DEDUP_EXACT_SQL = """
SELECT MD5(text) AS content_hash,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY MD5(text)
"""


def _signature_cols():
    return [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
        for j in range(N_HASHES)
    ]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: shingle → N_HASHES salted-md5 minima per doc
    (string-min permutation approximation of Jaccard)."""
    sh = _shingles(spark, sf_dir)
    return sh.groupBy("doc_id").agg(*_signature_cols())


_SIG_SQL_COLS = ", ".join(
    f"MIN(MD5('{j}|' || shingle)) AS h{j}" for j in range(N_HASHES)
)

MINHASH_SQL = f"""
WITH shingles AS ({SHINGLES_SQL})
SELECT doc_id, {_SIG_SQL_COLS}
FROM shingles GROUP BY doc_id
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding over the MinHash signatures: 4 bands × 2 rows; docs
    sharing any band hash become candidate near-duplicate pairs. The
    join key is the band hash — buckets, not an all-pairs product."""
    sig = minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.md5(F.concat(F.col(f"h{2*b}"), F.col(f"h{2*b+1}")))
                for b in range(N_HASHES // 2)
            ])
        ).alias("band", "band_hash"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, MD5(h{2*b} || h{2*b+1}) AS band_hash FROM sigs"
    for b in range(N_HASHES // 2)
)

LSH_PAIRS_SQL = f"""
WITH shingles AS ({SHINGLES_SQL}),
sigs AS (
    SELECT doc_id, {_SIG_SQL_COLS}
    FROM shingles GROUP BY doc_id
),
bands AS ({_BANDS_SQL})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""


DOC_FREQ_CAP = 100  # shingles in more docs than this are dropped


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle —
    the ground-truth verifier for the MinHash/LSH approximations.

    Shingles appearing in more than DOC_FREQ_CAP documents are dropped
    before the self-join (standard df-cap practice): one stop-phrase
    shared by k docs otherwise creates a k² join bucket — the quadratic
    blowup that melts this at scale. The cap is applied identically in
    the duckdb oracle, so parity is exact over the capped universe."""
    sh = _shingles(spark, sf_dir).distinct()
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= DOC_FREQ_CAP)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                4,
            ),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


NGRAM_JACCARD_SQL = f"""
WITH all_shingles AS (SELECT DISTINCT * FROM ({SHINGLES_SQL})),
rare AS (
    SELECT shingle FROM all_shingles
    GROUP BY shingle HAVING COUNT(*) <= {DOC_FREQ_CAP}
),
shingles AS (
    SELECT s.* FROM all_shingles s JOIN rare USING (shingle)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
    FROM shingles a JOIN shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(n_shared / (sa.n_sh + sb.n_sh - n_shared)::DOUBLE, 4) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_shared / (sa.n_sh + sb.n_sh - n_shared)::DOUBLE >= {JACCARD_THRESHOLD}
"""


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash over word tokens: bit b of the fingerprint is the sign of
    the sum of ±1 votes from each token's md5 hex digit b (high bit of
    the nibble)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias(
            "tok"
        )
    ).withColumn("h", F.md5("tok"))
    # hex digit >= '8' (ascii 56; a-f are 97+) == high bit of the
    # nibble — one ascii compare beats an 8-way string IN in the
    # per-row partial-agg hot loop
    votes = [
        F.sum(
            F.when(
                F.ascii(F.substring("h", b + 1, 1)) >= 56, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    simhash = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(0)
        simhash = bit if simhash is None else simhash + bit
    return agg.select("doc_id", simhash.cast("long").alias("simhash"))


_VOTE_SQL = ", ".join(
    f"SUM(CASE WHEN ASCII(SUBSTR(h, {b + 1}, 1)) >= 56 "
    f"THEN 1 ELSE -1 END) AS v{b}"
    for b in range(SIMHASH_BITS)
)
_BITS_SQL = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
)

SIMHASH_SQL = f"""
WITH toks AS (
    SELECT doc_id, MD5(t.tok) AS h
    FROM documents, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS t(tok)
), votes AS (
    SELECT doc_id, {_VOTE_SQL}
    FROM toks GROUP BY doc_id
)
SELECT doc_id, ({_BITS_SQL})::BIGINT AS simhash
FROM votes
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "simhash_fingerprints": simhash_fingerprints,
}

ORACLE_SQL = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "minhash_signatures": MINHASH_SQL,
    "minhash_lsh_pairs": LSH_PAIRS_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "simhash_fingerprints": SIMHASH_SQL,
}
