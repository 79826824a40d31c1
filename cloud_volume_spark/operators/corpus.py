"""Corpus-construction operators — the selection/shaping stage of a
training-data pipeline, downstream of the text/dedup analysis modules:
deterministic stratified sampling, tf-idf salient terms, fixed-window
context chunking (training-sample generation), policy pattern scanning
(PII + keyword), and keep-best-representative dedup.

Determinism design (same rules as the sibling modules): every sampled
set, rank, and score is reproducible across engines — sampling keys are
md5 prefixes (never RAND), floats are emitted as integer basis points
or rounded after an identical fp op chain, and ties break on explicit
columns. All hot paths are JVM built-ins; no Python UDFs.

Scale notes: sampling and scanning are map-only (no shuffle).  tf-idf
shuffles twice (term counts, then doc-frequency join) — the df side is
a term-level aggregate, orders of magnitude smaller than the corpus,
and broadcast when bounded.  Context chunking explodes ~n_tokens/STRIDE
rows per doc, the same bounded-explode shape as shingling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from cloud_volume_spark.operators.common import load, load_spread
from cloud_volume_spark.operators.curation import word_gram_ctes_sql
from cloud_volume_spark.operators.dedup import (
    CC_CTES_SQL,
    materialized_clusters,
)
from cloud_volume_spark.operators.text import QUALITY_SQL, doc_quality_score

# ---------------------------------------------------------------------------
# stratified sampling

# per-language keep rates in 1/256ths of the md5 keyspace: the first
# hex byte of md5('sample|' || doc_id) is compared against the stratum
# threshold. en is downsampled harder (it dominates web corpora); the
# long-tail languages keep more — the standard rebalancing move.
SAMPLE_RATE_HEX = {"en": "40", "es": "80", "fr": "80", "de": "80", "zh": "80"}
# unlisted long-tail languages keep the MOST (c0 = 75%) — a default
# below en's 25% would sample the tail hardest, the inverse of the
# rebalancing intent above (unreachable in the 5-language fixture, so
# only a real corpus would have hit it)
DEFAULT_RATE_HEX = "c0"


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a doc iff the first hex
    byte of ``md5('sample|' || doc_id)`` falls below its language
    stratum's threshold. Hash-based (never RAND) so the sample is
    reproducible run-to-run, engine-to-engine, and — critically at
    100 TB — shard-to-shard without coordination: pure map-side filter,
    no shuffle, no driver state."""
    docs = load(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))), 1, 2
    )
    thresh = F.lit(DEFAULT_RATE_HEX)
    for lang, hx in SAMPLE_RATE_HEX.items():
        thresh = F.when(F.col("lang") == lang, F.lit(hx)).otherwise(thresh)
    return (
        docs.withColumn("sample_key", key)
        .where(F.col("sample_key") < thresh)
        .select("doc_id", "lang", "source", "sample_key")
    )


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN '{hx}'" for lang, hx in SAMPLE_RATE_HEX.items()
)

SAMPLE_SQL = f"""
SELECT doc_id, lang, source,
       SUBSTR(MD5('sample|' || doc_id::VARCHAR), 1, 2) AS sample_key
FROM documents
WHERE SUBSTR(MD5('sample|' || doc_id::VARCHAR), 1, 2)
      < (CASE {_RATE_CASE} ELSE '{DEFAULT_RATE_HEX}' END)
"""

# ---------------------------------------------------------------------------
# tf-idf top terms

TFIDF_TOP_K = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K salient terms per document by tf·idf with
    ``idf = ln((N+1)/(df+1))`` (smoothed), emitted as integer basis
    points. Two shuffles: per-(doc,term) counts, then a join against
    the term-level doc-frequency aggregate — which is vocabulary-sized,
    not corpus-sized, so it broadcasts at any realistic scale."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # r14 (guide §2.4): df derives FROM the tf aggregate — tf already
    # holds one row per (doc, term), so COUNT per term IS the document
    # frequency. Before, df was a second full explode + distinct over
    # the token stream; now both df and the probe side share the one
    # (doc_id, term) aggregation subtree (identical children, so the
    # exchange is reused), and the distinct's corpus-sized shuffle is
    # gone.
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        # df_ is VOCABULARY-sized (Heaps' law: unbounded on raw web
        # text) — no forced broadcast, same rule as doc_perplexity's
        # vocab join; AQE still broadcasts while it measures small.
        # n_docs is one row: broadcast is always right.
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_bp",
            F.floor(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                * 10000
                + 0.5
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_bp"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "score_bp", "rank")
    )


TFIDF_SQL = f"""
WITH toks AS (
    SELECT doc_id, t.term
    FROM documents, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS t(term)
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (
    SELECT term, COUNT(*) AS df
    FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           FLOOR(tf.tf * LN((n.n_docs + 1) / (df.df + 1.0)) * 10000
                 + 0.5)::BIGINT AS score_bp
    FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_bp DESC, term ASC
    ) AS rank
    FROM scored
)
SELECT doc_id, term, tf, score_bp, rank FROM ranked
WHERE rank <= {TFIDF_TOP_K}
"""

# ---------------------------------------------------------------------------
# context-window chunking

WINDOW_TOKENS = 64
WINDOW_STRIDE = 48  # 16-token overlap between consecutive windows


def doc_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sample generation: slice each document's token stream
    into ``WINDOW_TOKENS``-token windows every ``WINDOW_STRIDE`` tokens
    (overlapping, like LLM pretraining context packing with stride).
    Emits a content hash per window rather than the window text — the
    row stays ~50 bytes no matter the window size. Bounded explode
    (~n_tokens/stride rows per doc), all JVM built-ins."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " ")
    n_tok = F.size(toks)
    windows = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((n_tok - 1) / WINDOW_STRIDE).cast("int"),
            )
        ).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_idx") * WINDOW_STRIDE + 1, WINDOW_TOKENS
    )
    return windows.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


CONTEXT_WINDOWS_SQL = f"""
WITH base AS (
    SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents
),
windows AS (
    SELECT doc_id, toks, s.chunk_idx
    FROM base,
         UNNEST(GENERATE_SERIES(0, (LEN(toks) - 1) // {WINDOW_STRIDE}))
             AS s(chunk_idx)
),
sliced AS (
    SELECT doc_id, chunk_idx,
           toks[chunk_idx * {WINDOW_STRIDE} + 1 :
                chunk_idx * {WINDOW_STRIDE} + {WINDOW_TOKENS}] AS chunk
    FROM windows
)
SELECT doc_id, chunk_idx,
       LEN(chunk) AS n_chunk_tokens,
       MD5(ARRAY_TO_STRING(chunk, ' ')) AS chunk_hash
FROM sliced
"""

# ---------------------------------------------------------------------------
# policy pattern scan (PII + keyword)

# portable regex subset (identical semantics in Java regex and RE2):
# character classes, bounded/unbounded quantifiers, alternation.
PAT_EMAIL = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[.][a-zA-Z][a-zA-Z]+"
PAT_NUMBER = "[0-9][0-9][0-9][0-9]+"  # 4+ digit runs: IDs, phones, SSN frags
PAT_KEYWORD = "(table|value|row)"  # stand-in for a policy keyword list


def doc_policy_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy pattern scan: count PII-shaped matches (emails, long
    digit runs) and policy-keyword matches per document, with a flag
    for any PII hit — the filter/redaction precursor every corpus
    pipeline runs. Pure map-side regex counting, no shuffle."""
    docs = load_spread(spark, sf_dir, "documents")
    n_email = F.size(F.expr(f"regexp_extract_all(text, '{PAT_EMAIL}', 0)"))
    n_number = F.size(F.expr(f"regexp_extract_all(text, '{PAT_NUMBER}', 0)"))
    n_keyword = F.size(F.expr(f"regexp_extract_all(text, '{PAT_KEYWORD}', 0)"))
    return docs.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_number.alias("n_digit_runs"),
        n_keyword.alias("n_keywords"),
        ((n_email > 0) | (n_number > 0)).cast("int").alias("pii_flag"),
    )


POLICY_SCAN_SQL = f"""
SELECT doc_id,
       LEN(REGEXP_EXTRACT_ALL(text, '{PAT_EMAIL}')) AS n_emails,
       LEN(REGEXP_EXTRACT_ALL(text, '{PAT_NUMBER}')) AS n_digit_runs,
       LEN(REGEXP_EXTRACT_ALL(text, '{PAT_KEYWORD}')) AS n_keywords,
       (LEN(REGEXP_EXTRACT_ALL(text, '{PAT_EMAIL}')) > 0
        OR LEN(REGEXP_EXTRACT_ALL(text, '{PAT_NUMBER}')) > 0)::INT AS pii_flag
FROM documents
"""

# ---------------------------------------------------------------------------
# PII redaction — the action half of the policy scan above

def redact_text_frame(docs: DataFrame) -> DataFrame:
    """``text`` with PII spans replaced in place (email first, THEN
    digit runs — :func:`pii_redact`'s ordering rationale) — the
    text-preserving core for composing redaction AHEAD of other
    text operators (shingling, dedup, packing): pure map-side
    regexp_replace, works identically on batch frames and streams
    (no shuffle, no state). ``pii_redact`` is the registered
    digest-emitting form of the same substitutions."""
    return docs.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PAT_EMAIL, "<EMAIL>"),
            PAT_NUMBER, "<NUMBER>"))


def pii_redact(docs: DataFrame) -> DataFrame:
    """Redact PII-shaped spans (emails, 4+-digit runs) with typed
    placeholder tokens and count what was redacted — the scrubbing
    pass a corpus pipeline runs between `doc_policy_scan` flagging and
    training. Pure map-side regexp_replace (JVM built-in, no shuffle);
    the redacted text is emitted as an md5 digest so the result stays
    row-count-light for the oracle compare while still pinning every
    byte of the redaction output.

    Email first, THEN digit runs: a digit-bearing local part
    (``user1234@x.yz``) must become one ``<EMAIL>`` token, not an
    ``<EMAIL>`` with a ``<NUMBER>`` hole punched in it — so the digit
    runs are counted on the email-redacted text (counting them on the
    raw text would double-count digits the email redaction already
    swallowed, and n_redactions would not equal the substitutions
    actually made)."""
    email_redacted = F.regexp_replace(F.col("text"), PAT_EMAIL, "<EMAIL>")
    n_email = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(PAT_EMAIL), F.lit(0)))
    n_number = F.size(
        F.regexp_extract_all(email_redacted, F.lit(PAT_NUMBER), F.lit(0)))
    redacted = F.regexp_replace(email_redacted, PAT_NUMBER, "<NUMBER>")
    return docs.select(
        "doc_id",
        (n_email + n_number).cast("int").alias("n_redactions"),
        F.md5(redacted).alias("redacted_md5"),
    )


def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain load: the plan gate pins redaction as a pure map (no
    # exchange anywhere) — a spread would trade that contract for
    # parallelism the cheap regex pass does not need
    return pii_redact(load(spark, sf_dir, "documents"))


PII_REDACT_SQL = f"""
WITH staged AS (
    SELECT doc_id, text,
           REGEXP_REPLACE(text, '{PAT_EMAIL}', '<EMAIL>', 'g')
               AS email_redacted
    FROM documents
)
SELECT doc_id,
       (LEN(REGEXP_EXTRACT_ALL(text, '{PAT_EMAIL}'))
        + LEN(REGEXP_EXTRACT_ALL(email_redacted, '{PAT_NUMBER}')))::INT
           AS n_redactions,
       MD5(REGEXP_REPLACE(email_redacted, '{PAT_NUMBER}', '<NUMBER>', 'g'))
           AS redacted_md5
FROM staged
"""

# ---------------------------------------------------------------------------
# keep-best dedup

def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final dedup decision: within each near-duplicate cluster
    (connected components over the MinHash-LSH candidate graph), keep
    the highest-quality document (tie → lowest doc_id). This is the
    composition a production pipeline actually ships — cluster, score,
    pick one representative — rather than naive keep-first.

    Consumes the *materialized* cluster map (compute-once per
    session/dataset, the in-process analog of joining a written
    cluster table), so running clusters + keep-best in one suite pays
    the shingle→LSH→CC cost once."""
    clusters = materialized_clusters(spark, sf_dir)
    quality = doc_quality_score(spark, sf_dir).select(
        "doc_id", "quality_score_bp"
    )
    joined = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score_bp"), F.asc("doc_id")
    )
    return joined.select(
        "doc_id",
        "cluster_id",
        "quality_score_bp",
        (F.row_number().over(w) == 1).cast("int").alias("is_kept"),
    )


KEEP_BEST_SQL = f"""
WITH RECURSIVE {CC_CTES_SQL},
clusters AS (SELECT u AS doc_id, MIN(comp) AS cluster_id FROM walk GROUP BY u),
quality AS (
    -- ONE source of truth for the score: text.py's QUALITY_SQL,
    -- composed as a subquery (the Spark side calls doc_quality_score)
    SELECT doc_id, quality_score_bp FROM ({QUALITY_SQL}) qsrc
)
SELECT c.doc_id, c.cluster_id, q.quality_score_bp,
       (ROW_NUMBER() OVER (
            PARTITION BY c.cluster_id
            ORDER BY q.quality_score_bp DESC, c.doc_id ASC
        ) = 1)::INT AS is_kept
FROM clusters c JOIN quality q ON q.doc_id = c.doc_id
"""


PACK_BUDGET = 2048  # tokens per packed training sequence


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each source shard,
    documents are concatenated in doc_id order and cut into
    PACK_BUDGET-token bins; each doc reports its bin and offset (docs
    may straddle bins, as in GPT-style packing). The running sum is a
    per-source window — packing parallelizes across shards exactly as
    production pipelines pack per input file, no global order needed."""
    docs = load_spread(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.trim("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(n_toks).over(w) - n_toks
    staged = docs.select(
        "doc_id", "source",
        n_toks.alias("n_tokens"),
        start.cast("long").alias("_start"),
    )
    return staged.select(
        "doc_id", "source", "n_tokens",
        # integer `div`, matching the oracle's `//`: floor(double /)
        # rounds across a bin boundary once cumulative tokens pass
        # 2^53 — the same long-exactness class as the line_dedup key
        F.expr(f"_start div {PACK_BUDGET}").alias("bin_id"),
        F.expr(f"_start % {PACK_BUDGET}").cast("long")
        .alias("bin_offset"),
    )


PACK_SEQUENCES_SQL = f"""
WITH counted AS (
    SELECT doc_id, source,
           LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_tokens
    FROM documents
), cum AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS start
    FROM counted
)
SELECT doc_id, source, n_tokens,
       (start // {PACK_BUDGET})::BIGINT AS bin_id,
       (start % {PACK_BUDGET})::BIGINT AS bin_offset
FROM cum
"""


CONTAM_NGRAM = 5     # word n-gram width for decontamination
CONTAM_MOD = 97      # doc_id % CONTAM_MOD == 0 → "benchmark" holdout


def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word 5-gram with a held-out benchmark set (here: ``doc_id %
    CONTAM_MOD == 0``, standing in for checked-in eval sets). The
    benchmark's distinct-gram table is explicitly broadcast — at
    100 TB the corpus side streams map-only through the broadcast hash
    join and aggregates per doc; no all-pairs, no big shuffle on the
    gram column. The broadcast is justified by REAL eval sets, which
    are small and fixed (MMLU/GSM8K-class: thousands of docs); the
    modulo holdout here is a stand-in whose gram table scales with the
    corpus, so it is hint-safe only at test scale — production callers
    must pass a genuinely small benchmark table.

    Gram keys are _rolling_gram 64-bit hashes (curation.py): a
    spurious collision can only ADD a match, i.e. drop an extra doc —
    the safe direction for decontamination (never eval leakage), at
    ~n²/2⁶⁵ ≈ a few thousand docs across a 10¹³-gram corpus."""
    from cloud_volume_spark.operators.curation import _word_grams

    docs = load_spread(spark, sf_dir, "documents")
    grams = _word_grams(docs, CONTAM_NGRAM)
    bench = (
        grams.where(F.col("doc_id") % CONTAM_MOD == 0)
        .select("gram").distinct()
    )
    corpus_grams = grams.where(F.col("doc_id") % CONTAM_MOD != 0)
    hits = (
        corpus_grams.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_contaminated"))
    )
    base = docs.where(F.col("doc_id") % CONTAM_MOD != 0).select(
        "doc_id",
        F.greatest(
            F.size(F.split(F.trim("text"), " ")) - (CONTAM_NGRAM - 1),
            F.lit(0),
        ).cast("long").alias("n_grams"),
    )
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        (F.coalesce("n_contaminated", F.lit(0)) > 0)
        .cast("int").alias("contaminated"),
    )


CONTAMINATION_SQL = f"""
WITH {word_gram_ctes_sql(CONTAM_NGRAM)},
bench AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % {CONTAM_MOD} = 0
),
hits AS (
    SELECT c.doc_id, COUNT(DISTINCT c.gram) AS n_contaminated
    FROM grams c JOIN bench b ON c.gram = b.gram
    WHERE c.doc_id % {CONTAM_MOD} != 0
    GROUP BY c.doc_id
)
SELECT d.doc_id,
       GREATEST(LEN(STRING_SPLIT(TRIM(d.text), ' ')) - {CONTAM_NGRAM - 1},
                0)::BIGINT AS n_grams,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       (COALESCE(h.n_contaminated, 0) > 0)::INT AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {CONTAM_MOD} != 0
"""


# ---------------------------------------------------------------------------
# snapshot diff (incremental-refresh CDC)

def snapshot_diff(old: DataFrame, new: DataFrame,
                  key: str = "doc_id",
                  payload: str = "text") -> DataFrame:
    """Change-data-capture between two corpus snapshots: which docs
    were added, removed, or changed — the planning input for an
    incremental refresh (re-dedup/re-embed only the delta instead of
    reprocessing the corpus; :func:`~cloud_volume_spark.operators.
    dedup.dedup_incremental` then consumes exactly the ``added`` +
    ``changed`` set). The table-level analog of the volume layer's
    ``Volume.changes()``.

    Scale: each side collapses to (key, md5(payload)) map-side, so the
    full-outer hash equi-join shuffles 16-byte digests — never document
    bytes — on a unique key (no skew by construction). At 100 TB both
    scans prune to two columns and the join is the only exchange; AQE
    broadcasts a small side (e.g. a daily delta vs the corpus).
    Unchanged rows are dropped post-join, so the output is delta-sized.

    A NULL payload hashes as the empty document (COALESCE before md5):
    md5(NULL) is NULL on both engines, and a NULL hash on a PRESENT
    row would be misread as absence — a NULL-text doc in the old
    snapshot would report "added" instead of unchanged/changed.
    """
    o = old.select(F.col(key),
                   F.md5(F.coalesce(F.col(payload), F.lit("")))
                   .alias("old_hash"))
    n = new.select(F.col(key),
                   F.md5(F.coalesce(F.col(payload), F.lit("")))
                   .alias("new_hash"))
    return (
        o.join(n, key, "full_outer")
        .withColumn(
            "status",
            F.when(F.col("old_hash").isNull(), F.lit("added"))
            .when(F.col("new_hash").isNull(), F.lit("removed"))
            .when(F.col("old_hash") != F.col("new_hash"),
                  F.lit("changed")),
        )
        .where(F.col("status").isNotNull())
        .select(key, "status", "old_hash", "new_hash")
    )


# deterministic synthetic snapshots over the single documents table:
# membership and the edit set are md5-keyspace slices (the repo-wide
# RAND-free sampling idiom), so both engines derive bit-identical
# snapshots. A = 14/16 of docs, B = an overlapping 14/16, and 2/16 of
# docs get their B-side text suffixed to simulate an edit.
_SNAP_MEMBER_HEX = "e"   # first md5 hex char < 'e' → in snapshot
_SNAP_EDIT_HEX = "2"     # first md5 hex char < '2' → edited in B


def _snap_hex1(tag: str):
    return F.substring(
        F.md5(F.concat(F.lit(tag), F.col("doc_id").cast("string"))), 1, 1)


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered instance of :func:`snapshot_diff` over two derived
    snapshots of the documents table (see the derivation constants
    above)."""
    # plain load: the diff's contract (plan-gated) is that ONLY
    # digests cross an exchange — a pre-digest spread would shuffle
    # the text column itself
    docs = load(spark, sf_dir, "documents")
    old = docs.where(_snap_hex1("snapA|") < _SNAP_MEMBER_HEX)
    new = docs.where(_snap_hex1("snapB|") < _SNAP_MEMBER_HEX).withColumn(
        "text",
        F.when(_snap_hex1("edit|") < _SNAP_EDIT_HEX,
               F.concat(F.col("text"), F.lit(" ~v2")))
        .otherwise(F.col("text")),
    )
    return snapshot_diff(old, new)


SNAPSHOT_DIFF_SQL = """
WITH old AS (
    -- COALESCE before MD5 mirrors snapshot_diff: a NULL payload is
    -- the empty document, never a NULL hash masquerading as absence
    SELECT doc_id, MD5(COALESCE(text, '')) AS old_hash
    FROM documents
    WHERE SUBSTRING(MD5('snapA|' || CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
), new AS (
    SELECT doc_id,
           MD5(COALESCE(
               CASE WHEN SUBSTRING(MD5('edit|' || CAST(doc_id AS VARCHAR)),
                                   1, 1) < '2'
                    THEN text || ' ~v2' ELSE text END, '')) AS new_hash
    FROM documents
    WHERE SUBSTRING(MD5('snapB|' || CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
)
SELECT doc_id,
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            WHEN old_hash <> new_hash THEN 'changed' END AS status,
       old_hash, new_hash
FROM old FULL OUTER JOIN new USING (doc_id)
WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash <> new_hash
"""


# ---------------------------------------------------------------------------
# end-to-end curation pipeline

def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole selection pipeline as one composed plan: Gopher
    quality filter ∧ near-duplicate keep-best ∧ domain-mixture sample
    → the final training-corpus document set. This is the query a
    production run actually executes — the stage operators exist
    separately for observability, but selection ships as a single job
    so Catalyst fuses the map-side filters and the corpus is scanned
    once per branch, not once per stage.

    Scale: quality + mixture are map-only predicates; keep-best rides
    the materialized cluster map (computed once per session/dataset).

    r14 (guide §2.4): the quality and mixture verdicts are FUSED into
    the main scan as filters instead of doc_id self-joins — both are
    exactly-one-row-per-doc frames, so inner-join ≡ filter, row for
    row. The quality flags compute map-side on the same scan
    (quality_filter_frame with source/lang passed through); the
    mixture decision is the broadcast #sources-row threshold table +
    the md5-slot predicate (its inner join on ``source`` also drops
    NULL-source docs, exactly as mixture_sample's own join did). Only
    the keep-best intersection remains a doc_id join — its verdict
    needs the cluster-map window. Plan diff: 3 doc_id hash joins + 3
    extra documents scans → 1 join + 1 broadcast source join over ONE
    predicate-fused scan."""
    from cloud_volume_spark.operators.curation import (
        mixture_key, mixture_thresholds,
    )
    from cloud_volume_spark.operators.text import quality_filter_frame

    docs = load_spread(spark, sf_dir, "documents")
    qualified = (
        quality_filter_frame(docs, keep=("source", "lang"))
        .where(F.col("passes") == 1)
        .select("doc_id", "source", "lang")
    )
    thresh = mixture_thresholds(load(spark, sf_dir, "documents"))
    kb = dedup_keep_best(spark, sf_dir).where(
        F.col("is_kept") == 1
    ).select("doc_id")
    return (
        qualified.join(F.broadcast(thresh), "source")
        .where(mixture_key() < F.col("t_hex"))
        .join(kb, "doc_id")
        .select("doc_id", "source", "lang")
    )


def _curate_sql() -> str:
    from cloud_volume_spark.operators.curation import MIXTURE_SQL
    from cloud_volume_spark.operators.text import QUALITY_FILTER_SQL

    return f"""
WITH qf AS (SELECT * FROM ({QUALITY_FILTER_SQL}) t WHERE passes = 1),
kb AS (SELECT * FROM ({KEEP_BEST_SQL}) t WHERE is_kept = 1),
mx AS (SELECT * FROM ({MIXTURE_SQL}) t)
SELECT d.doc_id, d.source, d.lang
FROM documents d
JOIN qf ON qf.doc_id = d.doc_id
JOIN kb ON kb.doc_id = d.doc_id
JOIN mx ON mx.doc_id = d.doc_id
"""


def curate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation gate — the composition a training-mix
    builder actually runs before tokenization: intersect the TEXT
    verdicts (:func:`corpus_curate`: Gopher quality ∧ text-dup
    keep-best ∧ mixture sample) with the VECTOR verdicts
    (``similarity.embedding_curate``: SemDeDup keep ∧ not a
    centroid-affinity outlier) on doc_id. Text dup ∨ semantic dup ∨
    off-distribution ⇒ dropped. Docs without a vector (the embeddings
    table covers a subset at larger SFs) keep their text verdict, with
    ``has_vector`` making the coverage explicit.

    Scale: ONE equi-join over two already-materialized outputs — the
    text side rides the session-materialized cluster map, the vector
    side rides the persisted IVF index's lists (plan-gated: the raw
    embeddings table appears nowhere; no re-signature, no
    re-assignment). The vector verdict projects to (id, flag) before
    the join, so at 100 TB the join sides are id-width, and AQE
    broadcasts the harder-filtered one."""
    from cloud_volume_spark.operators.similarity import embedding_curate

    text_sel = corpus_curate(spark, sf_dir)
    vec = embedding_curate(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.col("is_curated").alias("_vec_ok"))
    return (
        text_sel.join(vec, "doc_id", "left")
        .select(
            "doc_id", "source", "lang",
            F.col("_vec_ok").isNotNull().cast("int").alias("has_vector"),
            F.coalesce("_vec_ok", F.lit(1)).cast("int").alias("is_final"),
        )
    )


def _curate_join_sql() -> str:
    from cloud_volume_spark.operators.similarity import (
        EMBEDDING_CURATE_SQL,
    )

    return f"""
WITH text_sel AS ({_curate_sql()}),
vec AS (
    SELECT vec_id AS doc_id, is_curated FROM ({EMBEDDING_CURATE_SQL}) v
)
SELECT t.doc_id, t.source, t.lang,
       (v.doc_id IS NOT NULL)::INT AS has_vector,
       COALESCE(v.is_curated, 1)::INT AS is_final
FROM text_sel t LEFT JOIN vec v ON v.doc_id = t.doc_id
"""


QUERIES = {
    "curate_join": curate_join,
    "corpus_curate": corpus_curate,
    "corpus_sample_stratified": corpus_sample_stratified,
    "tfidf_top_terms": tfidf_top_terms,
    "doc_context_windows": doc_context_windows,
    "doc_policy_scan": doc_policy_scan,
    "doc_pii_redact": doc_pii_redact,
    "dedup_keep_best": dedup_keep_best,
    "corpus_pack_sequences": corpus_pack_sequences,
    "corpus_contamination": corpus_contamination,
    "corpus_snapshot_diff": corpus_snapshot_diff,
}

ORACLE_SQL = {
    "curate_join": _curate_join_sql(),
    "corpus_curate": _curate_sql(),
    "corpus_contamination": CONTAMINATION_SQL,
    "corpus_pack_sequences": PACK_SEQUENCES_SQL,
    "corpus_sample_stratified": SAMPLE_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "doc_context_windows": CONTEXT_WINDOWS_SQL,
    "doc_policy_scan": POLICY_SCAN_SQL,
    "doc_pii_redact": PII_REDACT_SQL,
    "dedup_keep_best": KEEP_BEST_SQL,
    "corpus_snapshot_diff": SNAPSHOT_DIFF_SQL,
}
