"""Corpus-curation operators — the mixture/quality-shaping stage of a
training-data pipeline, complementing the text/dedup/corpus modules:
cross-document boilerplate n-gram detection (the line-dedup analog for
unstructured text), domain-mixture sampling against target weights,
token-length bucketing (the packing planner's input histogram), and
unigram-entropy quality scoring.

Determinism design (same rules as the sibling modules): sampling keys
are md5 prefixes compared against integer-arithmetic-derived hex
thresholds (never RAND, never engine-specific hashes); entropy is
emitted as a rounded integer after an identical fp op chain in both
engines; buckets are CASE chains over exact integer token counts.

Scale notes: ``mixture_sample`` aggregates one source-level count
table (rows = #sources, trivially broadcast) then filters map-side —
the corpus never shuffles. ``boilerplate_ngrams`` and
``repeated_spans`` count hot grams via ``groupBy(gram)`` (map-side
partial aggregation; a viral phrase reaches the reducer as one partial
row per task) joined back unhinted (AQE-skew-splittable) — unlike
benchmark decontamination (`corpus.corpus_contamination`, whose gram
set is genuinely small, fixed, and correctly broadcast), nothing
corpus-sized is ever broadcast. ``token_bucket_stats``
is a map-side-combine aggregate to a handful of rows.  ``doc_entropy``
shuffles once on (doc_id, term) with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from cloud_volume_spark.operators.common import load, load_spread

# ---------------------------------------------------------------------------
# cross-document boilerplate n-grams

BOILER_NGRAM = 5       # word n-gram width
BOILER_MIN_DOCS = 2    # gram is boilerplate if it appears in >= this many docs


def _rot64(c, r: int):
    """64-bit rotate-left from shifts + or — never overflows, so it is
    safe under ANSI arithmetic."""
    return F.shiftleft(c, r).bitwiseOR(F.shiftrightunsigned(c, 64 - r))


def _rolling_gram(width: int, hashes_col: str = "_th"):
    """Order-sensitive 64-bit word-gram key from PER-TOKEN hashes:
    each token is xxhash64'd ONCE per document, then a gram's key is
    the xor of its tokens' hashes rotated by distinct per-offset
    amounts. Versus hashing the joined gram string at every position
    (md5 or xxhash64 of concat_ws(slice)), this removes the dominant
    per-position string build+hash — the whole-stage-codegen'd
    combine is ~2× faster end-to-end at sf0.1 — and still disperses
    like a random 64-bit hash (xxhash64 token dispersion + distinct
    rotations keep it order-sensitive and offset-sensitive).

    64-bit keys trade exactness for speed: ~n²/2⁶⁵ spurious gram
    merges (~2.7k at 10¹³ grams — sub-ppm noise on the basis-point
    statistics these PROFILING queries emit). The dedup-DECISION
    operators (line_dedup, minhash, exact dedup), where a false merge
    destroys data, keep their 128-bit md5 keys.

    Returns (tok_hashes_col, idxs_col, gram_fn) built from ``text``.
    The caller must alias the returned hash array to ``hashes_col``
    (default ``_th``) before applying ``gram_fn`` — the closure
    resolves the array by that name."""
    toks = F.split(F.trim("text"), " ")
    n = F.size(toks)
    # Spark's sequence(1, 0) counts *down*; guard short docs explicitly
    idxs = F.when(
        n >= width, F.sequence(F.lit(1), n - (width - 1))
    ).otherwise(F.array().cast("array<int>"))
    h = F.transform(toks, lambda t: F.xxhash64(t))

    def gram(i):
        out = _rot64(F.element_at(hashes_col, i), 1)
        for k in range(1, width):
            out = out.bitwiseXOR(
                _rot64(F.element_at(hashes_col, i + k), (1 + 13 * k) % 64)
            )
        return out

    return h, idxs, gram


def _word_grams(docs: DataFrame, width: int) -> DataFrame:
    """(doc_id, gram key) for every word ``width``-gram, bounded
    explode, keyed by :func:`_rolling_gram`."""
    h, idxs, gram = _rolling_gram(width)
    return docs.select(
        "doc_id", h.alias("_th"), idxs.alias("_idxs")
    ).select(
        "doc_id",
        F.explode(F.transform("_idxs", gram)).alias("gram"),
    )


def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: word 5-grams occurring in
    >= BOILER_MIN_DOCS distinct documents are 'boilerplate' (headers,
    footers, templates — the unstructured-text analog of C4-style line
    dedup); each doc is scored by the fraction of its gram positions
    that are boilerplate, in basis points.

    Scale: per-(gram, doc) counts first (map-side partials bound the
    explode output), then document frequency via ``groupBy(gram)`` —
    partial aggregation again, so a gram in 10^9 docs reaches the
    reducer as one partial row per upstream task, not 10^9 rows — and
    an unhinted equi-join back on ``gram`` (AQE-skew-splittable; the
    df>=2 set grows with the corpus so it is never force-broadcast).
    r7: replaces the r6 ``Window.partitionBy(gram)`` count, which had
    NO partial aggregation and could not be split by AQE — the hottest
    phrase was one straggler task. The explode lineage is evaluated
    once per branch (twice total; cheap — per-token hashes + the
    codegen'd rotate-xor combine of _rolling_gram, not per-position
    string hashing); that is the right trade, not a
    regression: even a cached single evaluation of ``cnt`` would still
    shuffle twice (the probe side of the join needs ``cnt``
    re-partitioned by gram alone, while ``cnt`` itself is partitioned
    by (gram, doc_id)), so the uncached form moves the same shuffle
    bytes and only duplicates cheap, embarrassingly-parallel map CPU —
    while gaining partials + skew-splitting that no window variant
    (salted or not) can offer for the row-preserving count."""
    docs = load_spread(spark, sf_dir, "documents")
    grams = _word_grams(docs, BOILER_NGRAM)
    cnt = grams.groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    boiler = (
        cnt.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= BOILER_MIN_DOCS)
        .select("gram")
    )
    hits = (
        cnt.join(boiler, "gram")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_boiler"))
    )
    toks = F.split(F.trim("text"), " ")
    base = docs.select(
        "doc_id",
        F.greatest(F.size(toks) - (BOILER_NGRAM - 1), F.lit(0))
        .cast("long").alias("n_grams"),
    )
    n_boiler = F.coalesce("n_boiler", F.lit(0)).cast("long")
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        n_boiler.alias("n_boiler"),
        # floor(x+0.5): the repo-wide portable rounding chain (DuckDB's
        # double->bigint cast rounds; Spark's truncates)
        F.floor(
            F.when(F.col("n_grams") > 0, n_boiler * 10000 / F.col("n_grams"))
            .otherwise(F.lit(0.0)) + 0.5
        ).cast("bigint").alias("boiler_bp"),
    )


def word_gram_ctes_sql(width: int) -> str:
    """``base`` + ``grams`` CTEs producing (doc_id, gram) for every
    word ``width``-gram — THE SQL mirror of :func:`_word_grams` (keys
    differ by design: md5 strings here vs 64-bit rolling hashes on the
    Spark side; the downstream counts agree).  Every oracle that needs
    word grams (boilerplate here, corpus.CONTAMINATION_SQL) formats
    this one template so a tokenizer/slicing change can't leave one
    mirror stale."""
    return f"""base AS (
    SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id,
           MD5(ARRAY_TO_STRING(toks[s.i : s.i + {width - 1}], ' '))
               AS gram
    FROM base,
         UNNEST(GENERATE_SERIES(1, LEN(toks) - {width - 1})) AS s(i)
)"""


BOILERPLATE_SQL = f"""
WITH {word_gram_ctes_sql(BOILER_NGRAM)},
boiler AS (
    SELECT gram FROM (
        SELECT gram, COUNT(DISTINCT doc_id) AS n_docs FROM grams GROUP BY gram
    ) WHERE n_docs >= {BOILER_MIN_DOCS}
),
hits AS (
    SELECT g.doc_id, COUNT(*) AS n_boiler
    FROM grams g JOIN boiler b ON g.gram = b.gram
    GROUP BY g.doc_id
)
SELECT d.doc_id,
       GREATEST(LEN(STRING_SPLIT(TRIM(d.text), ' ')) - {BOILER_NGRAM - 1},
                0)::BIGINT AS n_grams,
       COALESCE(h.n_boiler, 0)::BIGINT AS n_boiler,
       FLOOR((CASE WHEN GREATEST(LEN(STRING_SPLIT(TRIM(d.text), ' '))
                           - {BOILER_NGRAM - 1}, 0) > 0
             THEN COALESCE(h.n_boiler, 0) * 10000.0
                  / GREATEST(LEN(STRING_SPLIT(TRIM(d.text), ' '))
                             - {BOILER_NGRAM - 1}, 0)
             ELSE 0.0 END) + 0.5)::BIGINT AS boiler_bp
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
"""

# ---------------------------------------------------------------------------
# domain-mixture sampling

# relative mixture weights per source; unnamed sources weigh 1
MIX_WEIGHTS = {"src0": 3, "src1": 2}
MIX_DEFAULT_W = 1
MIX_BUDGET_DEN = 4  # sample ~1/4 of the corpus overall


def mixture_key() -> "F.Column":
    """The deterministic per-doc mixture slot: first md5 hex byte of
    ``md5('mix|'||doc_id)`` — shared by :func:`mixture_sample` and the
    fused corpus_curate predicate."""
    return F.substring(
        F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 2
    )


def mixture_thresholds(docs: DataFrame) -> DataFrame:
    """The per-source keep-rate table (source, t_hex) — #sources rows,
    built from ONE corpus aggregate (r14: the corpus-wide totals are an
    unpartitioned window over the counts frame, not a second aggregate
    + broadcast cross; see mixture_sample for the threshold formula).
    Broadcast by every consumer, so the corpus side of the mixture
    decision is always a map-side filter."""
    # W_total over *sources present* is data-dependent; fold the default
    # weight in via the count table instead of a constant.
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c_s"))
    wcol = F.lit(MIX_DEFAULT_W)
    for src, w in MIX_WEIGHTS.items():
        wcol = F.when(F.col("source") == src, F.lit(w)).otherwise(wcol)
    counts = counts.withColumn("w_s", wcol.cast("bigint"))
    # r14 (guide §2.4): the corpus-wide totals are an unpartitioned
    # window over the #sources-row counts frame, not a second aggregate
    # + broadcast cross — before, the counts subtree (a full corpus
    # scan + groupBy) was evaluated twice, once per consumer. The
    # window runs on a single task over a handful of rows; the corpus
    # is scanned once for counts and once for the filter itself.
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    thresh = counts.select(
        "source", "c_s", "w_s",
        F.sum("c_s").over(wall).alias("n_total"),
        F.sum("w_s").over(wall).alias("w_total"),
    ).select(
        "source",
        F.least(
            F.lit(255).cast("bigint"),
            # `div`, not `/`+floor: double division goes lossy past
            # 2^53 (≈1.2e13 docs at w=3) and would break the documented
            # exact-integer threshold — identically in both engines, so
            # the parity gate could never catch it
            F.expr(
                f"(256 * w_s * n_total) div "
                f"({MIX_BUDGET_DEN} * w_total * c_s)"
            ).cast("bigint"),
        ).alias("t_s"),
    ).select(
        "source", F.format_string("%02x", F.col("t_s").cast("int")).alias("t_hex")
    )
    return thresh


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: pick a deterministic subset whose
    source composition approaches target weights under a global budget.
    Per-source keep rate (in 1/256ths of the md5 keyspace, exact
    integer arithmetic so both engines derive the identical threshold):

        t_s = min(255, 256 * w_s * N / (BUDGET_DEN * W_total * c_s))

    then keep a doc iff the first md5 hex byte of ``md5('mix|'||doc_id)``
    is lexically below ``printf('%02x', t_s)``.

    Scale: the only aggregate is the per-source count table (#sources
    rows); it joins back broadcast, so the corpus side is a pure
    map-side filter — no shuffle of the data, no driver state, and the
    same doc set regardless of partitioning."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(mixture_thresholds(docs)), "source")
        .withColumn("mix_key", mixture_key())
        .where(F.col("mix_key") < F.col("t_hex"))
        .select("doc_id", "source", "mix_key", "t_hex")
    )


_W_CASE = " ".join(
    f"WHEN source = '{s}' THEN {w}" for s, w in MIX_WEIGHTS.items()
)

MIXTURE_SQL = f"""
WITH counts AS (
    SELECT source, COUNT(*) AS c_s,
           (CASE {_W_CASE} ELSE {MIX_DEFAULT_W} END)::BIGINT AS w_s
    FROM documents GROUP BY source
),
totals AS (
    SELECT SUM(c_s) AS n_total, SUM(w_s) AS w_total FROM counts
),
thresh AS (
    SELECT source,
           PRINTF('%02x', LEAST(255,
               (256 * w_s * n_total)
               // ({MIX_BUDGET_DEN} * w_total * c_s))::INT) AS t_hex
    FROM counts, totals
)
SELECT d.doc_id, d.source,
       SUBSTR(MD5('mix|' || d.doc_id::VARCHAR), 1, 2) AS mix_key,
       t.t_hex
FROM documents d JOIN thresh t ON d.source = t.source
WHERE SUBSTR(MD5('mix|' || d.doc_id::VARCHAR), 1, 2) < t.t_hex
"""

# ---------------------------------------------------------------------------
# token-length bucketing

_BUCKETS = [16, 32, 64, 128, 256]


def token_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram: docs bucketed by token count (the
    packing planner's input — bucket populations decide bin size and
    expected padding waste). Map-side-combine aggregate to a
    handful of rows; no meaningful shuffle at any scale."""
    docs = load_spread(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim("text"), " "))
    bucket = F.lit(f"ge{_BUCKETS[-1]:04d}")
    for b in reversed(_BUCKETS):
        bucket = F.when(n < b, F.lit(f"lt{b:04d}")).otherwise(bucket)
    return (
        docs.select(
            bucket.alias("bucket"),
            n.cast("long").alias("n_tokens"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


_BUCKET_CASE = " ".join(
    f"WHEN LEN(STRING_SPLIT(TRIM(text), ' ')) < {b} THEN 'lt{b:04d}'"
    for b in _BUCKETS
)

TOKEN_BUCKET_SQL = f"""
WITH base AS (
    SELECT (CASE {_BUCKET_CASE} ELSE 'ge{_BUCKETS[-1]:04d}' END) AS bucket,
           LEN(STRING_SPLIT(TRIM(text), ' '))::BIGINT AS n_tokens,
           n_chars::BIGINT AS n_chars
    FROM documents
)
SELECT bucket, COUNT(*) AS n_docs, SUM(n_tokens)::BIGINT AS sum_tokens,
       SUM(n_chars)::BIGINT AS sum_chars, MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM base GROUP BY bucket
"""

# ---------------------------------------------------------------------------
# C4-style line-level exact dedup

LINE_W = 5  # words per "line" segment (the corpus has no newlines)


def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level exact dedup: documents split into
    non-overlapping ``LINE_W``-word segments (the corpus text carries
    no newlines, so fixed word spans stand in for lines, as C4's
    three-sentence spans do); every segment seen before — globally,
    ordered by (doc_id, seg_no) — is dropped, the FIRST occurrence
    kept. Unlike ``boilerplate_ngrams`` (df-threshold scoring) this is
    the per-instance keep/drop decision a curation pass actually
    applies, with global first-occurrence semantics.

    Output per doc: segment count, kept count, kept basis points.

    Scale: one shuffle on seg_hash with map-side partial MIN for the
    first-occurrence table (distinct-segment-sized — grows with the
    corpus, so the join back is unhinted per the r6 broadcast rule),
    then one per-doc aggregate. The first occurrence is the
    lexicographic MIN over ``struct(doc_id, seg_no)`` — r7: replaces
    the r6 arithmetic key ``doc_id*1e6+seg_no``, which silently
    collided across documents once a doc exceeded 1e6 segments (a
    5M-word book) and overflowed bigint for doc_ids beyond ~9.2e12,
    corrupting global first-occurrence attribution (both engines
    shared the encoding, so the oracle could not catch it)."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " ")
    n = F.size(toks)
    nsegs = F.ceil(n / F.lit(LINE_W)).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nsegs - 1),
                lambda s: F.unhex(F.md5(
                    F.concat_ws(" ", F.slice(toks, s * LINE_W + 1, LINE_W))
                )),
            )
        ).alias("seg_no", "seg_hash"),
    )
    return _line_dedup_from_segs(segs)


def _line_dedup_from_segs(segs: DataFrame) -> DataFrame:
    """Core keep/drop attribution over a (doc_id, seg_no, seg_hash)
    stream — factored so the first-occurrence semantics are testable at
    planted coordinates where the old arithmetic key collided (e.g.
    (doc 0, seg 5_000_000) vs (doc 5, seg 0) both encoded 5_000_000,
    double-counting both as 'kept')."""
    firsts = segs.groupBy("seg_hash").agg(
        F.min(F.struct("doc_id", "seg_no")).alias("first")
    )
    kept = (
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("seg_no") == F.col("first.seg_no"))
    ).cast("bigint")
    return (
        segs.join(firsts, "seg_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segs"),
            F.sum(kept).alias("n_kept"),
        )
        .select(
            "doc_id", "n_segs", "n_kept",
            F.floor(
                F.col("n_kept") * 10000 / F.col("n_segs") + 0.5
            ).cast("bigint").alias("kept_bp"),
        )
    )


LINE_DEDUP_SQL = f"""
WITH base AS (
    SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents
),
segs AS (
    SELECT doc_id, s.i AS seg_no,
           MD5(ARRAY_TO_STRING(
               toks[s.i * {LINE_W} + 1 : s.i * {LINE_W} + {LINE_W}], ' '
           )) AS seg_hash
    FROM base,
         UNNEST(GENERATE_SERIES(
             0, CAST(CEIL(LEN(toks) / {LINE_W}.0) AS INT) - 1
         )) AS s(i)
),
firsts AS (
    SELECT seg_hash, doc_id AS first_doc, seg_no AS first_seg
    FROM (
        SELECT seg_hash, doc_id, seg_no,
               ROW_NUMBER() OVER (PARTITION BY seg_hash
                                  ORDER BY doc_id, seg_no) AS rn
        FROM segs
    ) WHERE rn = 1
)
SELECT s.doc_id,
       COUNT(*)::BIGINT AS n_segs,
       SUM(CASE WHEN s.doc_id = f.first_doc AND s.seg_no = f.first_seg
           THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       FLOOR(SUM(CASE WHEN s.doc_id = f.first_doc AND s.seg_no = f.first_seg
                 THEN 1 ELSE 0 END)
             * 10000.0 / COUNT(*) + 0.5)::BIGINT AS kept_bp
FROM segs s JOIN firsts f ON s.seg_hash = f.seg_hash
GROUP BY s.doc_id
"""

# ---------------------------------------------------------------------------
# exact-substring repeated spans (Lee et al. 2022 style)

SPAN_L = 5  # minimum repeated-substring width, in words


def repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring repetition profile per document (the shape of
    Lee et al. 2022's suffix-array dedup, linearized for Spark):
    every word ``SPAN_L``-gram occurring >= 2 times anywhere in the
    corpus (within- or cross-document) marks its start position;
    marked positions whose gap is <= ``SPAN_L - 1`` chain into one span
    (their covered token intervals overlap), so a span covering marked
    positions [first..last] spans exactly ``last - first + SPAN_L``
    tokens and distinct spans never overlap — ``covered`` is the true
    union coverage. Output per doc: span count, marked positions,
    covered tokens, coverage in basis points — the statistics a
    span-trimming dedup pass needs.

    Scale: occurrence counts come from ``groupBy(gram)`` with map-side
    partial aggregation, joined back unhinted on ``gram`` (AQE-skew-
    splittable). r7: replaces the r6 count window over the raw exploded
    occurrence stream — a ``Window.partitionBy(gram)`` has no partials
    and no skew splitting, so every corpus-wide occurrence of a viral
    phrase landed in one task as whole rows; the join-back form re-runs
    the explode on the probe side (cheap map-side CPU — _rolling_gram
    per-token hashing, not per-position string hashing) but the
    count side now ships one partial row per task per gram instead.
    Then two windows partitioned by doc_id (per-document data, no
    global sort). Replaces the suffix array — whose construction is
    the part that does not distribute — with gram chaining at the cost
    of missing repeats shorter than SPAN_L."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " ")
    h, idxs, gram = _rolling_gram(SPAN_L)
    grams = docs.select(
        "doc_id", h.alias("_th"), idxs.alias("_idxs")
    ).select(
        "doc_id",
        F.posexplode(F.transform("_idxs", gram)).alias("pos", "gram"),
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("gram")
    )
    marked = grams.join(hot, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        marked.withColumn(
            "new_span",
            F.when(
                F.col("pos") - F.lag("pos", 1, -SPAN_L).over(w)
                <= SPAN_L - 1,
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        .withColumn("span_id", F.sum("new_span").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
        .groupBy("doc_id", "span_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.min("pos").alias("first"),
            F.max("pos").alias("last"),
        )
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("k").cast("bigint").alias("n_marked"),
        F.sum(F.col("last") - F.col("first") + SPAN_L)
        .cast("bigint").alias("covered"),
    )
    base = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("n_tokens")
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("n_marked", F.lit(0)).cast("bigint").alias("n_marked"),
        F.coalesce("covered", F.lit(0)).cast("bigint").alias("covered"),
        F.floor(
            F.coalesce("covered", F.lit(0)) * 10000 / F.col("n_tokens") + 0.5
        ).cast("bigint").alias("covered_bp"),
    )


REPEATED_SPANS_SQL = f"""
WITH base AS (
    SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id, s.i AS pos,
           MD5(ARRAY_TO_STRING(toks[s.i : s.i + {SPAN_L - 1}], ' ')) AS gram
    FROM base,
         UNNEST(GENERATE_SERIES(1, LEN(toks) - {SPAN_L - 1})) AS s(i)
),
counts AS (
    SELECT gram FROM (
        SELECT gram, COUNT(*) AS c FROM grams GROUP BY gram
    ) WHERE c >= 2
),
marked AS (
    SELECT g.doc_id, g.pos FROM grams g JOIN counts c ON g.gram = c.gram
),
runs AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos, 1, -{SPAN_L}) OVER (
               PARTITION BY doc_id ORDER BY pos) <= {SPAN_L - 1}
               THEN 0 ELSE 1 END AS new_span
    FROM marked
),
span_ids AS (
    SELECT doc_id, pos,
           SUM(new_span) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS span_id
    FROM runs
),
spans AS (
    SELECT doc_id, span_id, COUNT(*) AS k,
           MIN(pos) AS first, MAX(pos) AS last
    FROM span_ids GROUP BY doc_id, span_id
),
per_doc AS (
    SELECT doc_id,
           COUNT(*) AS n_spans,
           SUM(k) AS n_marked,
           SUM(last - first + {SPAN_L}) AS covered
    FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       LEN(STRING_SPLIT(TRIM(d.text), ' '))::BIGINT AS n_tokens,
       COALESCE(p.n_spans, 0)::BIGINT AS n_spans,
       COALESCE(p.n_marked, 0)::BIGINT AS n_marked,
       COALESCE(p.covered, 0)::BIGINT AS covered,
       FLOOR(COALESCE(p.covered, 0) * 10000.0
             / LEN(STRING_SPLIT(TRIM(d.text), ' ')) + 0.5)::BIGINT
           AS covered_bp
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""

# ---------------------------------------------------------------------------
# unigram entropy

def doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-entropy quality score per document:
    ``H = ln(n) - sum(c*ln(c))/n`` over term counts c — low-entropy docs
    are repetitive/templated (drop candidates), emitted as an integer
    ``round(H * 1e4)`` so both engines agree after an identical fp op
    chain. One (doc_id, term) shuffle with map-side partials, then a
    per-doc aggregate; term cardinality per doc is bounded by doc
    length, so no skew beyond the longest document."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("term")
    )
    counts = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.sum("c")
    cls = F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
    h = F.log(n.cast("double")) - cls / n.cast("double")
    return counts.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.floor(h * 10000 + 0.5).cast("bigint").alias("entropy_e4"),
    )


ENTROPY_SQL = """
WITH counts AS (
    SELECT doc_id, term, COUNT(*) AS c
    FROM (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS term
        FROM documents
    ) GROUP BY doc_id, term
)
SELECT doc_id,
       SUM(c)::BIGINT AS n_tokens,
       COUNT(*)::BIGINT AS n_distinct,
       FLOOR((LN(SUM(c)::DOUBLE)
              - SUM(c::DOUBLE * LN(c::DOUBLE)) / SUM(c)::DOUBLE)
             * 10000 + 0.5)::BIGINT AS entropy_e4
FROM counts GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# unigram-LM perplexity proxy

def doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model perplexity proxy: mean negative
    log-likelihood of each document under the corpus's own unigram
    distribution, ``nll = -(1/n) * sum ln(c_term / N_total)`` — the
    cheap stand-in for the LM-perplexity filter (CCNet-style: docs far
    from the corpus distribution are junk candidates; docs too close
    are boilerplate). Emitted as ``floor(nll * 1e4 + 0.5)``.

    Scale: the term-frequency table grows with the corpus (Heaps' law
    on raw web text), so it is joined unhinted — AQE broadcasts it while
    small and shuffle-joins on ``term`` otherwise; the corpus side is one
    (doc, term) count shuffle with map-side partials plus the per-doc
    aggregate — the same two-shuffle shape as tf-idf."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("term")
    )
    counts = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    # r15 (guide §2.4, replacing r14's lazy checkpoint): a checkpoint
    # hides its lineage in a separate RDD, so the scoring branch below
    # could never share the model branch's shuffle and the corpus
    # explode ran TWICE (the r14 floors measured the checkpointed form
    # 0.37 s SLOWER than r13). Unchekpointed, every consumer (the
    # scored join probe, vocab, and the n_total scalar through it)
    # sits above the one Exchange hashpartitioning(doc_id, term) —
    # the planner collapses the repeats into ReusedExchange nodes and
    # the corpus is tokenized, exploded and shuffled exactly once;
    # only the vocab-sized final aggregates re-execute per consumer.
    vocab = counts.groupBy("term").agg(F.sum("c").alias("cg"))
    total = vocab.agg(F.sum("cg").alias("n_total"))
    # No broadcast hint on vocab: Heaps' law means raw-web unigram
    # vocabulary keeps growing with corpus size (typos/URLs/numbers), so
    # the term-frequency table is NOT bounded at 100 TB. Unhinted, AQE
    # broadcasts while small and shuffle-joins on `term` (the same key
    # the vocab aggregate already shuffled on) when it is not. `total`
    # is a single row and stays an explicit broadcast.
    scored = (
        counts.join(vocab, "term")
        .crossJoin(F.broadcast(total))
    )
    n = F.sum("c")
    ll = F.sum(
        F.col("c").cast("double")
        * F.log(F.col("cg").cast("double") / F.col("n_total").cast("double"))
    )
    return scored.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.floor((-ll / n.cast("double")) * 10000 + 0.5)
        .cast("bigint").alias("nll_e4"),
    )


PERPLEXITY_SQL = """
WITH counts AS (
    SELECT doc_id, term, COUNT(*) AS c
    FROM (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS term
        FROM documents
    ) GROUP BY doc_id, term
),
vocab AS (
    SELECT term, SUM(c) AS cg FROM counts GROUP BY term
),
total AS (
    SELECT SUM(cg) AS n_total FROM vocab
)
SELECT c.doc_id,
       SUM(c.c)::BIGINT AS n_tokens,
       FLOOR((-SUM(c.c::DOUBLE * LN(v.cg::DOUBLE / t.n_total::DOUBLE))
              / SUM(c.c)::DOUBLE) * 10000 + 0.5)::BIGINT AS nll_e4
FROM counts c JOIN vocab v ON c.term = v.term CROSS JOIN total t
GROUP BY c.doc_id
"""


# ---------------------------------------------------------------------------
# deterministic global training-order shuffle

# 15 md5 nibbles = 60 bits: the widest key that cannot overflow signed
# BIGINT under the *16 Horner chain in either engine
SHUFFLE_NIBBLES = 15


def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle — the final op of every training
    pipeline: assign each doc its position in a seeded pseudo-random
    total order (``md5('shuf|'||doc_id)``), reproducible across runs
    and engines.

    Scale: the naive ``ROW_NUMBER() OVER (ORDER BY ...)`` is a
    single-partition window (fatal at 100 TB); this rides
    ``relational.global_row_number`` — range-bucketed parallel windows
    plus broadcast prefix offsets, exact at any size. The key is 60
    bits (15 md5 nibbles — the 16th would overflow signed BIGINT,
    which DuckDB raises on), birthday-collision-free to ~2^30 ≈ 1e9
    docs (r7: widened from the r6 32-bit key, which collided from ~80k
    docs and made the post-collision order fall back to doc_id);
    doc_id tie-breaking keeps the order total and identical in both
    engines regardless."""
    from cloud_volume_spark.operators.relational import global_row_number

    docs = load_spread(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
    # r14 (guide §1.2 per-task work): Spark-side the 15-nibble value is
    # ONE conv(hex, 16, 10) — bit-identical to the ascii fold (60 bits
    # < 2^63, md5 hex is lowercase) at 1/15th the per-row expression
    # count. The DuckDB oracle keeps the ascii-arithmetic chain (no
    # CONV there); parity pins the equivalence.
    key = F.conv(F.substring(h, 1, SHUFFLE_NIBBLES), 16, 10)
    keyed = docs.select(
        "doc_id", "source", key.cast("bigint").alias("shuffle_key")
    )
    ranked, _ = global_row_number(
        keyed, "shuffle_key", tie_cols=["doc_id"], out_col="shuffle_pos"
    )
    return ranked.select(
        "doc_id", "source", "shuffle_key",
        F.col("shuffle_pos").cast("bigint").alias("shuffle_pos"),
    )


def _nib_sql(i: int) -> str:
    c = f"ASCII(SUBSTR(h, {i + 1}, 1))"
    return f"({c} - 48 - CASE WHEN {c} >= 97 THEN 39 ELSE 0 END)"


def _shuffle_key_sql() -> str:
    expr = f"{_nib_sql(0)}::BIGINT"
    for i in range(1, SHUFFLE_NIBBLES):
        expr = f"({expr} * 16 + {_nib_sql(i)})"
    return expr


SHUFFLE_SQL = f"""
WITH keyed AS (
    SELECT doc_id, source,
           MD5('shuf|' || doc_id::VARCHAR) AS h
    FROM documents
),
k AS (
    SELECT doc_id, source,
           {_shuffle_key_sql()}::BIGINT AS shuffle_key
    FROM keyed
)
SELECT doc_id, source, shuffle_key,
       ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id)::BIGINT
           AS shuffle_pos
FROM k
"""


QUERIES = {
    "boilerplate_ngrams": boilerplate_ngrams,
    "line_dedup": line_dedup,
    "repeated_spans": repeated_spans,
    "mixture_sample": mixture_sample,
    "token_bucket_stats": token_bucket_stats,
    "doc_perplexity": doc_perplexity,
    "corpus_shuffle": corpus_shuffle_order,
}

ORACLE_SQL = {
    "boilerplate_ngrams": BOILERPLATE_SQL,
    "line_dedup": LINE_DEDUP_SQL,
    "repeated_spans": REPEATED_SPANS_SQL,
    "mixture_sample": MIXTURE_SQL,
    "token_bucket_stats": TOKEN_BUCKET_SQL,
    "doc_perplexity": PERPLEXITY_SQL,
    "corpus_shuffle": SHUFFLE_SQL,
}

# retired r14 to free a driver slot (registry capped at 100): the
# per-character entropy map-agg is the same plan shape as
# doc_perplexity's per-token bigram surprisal (map-side explode →
# per-doc aggregate), which stays registered — the local DuckDB
# parity suite still runs it every round
RETIRED_QUERIES = {
    "doc_entropy": doc_entropy,
}

RETIRED_ORACLE_SQL = {
    "doc_entropy": ENTROPY_SQL,
}
