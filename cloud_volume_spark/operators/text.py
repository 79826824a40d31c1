"""Text analysis operators over the ``documents`` table — the
training-data-pipeline surface (token stats, quality scoring,
language-ID heuristic, fingerprinting).

All expressions are JVM-side built-ins (split/transform/filter/md5) —
no Python UDFs in these paths — and every operator has a duckdb oracle
with the exact same computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_volume_spark.operators.common import load, load_spread

STOPWORDS = ("the", "a", "of", "in", "to")

# language marker tokens for the n-gram/stopword-vote language-ID
# heuristic; deterministic and mirrored exactly in the oracle SQL.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "value"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "un", "est"),
    "de": ("der", "die", "und", "ist", "ein"),
    "zh": ("shi", "de", "he", "zai", "le"),
}


def _tokens(col):
    return F.split(F.trim(col), " ")


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, mean token
    length (the BPE-ish regex variant is ``doc_subword_count``)."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            (F.length(F.trim("text")) - F.size(toks) + 1) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


TOKEN_STATS_SQL = """
SELECT doc_id,
       LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_tokens,
       LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' '))) AS n_distinct_tokens,
       ROUND(
         (LENGTH(TRIM(text)) - LEN(STRING_SPLIT(TRIM(text), ' ')) + 1)
         / LEN(STRING_SPLIT(TRIM(text), ' '))::DOUBLE, 4
       ) AS avg_token_len
FROM documents
"""


def doc_subword_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword counting: tokens further split at 4-char
    boundaries (an approximation of byte-pair merges with a fixed
    merge budget), plus chars-per-subword — the usual "token budget"
    estimator for LLM corpora."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    # each word of length L contributes ceil(L/4) subwords
    subwords = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / F.lit(4.0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    return docs.select(
        "doc_id",
        subwords.alias("n_subwords"),
        F.round(F.length(F.trim("text")) / subwords, 4).alias("chars_per_subword"),
    )


SUBWORD_SQL = """
SELECT doc_id,
       LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(TRIM(text), ' '),
                               t -> CEIL(LENGTH(t) / 4.0)::BIGINT))::BIGINT
           AS n_subwords,
       ROUND(LENGTH(TRIM(text)) /
             LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(TRIM(text), ' '),
                                     t -> CEIL(LENGTH(t) / 4.0)::BIGINT))::DOUBLE,
             4) AS chars_per_subword
FROM documents
"""


def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation × (1 − stopword
    ratio), plus its components — the filter most pipelines run before
    training-data inclusion."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_tok = F.size(toks)
    stop_ratio = n_stop / n_tok
    len_score = F.least(F.lit(1.0), F.length("text") / F.lit(500.0))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(len_score, 4).alias("length_score"),
        # integer basis points: floor(x*1e4+0.5) is the same fp op chain
        # in both engines, unlike ROUND whose half-way mode differs
        F.floor(len_score * (1 - stop_ratio) * 10000 + 0.5)
        .cast("long")
        .alias("quality_score_bp"),
    )


QUALITY_SQL = f"""
WITH scored AS (
    SELECT doc_id,
           LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_tokens,
           LEN(LIST_FILTER(STRING_SPLIT(TRIM(text), ' '),
               t -> t IN {STOPWORDS!r})) AS n_stop,
           LEAST(1.0, LENGTH(text) / 500.0) AS len_score
    FROM documents
)
SELECT doc_id, n_tokens,
       ROUND(n_stop / n_tokens::DOUBLE, 4) AS stopword_ratio,
       ROUND(len_score, 4) AS length_score,
       FLOOR(len_score * (1 - n_stop / n_tokens::DOUBLE) * 10000 + 0.5)::BIGINT
           AS quality_score_bp
FROM scored
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint over normalized text —
    the content-addressing primitive exact dedup builds on."""
    docs = load_spread(spark, sf_dir, "documents")
    # explicit class, not \s: Java \s includes vertical tab \x0B,
    # RE2 (DuckDB) \s does not — a \x0B in any document diverged the
    # two engines' fingerprints. [ \t\n\r\f] means the same in both.
    norm = F.lower(F.trim(F.regexp_replace("text", "[ \t\n\r\f]+", " ")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


FINGERPRINT_SQL = r"""
SELECT doc_id,
       MD5(LOWER(TRIM(REGEXP_REPLACE(text, '[ \t\n\r\f]+', ' ', 'g')))) AS fingerprint,
       LENGTH(LOWER(TRIM(REGEXP_REPLACE(text, '[ \t\n\r\f]+', ' ', 'g')))) AS norm_len
FROM documents
"""


def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language vote (n-gram-heuristic family): score per
    language = number of that language's marker tokens present;
    deterministic argmax with fixed tie-break order en>es>fr>de>zh."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens(F.col("text")))
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marr, t)))
    pred = (
        F.when(
            (scores["en"] >= scores["es"]) & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["de"]) & (scores["en"] >= scores["zh"]),
            "en",
        )
        .when(
            (scores["es"] >= scores["fr"]) & (scores["es"] >= scores["de"])
            & (scores["es"] >= scores["zh"]),
            "es",
        )
        .when(
            (scores["fr"] >= scores["de"]) & (scores["fr"] >= scores["zh"]), "fr"
        )
        .when(scores["de"] >= scores["zh"], "de")
        .otherwise("zh")
    )
    return docs.select(
        "doc_id",
        pred.alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
        (pred == F.col("lang")).cast("int").alias("is_match"),
    )


def _markers_sql(lang: str) -> str:
    return (
        f"LEN(LIST_FILTER(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' ')), "
        f"t -> t IN {LANG_MARKERS[lang]!r}))"
    )


LANGID_SQL = f"""
WITH scores AS (
    SELECT doc_id, lang,
           {_markers_sql('en')} AS s_en,
           {_markers_sql('es')} AS s_es,
           {_markers_sql('fr')} AS s_fr,
           {_markers_sql('de')} AS s_de,
           {_markers_sql('zh')} AS s_zh
    FROM documents
), pred AS (
    SELECT doc_id, lang,
           CASE
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
             WHEN s_de >= s_zh THEN 'de'
             ELSE 'zh'
           END AS predicted_lang
    FROM scores
)
SELECT doc_id, predicted_lang, lang AS labeled_lang,
       (predicted_lang = lang)::INT AS is_match
FROM pred
"""


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (the corpus-quality family popularized by
    large-LM data pipelines): fraction of duplicate word bigrams and
    the most-frequent-token share. High values mark boilerplate,
    keyword stuffing, and generation loops — standard drop criteria
    upstream of training. JVM-side only: bigrams are built with
    transform over an index sequence, no Python UDF; fractions are
    ratios of exact integer counts rounded identically in the oracle."""
    docs = load_spread(spark, sf_dir, "documents")
    step = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    m = F.greatest(n - 1, F.lit(0))
    # bigrams as zip_with over two slices: O(L) per doc. (The naive
    # transform(sequence, i -> element_at(toks, i)...) form inlines the
    # split into every lambda element after project collapse — O(L^2)
    # per doc, 50x slower on real documents.)
    bigrams = F.zip_with(
        F.slice("toks", 1, m), F.slice("toks", 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # top-token share without an explode+groupBy shuffle: longest run
    # of equal neighbors in the sorted token array, one fold per doc
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def run_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(
        F.array_sort("toks"), acc0, run_step, lambda acc: acc["best"]
    )
    stats = step.select(
        "doc_id", n.alias("n_tokens"),
        F.size(bigrams).alias("n_bigrams"),
        (F.size(bigrams) - F.size(F.array_distinct(bigrams)))
        .alias("n_dup_bigrams"),
        top.alias("top_tok"),
    )
    return stats.select(
        "doc_id", "n_tokens",
        F.when(
            F.col("n_bigrams") > 0,
            F.round(F.col("n_dup_bigrams") / F.col("n_bigrams"), 4),
        ).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
        F.round(F.col("top_tok") / F.col("n_tokens"), 4).alias("top_token_frac"),
    )


REPETITION_SQL = """
WITH base AS (
    SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks
    FROM documents
), bi AS (
    SELECT doc_id, LEN(toks) AS n_tokens,
           [toks[i] || ' ' || toks[i + 1]
            FOR i IN GENERATE_SERIES(1, GREATEST(LEN(toks) - 1, 0))]
               AS bigrams
    FROM base
), bistats AS (
    SELECT doc_id, n_tokens, LEN(bigrams) AS n_bigrams,
           LEN(bigrams) - LEN(LIST_DISTINCT(bigrams)) AS n_dup_bigrams
    FROM bi
), topt AS (
    SELECT doc_id, MAX(c) AS top_tok FROM (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM base, UNNEST(toks) AS t(tok)
        GROUP BY doc_id, tok
    ) GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       CASE WHEN b.n_bigrams > 0
            THEN ROUND(b.n_dup_bigrams / b.n_bigrams::DOUBLE, 4)
            ELSE 0.0 END AS dup_bigram_frac,
       ROUND(t.top_tok / b.n_tokens::DOUBLE, 4) AS top_token_frac
FROM bistats b JOIN topt t USING (doc_id)
"""


# Gopher-style rule thresholds (Rae et al. 2021 §A1.1 shape, bounds
# adapted to the synthetic corpus's 10-99-word documents so both
# branches of every rule are exercised)
GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_DISTINCT_RATIO = 0.2


def quality_filter_frame(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """The Gopher rule columns over any documents frame — map-only
    built-ins, so the same plan fragment runs in batch and inside a
    Structured Streaming micro-batch (see
    :func:`~cloud_volume_spark.streaming.streaming_quality_filter`).

    ``keep`` passes extra source columns through unchanged (r14:
    lets corpus_curate fuse the verdict into its own scan instead of
    self-joining the documents table on doc_id)."""
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    mean_wlen = F.round((F.length(F.trim("text")) - n + 1) / n, 4)
    distinct_ratio = F.round(F.size(F.array_distinct(toks)) / n, 4)
    stop_hit = F.exists(toks, lambda t: t.isin(*STOPWORDS)).cast("int")
    df = docs.select(
        "doc_id",
        *keep,
        n.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        distinct_ratio.alias("distinct_ratio"),
        stop_hit.alias("stop_hit"),
    )
    passes = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN
        )
        & (F.col("distinct_ratio") >= GOPHER_MIN_DISTINCT_RATIO)
        & (F.col("stop_hit") == 1)
    )
    return df.withColumn("passes", passes.cast("int"))


def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality filter: hard rule composition (word-count
    bounds, mean-word-length bounds, distinct-word ratio, stopword
    presence) → per-rule flags + the final keep/drop verdict. All
    JVM-side built-ins, map-only — the shape of every production
    pretraining filter pass. Float comparisons are made on ROUND(_, 4)
    values so any engine computing the same closed form agrees."""
    return quality_filter_frame(load_spread(spark, sf_dir, "documents"))


QUALITY_FILTER_SQL = f"""
WITH base AS (
    SELECT doc_id,
           LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_words,
           ROUND((LENGTH(TRIM(text)) - LEN(STRING_SPLIT(TRIM(text), ' ')) + 1)
                 / LEN(STRING_SPLIT(TRIM(text), ' '))::DOUBLE, 4)
               AS mean_word_len,
           ROUND(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' ')))
                 / LEN(STRING_SPLIT(TRIM(text), ' '))::DOUBLE, 4)
               AS distinct_ratio,
           (LEN(LIST_FILTER(STRING_SPLIT(TRIM(text), ' '),
                            t -> t IN {STOPWORDS!r})) > 0)::INT AS stop_hit
    FROM documents
)
SELECT doc_id, n_words, mean_word_len, distinct_ratio, stop_hit,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND mean_word_len BETWEEN {GOPHER_MIN_MEAN_WLEN}
                               AND {GOPHER_MAX_MEAN_WLEN}
        AND distinct_ratio >= {GOPHER_MIN_DISTINCT_RATIO}
        AND stop_hit = 1)::INT AS passes
FROM base
"""


def source_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition: doc count, total characters,
    language spread, and the dominant language with its share — the
    table a mixture-weight designer reads before setting per-domain
    sampling rates (and the drift monitor a recurring crawl compares
    across snapshots).

    Scale: two partial-aggregating shuffles on low-cardinality keys
    ((source, lang) then source) and one equi-join between them —
    every stage collapses map-side to at most |sources|x|langs| rows
    per task, so the plan is flat in corpus size. Deterministic
    dominant language: ties break on the lang string itself. NULL
    source/lang rows are dropped at the edge (the engines disagree on
    NULL ordering and a NULL group is not a mixture component)."""
    return mixture_from_lang_counts(
        lang_count_frame(load(spark, sf_dir, "documents")))


def lang_count_frame(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) doc and char counts — the single partial
    aggregate BOTH mixture paths share: the batch readout above and
    the streaming drift monitor (``streaming.streaming_source_mixture``
    keeps exactly these rows as its state)."""
    return (docs.where(
        F.col("source").isNotNull() & F.col("lang").isNotNull())
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length("text")).alias("sum_chars")))


def mixture_from_lang_counts(per_lang: DataFrame) -> DataFrame:
    """The mixture readout derived from a (source, lang, n, sum_chars)
    composition table — |sources|x|langs| rows, so this is driver-cheap
    no matter the corpus size. Shared verbatim by the batch operator
    and the streaming monitor's sink-side derivation, which is what
    makes the streaming ≡ batch test an identity, not a coincidence."""
    from pyspark.sql.window import Window

    tot = per_lang.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum("sum_chars").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), "lang")
    top = (per_lang.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1)
           .select("source", F.col("lang").alias("top_lang"),
                   F.col("n").alias("_top_n")))
    return (
        tot.join(top, "source")
        .select("source", "n_docs", "sum_chars", "n_langs", "top_lang",
                F.round(F.col("_top_n") / F.col("n_docs"), 6)
                .alias("top_lang_share"))
    )


SOURCE_MIXTURE_SQL = """
WITH base AS (
    SELECT source, lang, text FROM documents
    WHERE source IS NOT NULL AND lang IS NOT NULL
), per_lang AS (
    SELECT source, lang, COUNT(*) AS n FROM base GROUP BY source, lang
), tot AS (
    SELECT source, COUNT(*) AS n_docs,
           SUM(LENGTH(text))::BIGINT AS sum_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM base GROUP BY source
), top AS (
    SELECT source, lang AS top_lang, n AS top_n,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n DESC, lang) AS rn
    FROM per_lang
)
SELECT t.source, t.n_docs, t.sum_chars, t.n_langs, top.top_lang,
       ROUND(top.top_n / t.n_docs, 6) AS top_lang_share
FROM tot t JOIN top ON t.source = top.source AND top.rn = 1
"""


BIGRAM_TOP_K = 20


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent word pair, whitespace
    collapsed before splitting so both engines tokenize identical
    arrays; sub-2-token docs contribute nothing. Shared by the model
    head (:func:`bigram_lm_top`) and the per-doc scorer
    (:func:`doc_bigram_logprob`)."""
    docs = load_spread(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
    toks = F.split(F.trim(F.regexp_replace(F.col("text"),
                                           r"\s+", " ")), " ")
    base = docs.select("doc_id", toks.alias("t")).where(F.size("t") >= 2)
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.get("t", i - 1).alias("w1"),
                    F.get("t", i).alias("w2")),
            )
        ).alias("bg")
    ).select("doc_id", "bg.w1", "bg.w2")


def bigram_lm_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model head: the BIGRAM_TOP_K most
    frequent word bigrams with their conditional probability
    P(w2 | w1) = c(w1,w2) / c(w1 as a bigram head) — the n-gram LM
    statistic behind perplexity filters and autocomplete heads.

    Scale: the explode is bounded (one row per adjacent token pair),
    the (w1, w2) count partial-aggregates map-side to vocab^2 rows per
    task, the head counts derive from the ALREADY-aggregated bigram
    table (vocab^2-sized, not corpus-sized), and the top-k is a
    sort-limit (TakeOrderedAndProject), never a global sort. Ties at
    the k boundary break on (w1, w2) for an engine-exact cut.
    Whitespace is collapsed before splitting so both engines tokenize
    identical word arrays; sub-2-token docs contribute nothing."""
    bg = _doc_bigrams(spark, sf_dir).select("w1", "w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_bigram"))
    c1 = c2.groupBy("w1").agg(F.sum("n_bigram").alias("n_w1"))
    return (
        c2.join(c1, "w1")
        .select("w1", "w2", "n_bigram", "n_w1",
                F.round(F.col("n_bigram") / F.col("n_w1"), 6)
                .alias("cond_p"))
        .orderBy(F.desc("n_bigram"), "w1", "w2")
        .limit(BIGRAM_TOP_K)
    )


BIGRAM_LM_SQL = f"""
WITH toks AS (
    SELECT string_split_regex(trim(regexp_replace(text, '\\s+', ' ',
                                                  'g')), ' ') AS t
    FROM documents
    WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
), bg AS (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM toks, UNNEST(generate_series(1, len(t) - 1)) s(i)
    WHERE len(t) >= 2
), c2 AS (
    SELECT w1, w2, COUNT(*) AS n_bigram FROM bg GROUP BY w1, w2
), c1 AS (
    SELECT w1, SUM(n_bigram)::BIGINT AS n_w1 FROM c2 GROUP BY w1
)
SELECT w1, w2, n_bigram, n_w1, ROUND(n_bigram / n_w1, 6) AS cond_p
FROM c2 JOIN c1 USING (w1)
ORDER BY n_bigram DESC, w1, w2
LIMIT {BIGRAM_TOP_K}
"""


def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM score: the mean negative log-likelihood
    of each doc's word bigrams under the corpus's own bigram model
    with add-one smoothing — ``P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V)``,
    V = number of distinct bigram heads. This closes the loop between
    :func:`bigram_lm_top` (the model) and the unigram
    ``doc_perplexity`` proxy: the KenLM-style quality filter a data
    pipeline actually runs (high-nll docs are far from the corpus
    distribution → junk candidates). Emitted as
    ``floor(nll * 1e4 + 0.5)`` so both engines agree after an
    identical fp op chain.

    Scale: the model (c2 joined c1) is a vocab²-sized AGGREGATED
    table built once — the corpus is never shuffled to the model side;
    the per-doc bigram counts join it on (w1, w2) (one corpus-sized
    shuffle with map-side partials, AQE broadcasts the model while it
    fits); V is a broadcast scalar. Scoring a FOREIGN corpus against
    this model would left-join with ``coalesce(n_bigram, 0) /
    coalesce(n_w1, 0)`` — here the model derives from the same docs,
    so every bigram hits and the inner join is lossless."""
    bg = _doc_bigrams(spark, sf_dir)
    # r15 (guide §2.4/§1.2, replacing r14's lazy checkpoint of c2):
    # the corpus tokenize+explode used to run TWICE — once under the
    # checkpointed model base, once for the per-doc counts (a
    # checkpoint hides its lineage in a separate RDD, so the scoring
    # branch could not share the model branch's shuffle). Now the
    # model base derives FROM the per-doc counts (n_bigram == SUM of
    # per-doc c_doc — exact integer regrouping), so ONE corpus explode
    # + one (doc_id, w1, w2) shuffle feeds everything. The checkpoint
    # moves DOWN to dbg, the one genuinely multi-consumer corpus
    # frame: relying on AQE runtime exchange reuse instead was
    # measured fragile here — the c1/v branches sit one level above a
    # branch that holds the ORIGINAL dbg exchange while they hold its
    # ReusedExchange, and those canonical forms do not match, so one
    # branch silently re-ran the explode (the doc_perplexity cascade
    # works because its original-holder has no exchange above it).
    # Lazy (no barrier job), and the pinned frame is the aggregated
    # per-doc counts, not the raw token stream.
    dbg = (bg.groupBy("doc_id", "w1", "w2")
           .agg(F.count(F.lit(1)).alias("c_doc"))
           .localCheckpoint(eager=False))
    c2 = dbg.groupBy("w1", "w2").agg(F.sum("c_doc").alias("n_bigram"))
    c1 = c2.groupBy("w1").agg(F.sum("n_bigram").alias("n_w1"))
    model = c2.join(c1, "w1")
    v = c1.agg(F.count(F.lit(1)).alias("v"))
    logp = F.log(
        (F.col("n_bigram") + 1).cast("double")
        / (F.col("n_w1") + F.col("v")).cast("double"))
    return (
        dbg.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.sum("c_doc").cast("long").alias("n_bigrams"),
            F.floor(
                -F.sum(F.col("c_doc").cast("double") * logp)
                / F.sum("c_doc").cast("double") * 10000 + 0.5)
            .cast("bigint").alias("nll_e4"),
        )
    )


DOC_BIGRAM_LOGPROB_SQL = """
WITH toks AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(text, '\\s+', ' ',
                                                  'g')), ' ') AS t
    FROM documents
    WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
), bg AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM toks, UNNEST(generate_series(1, len(t) - 1)) s(i)
    WHERE len(t) >= 2
), c2 AS (
    SELECT w1, w2, COUNT(*) AS n_bigram FROM bg GROUP BY w1, w2
), c1 AS (
    SELECT w1, SUM(n_bigram)::BIGINT AS n_w1 FROM c2 GROUP BY w1
), vocab AS (
    SELECT COUNT(*) AS v FROM c1
), dbg AS (
    SELECT doc_id, w1, w2, COUNT(*) AS c_doc
    FROM bg GROUP BY doc_id, w1, w2
)
SELECT doc_id,
       SUM(c_doc)::BIGINT AS n_bigrams,
       FLOOR(-SUM(c_doc::DOUBLE * LN((n_bigram + 1)::DOUBLE
                                     / (n_w1 + v)::DOUBLE))
             / SUM(c_doc)::DOUBLE * 10000 + 0.5)::BIGINT AS nll_e4
FROM dbg
JOIN c2 USING (w1, w2)
JOIN c1 USING (w1)
CROSS JOIN vocab
GROUP BY doc_id
"""


QUERIES = {
    "doc_token_stats": doc_token_stats,
    "doc_subword_count": doc_subword_count,
    "doc_quality_score": doc_quality_score,
    "doc_fingerprint": doc_fingerprint,
    "doc_langid": doc_langid,
    "doc_repetition": doc_repetition,
    "doc_quality_filter": doc_quality_filter,
    "source_mixture_stats": source_mixture_stats,
    "bigram_lm_top": bigram_lm_top,
    "doc_bigram_logprob": doc_bigram_logprob,
}

ORACLE_SQL = {
    "doc_quality_filter": QUALITY_FILTER_SQL,
    "doc_repetition": REPETITION_SQL,
    "doc_token_stats": TOKEN_STATS_SQL,
    "doc_subword_count": SUBWORD_SQL,
    "doc_quality_score": QUALITY_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
    "doc_langid": LANGID_SQL,
    "source_mixture_stats": SOURCE_MIXTURE_SQL,
    "bigram_lm_top": BIGRAM_LM_SQL,
    "doc_bigram_logprob": DOC_BIGRAM_LOGPROB_SQL,
}
