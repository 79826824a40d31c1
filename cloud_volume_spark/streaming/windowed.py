"""Streaming windowed aggregations over the events table.

readStream → transform → writeStream, testable with the availableNow
trigger (processes the whole backlog as one incremental run, then
stops) — results must equal the batch equivalents, which is what
tests/test_streaming.py asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

def _events_schema(ts_type) -> StructType:
    return StructType([
        StructField("event_id", LongType(), True),
        StructField("ts", ts_type, True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ])


# Default: fixtures carry ts as parquet timestamp[us].
EVENTS_SCHEMA = _events_schema(TimestampType())


def read_events_stream(spark: SparkSession, src_dir: str,
                       max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a directory of event parquet files.
    New files appearing in the directory are discovered incrementally —
    the ingestion pattern for a bucket fed by an upstream producer.
    ``max_files_per_trigger=1`` makes each arrival file its own
    micro-batch (what the cross-batch stateful-operator tests need).

    readStream needs a declared schema, so probe the files with a batch
    read first and mirror ``operators.common.load``'s dtype guard: older
    fixtures store TIMESTAMP(NANOS) (arriving as BIGINT ns under
    ``nanosAsLong``), current ones timestamp[us] — support both rather
    than hard-coding a unit.
    """
    try:
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        prior = None

    def _restore():
        # one restore path for both the probe-failure and the
        # not-a-ns-stream cases (the toggle is session-global)
        if prior is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ts_is_long = isinstance(
            spark.read.parquet(src_dir).schema["ts"].dataType, LongType
        )
    except Exception:
        _restore()  # a throwing call must not leak the toggle
        raise
    if not ts_is_long:
        _restore()  # the stream doesn't need the legacy conf
    # else: the conf stays set for the session — the parquet reader
    # needs it for the lifetime of the ns-unit stream, not only the
    # probe; callers mixing ns-event streams with other TIMESTAMP(NANOS)
    # batch reads in one session inherit BIGINT-ns there too (documented
    # session-level requirement rather than a silent per-read toggle)
    stream = (
        spark.readStream
        .schema(_events_schema(LongType() if ts_is_long else TimestampType()))
        .option("maxFilesPerTrigger", int(max_files_per_trigger))
        .parquet(src_dir)
    )
    if ts_is_long:
        # exact integer floor — same rule (and same fix) as the batch
        # loader in operators/common.py: double division can round up
        # across a microsecond boundary
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return stream


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts per event type with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            F.col("w").end.alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows (gap timeout) — the incremental
    counterpart of operators.relational.events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.col("s").start.alias("session_start"),
            F.col("s").end.alias("session_end"),
            "user_id", "n_events", "session_value",
        )
    )


# ---------------------------------------------------------------------------
# custom stateful operator: streaming spatial-index maintenance
# ---------------------------------------------------------------------------

ENVELOPE_STATE_SCHEMA = StructType([
    StructField("n", LongType(), True),
    StructField("x0", LongType(), True),
    StructField("x1", LongType(), True),
    StructField("y0", LongType(), True),
    StructField("y1", LongType(), True),
    StructField("z0", LongType(), True),
    StructField("z1", LongType(), True),
])

ENVELOPE_OUT_SCHEMA = StructType([
    StructField("label", LongType(), True),
    StructField("n_voxels", LongType(), True),
    StructField("x0", LongType(), True),
    StructField("x1", LongType(), True),
    StructField("y0", LongType(), True),
    StructField("y1", LongType(), True),
    StructField("z0", LongType(), True),
    StructField("z1", LongType(), True),
])


def streaming_label_envelope(points: DataFrame) -> DataFrame:
    """Incrementally maintained per-label bounding envelope — the
    streaming counterpart of ``SpatialIndex.get_bbox`` (reference
    ``spatial_index.py:697-761``): as labeled points arrive, each
    label's envelope/count state expands monotonically and every batch
    emits the updated envelopes.

    ``points``: streaming DataFrame (label LONG, x LONG, y LONG,
    z LONG). Custom stateful logic = ``applyInPandasWithState``, the
    engine's escape hatch when windows/aggregations can't express the
    semantics (state here outlives any window: envelopes never close).
    """
    import pandas as pd

    def update(key, pdfs, state):
        if state.exists:
            n, x0, x1, y0, y1, z0, z1 = state.get
        else:
            n = 0
            x0 = y0 = z0 = None
            x1 = y1 = z1 = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            lo = pdf[["x", "y", "z"]].min()
            hi = pdf[["x", "y", "z"]].max()
            x0 = int(lo.x) if x0 is None else min(x0, int(lo.x))
            y0 = int(lo.y) if y0 is None else min(y0, int(lo.y))
            z0 = int(lo.z) if z0 is None else min(z0, int(lo.z))
            x1 = int(hi.x) if x1 is None else max(x1, int(hi.x))
            y1 = int(hi.y) if y1 is None else max(y1, int(hi.y))
            z1 = int(hi.z) if z1 is None else max(z1, int(hi.z))
        state.update((n, x0, x1, y0, y1, z0, z1))
        yield pd.DataFrame({
            "label": [int(key[0])], "n_voxels": [n],
            "x0": [x0], "x1": [x1], "y0": [y0], "y1": [y1],
            "z0": [z0], "z1": [z1],
        })

    return points.groupBy("label").applyInPandasWithState(
        update,
        outputStructType=ENVELOPE_OUT_SCHEMA,
        stateStructType=ENVELOPE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# streaming annotation ingest
# ---------------------------------------------------------------------------

def ingest_annotations_stream(layer, src_dir: str, checkpoint_dir: str,
                              schema: str = "id long, x double, y double, z double"):
    """Incremental annotation ingest: new parquet files appearing under
    ``src_dir`` (an upstream producer's drop bucket) stream-append into
    ``layer``'s dataset with the same spatial-grid cell columns the
    batch writer derives, so bbox queries prune identically on streamed
    rows. Returns the StreamingQuery; run with
    ``trigger(availableNow=True)`` semantics via ``.awaitTermination``
    after the backlog drains, or leave running for continuous ingest."""
    spark = layer.spark
    cells = layer.grid_cell_cols()  # the batch writer's own exprs
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(src_dir)
        .withColumns(cells)
    )
    return (
        stream.writeStream
        .format("parquet")
        .option("path", layer.data_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# streaming exact dedup
# ---------------------------------------------------------------------------

def read_documents_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files
    (schema probed from the files, as for events)."""
    schema = spark.read.parquet(src_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )


def streaming_quality_filter(docs: DataFrame) -> DataFrame:
    """Gopher-rule quality filtering over a document stream: keeps the
    passing docs with their per-rule flags. The rules are the exact
    plan fragment the batch operator uses
    (``operators.text.quality_filter_frame``) — map-only expressions,
    so they run stateless inside each micro-batch and the streaming
    output provably equals the batch verdicts (tested availableNow ≡
    batch)."""
    from cloud_volume_spark.operators.text import quality_filter_frame

    return quality_filter_frame(docs).where(F.col("passes") == 1)


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """Incremental exact dedup: the first document seen per content
    hash passes, later duplicates are dropped — the streaming
    counterpart of ``operators.dedup.dedup_exact`` for a corpus that
    arrives file-by-file. ``dropDuplicates`` keeps one state row per
    distinct hash (16-byte keys — bounded by corpus cardinality, not
    stream length); cap state age with
    ``withWatermark + dropDuplicatesWithinWatermark`` when the dedup
    contract is time-bounded rather than global."""
    return (
        docs.withColumn("content_hash", F.md5("text"))
        .dropDuplicates(["content_hash"])
    )


def streaming_incremental_dedup(docs_stream: DataFrame,
                                static_docs: DataFrame) -> DataFrame:
    """Stream-static incremental dedup: a file stream of incoming
    documents is checked against a *static* corpus through the
    MinHash-LSH band index. The stream side computes signatures with
    pure map-side array expressions (``dedup.signature_frame_maponly``
    — no explode+groupBy, so no stateful aggregation is needed), joins
    the corpus band table (stream-static join: Spark broadcasts or
    rescans the static side per micro-batch), and emits each duplicate
    incoming doc once (dropDuplicates state keyed on doc_id).

    Output: ``doc_id, dup_of`` rows for incoming docs that near-match
    an existing doc — the streaming mirror of
    ``dedup.dedup_incremental``'s ``is_kept = 0`` set.

    Contract note: the ``doc_id`` SET exactly mirrors the batch
    operator (tested), but ``dup_of`` is an *arbitrary* matching
    corpus doc, not the batch's ``MIN(doc_id)`` canonical — append
    mode's ``dropDuplicates`` state keeps whichever band row arrives
    first, and a deterministic min would need a watermarked aggregate
    (update mode). Downstream consumers that need the canonical id
    should join the batch cluster map instead."""
    from cloud_volume_spark.operators.dedup import (
        band_frame, signature_frame_maponly,
    )

    static_bands = band_frame(signature_frame_maponly(static_docs)).select(
        F.col("doc_id").alias("dup_of"), "band", "band_hash"
    ).persist()  # the stream-static join rescans the static side per
    # micro-batch; without persist every trigger re-shingles and
    # re-md5s the ENTIRE corpus (the pipeline's most expensive stage)
    new_bands = band_frame(signature_frame_maponly(docs_stream))
    return (
        new_bands.join(static_bands, ["band", "band_hash"])
        .select("doc_id", "dup_of")
        .dropDuplicates(["doc_id"])
    )


def streaming_lsh_index_dedup(docs_stream: DataFrame,
                              index) -> DataFrame:
    """Stream-static incremental dedup THROUGH the persisted LSH band
    index (:class:`cloud_volume_spark.lsh_index.LSHIndex`) — the
    serving form of :func:`streaming_incremental_dedup`: the static
    side is the ON-DISK band table, so no trigger ever re-signatures
    the corpus (the plain variant must persist a derived band frame
    and still pays the full signature job once per session; here the
    bands were materialized once at index build and survive across
    sessions). The stream side stays pure map-side array expressions;
    the join key includes the index's bucket column so the static
    scan stays aligned with its partition layout.

    Same output contract (and the same arbitrary-``dup_of`` caveat)
    as ``streaming_incremental_dedup``: one ``doc_id, dup_of`` row
    per duplicate incoming doc."""
    from cloud_volume_spark.lsh_index import _band_bucket
    from cloud_volume_spark.operators.dedup import (
        band_frame, signature_frame_maponly,
    )

    return (_lsh_dup_candidates(docs_stream, index)
            .dropDuplicates(["doc_id"]))


def _lsh_dup_candidates(docs_stream: DataFrame, index) -> DataFrame:
    """(doc_id, dup_of) candidate rows from the stream-static join
    against the persisted band table — stateless (pre-dedup), so a
    composite gate can union it with other branches and pay ONE
    terminal dropDuplicates instead of stacking stateful operators."""
    from cloud_volume_spark.lsh_index import _band_bucket
    from cloud_volume_spark.operators.dedup import (
        band_frame, signature_frame_maponly,
    )

    static_bands = index.bands().select(
        F.col("doc_id").alias("dup_of"), "band", "band_hash", "bucket")
    new_bands = band_frame(signature_frame_maponly(docs_stream)) \
        .withColumn("bucket",
                    _band_bucket(int(index.meta["n_buckets"])))
    return (
        new_bands.join(static_bands, ["band", "bucket", "band_hash"])
        .select("doc_id", "dup_of")
    )


def _ivf_sem_candidates(emb_frame: DataFrame, index,
                        threshold: float) -> DataFrame:
    """(vec_id, dup_of) candidate rows: assign each incoming vector to
    its nearest FROZEN index centroid with the literal-argmin fold
    (``similarity._assign_fold`` — pure map expressions; streaming
    frames cannot run ``rank_centroids``'s window, and on unit vectors
    the rounded-sqdist argmin is the cosine argmin, ``||u-c||² =
    2-2cos``, up to 6-dp rounding knife-edges), then flag cosine ≥
    ``threshold`` against the persisted inverted list of THAT cluster
    only — the SemDeDup cluster-bounding, with the static side the
    on-disk lists (stream-static equi-join on the partition column;
    no corpus-wide product, no re-assignment of the corpus)."""
    from cloud_volume_spark.operators.similarity import (
        _as_double, _assign_fold, _dot, _with_norm,
    )

    cents = {int(r["cent_id"]):
             [float(x) / float(r["cnrm"]) for x in r["cvec"]]
             for r in index.centroids().collect()}
    q = _with_norm(emb_frame.select(
        "vec_id", _as_double("embedding").alias("embedding")))
    unit = q.withColumn(
        "v", F.transform("embedding", lambda x: x / F.col("nrm")))
    assign = _assign_fold(unit, cents).select(
        "vec_id", "embedding", "nrm",
        F.col("cluster").alias("cent_id"))
    lists = index.lists().select(
        F.col("vec_id").alias("dup_of"),
        F.col("embedding").alias("ie"),
        F.col("nrm").alias("inrm"), "cent_id")
    sim = F.round(
        _dot(F.col("embedding"), F.col("ie"))
        / (F.col("nrm") * F.col("inrm")), 6)
    return (
        assign.join(lists, "cent_id")
        .where(F.col("vec_id") != F.col("dup_of"))
        .where(sim >= float(threshold))
        .select("vec_id", "dup_of")
    )


def streaming_ivf_semantic_dedup(emb_stream: DataFrame, index,
                                 threshold: float | None = None)\
        -> DataFrame:
    """Stream-static SemDeDup THROUGH the persisted IVF index
    (:class:`cloud_volume_spark.ann_index.IVFIndex`) — the vector
    mirror of :func:`streaming_lsh_index_dedup`: an incoming stream of
    ``(vec_id, embedding)`` is flagged when a vector in ITS assigned
    cluster's on-disk inverted list sits at cosine ≥ ``threshold``
    (default ``similarity.SEMDEDUP_T``). The index's frozen centroids
    collapse to driver-side literals at setup (nlist·dim doubles), so
    assignment is stateless map work per micro-batch; the candidate
    join is cluster-bounded against the persisted lists — the corpus
    is never re-assigned and never re-scanned beyond the equi-join.

    Output: one ``vec_id, dup_of`` row per semantically-duplicate
    incoming vector (``dup_of`` an arbitrary matching indexed vector —
    the ``streaming_incremental_dedup`` caveat; the batch
    ``semantic_dedup`` owns the canonical keep-rule)."""
    from cloud_volume_spark.operators.similarity import SEMDEDUP_T

    t = SEMDEDUP_T if threshold is None else float(threshold)
    return (_ivf_sem_candidates(emb_stream, index, t)
            .dropDuplicates(["vec_id"]))


def streaming_ingest_gate(docs_stream: DataFrame, lsh_index, ivf_index,
                          embeddings_static: DataFrame,
                          threshold: float | None = None) -> DataFrame:
    """The on-ingest cross-modal gate — the streaming twin of the
    batch ``corpus.curate_join`` composition, scoped to what a single
    pass over arriving documents can decide: emit the EXCLUSION stream
    ``(doc_id, reason)`` with one row per violated rule —

    - ``quality``: fails the Gopher rules (the batch
      ``quality_filter_frame`` plan fragment, map-only);
    - ``text_dup``: near-matches an indexed corpus doc through the
      persisted LSH band table;
    - ``semantic_dup``: the doc's embedding (looked up in the STATIC
      embedding store — a stream-stream join with a live embedder
      would need watermarked event time) sits at cosine ≥
      ``threshold`` of an indexed vector in its assigned IVF cluster.

    A kill-list, not a verdict table: production gates subtract it
    from the corpus, reasons stay auditable per rule, and docs without
    a vector simply contribute no ``semantic_dup`` row (the batch
    composition's ``has_vector`` caveat). All three branches are
    stateless map/stream-static work unioned into ONE terminal
    ``dropDuplicates`` — a single stateful operator, not a stack
    (stacked stateful ops constrain output modes), and never a
    stream-stream join."""
    from cloud_volume_spark.operators.similarity import SEMDEDUP_T
    from cloud_volume_spark.operators.text import quality_filter_frame

    t = SEMDEDUP_T if threshold is None else float(threshold)
    bad_quality = (
        quality_filter_frame(docs_stream)
        .where(F.col("passes") == 0)
        .select("doc_id", F.lit("quality").alias("reason")))
    text_dup = (
        _lsh_dup_candidates(docs_stream, lsh_index)
        .select("doc_id", F.lit("text_dup").alias("reason")))
    emb = embeddings_static.select(
        F.col("vec_id").alias("doc_id"), "embedding")
    with_vec = docs_stream.select("doc_id").join(emb, "doc_id").select(
        F.col("doc_id").alias("vec_id"), "embedding")
    sem_dup = (
        _ivf_sem_candidates(with_vec, ivf_index, t)
        .select(F.col("vec_id").alias("doc_id"),
                F.lit("semantic_dup").alias("reason")))
    return (
        bad_quality.unionByName(text_dup).unionByName(sem_dup)
        .dropDuplicates(["doc_id", "reason"])
    )


def streaming_contamination(docs_stream: DataFrame,
                            benchmark_docs: DataFrame) -> DataFrame:
    """Stream-static benchmark decontamination: each incoming document
    is flagged when ANY of its word 5-grams appears in the static
    benchmark set — the on-ingest mirror of
    ``corpus.corpus_contamination`` (same ``_rolling_gram`` keys, same
    broadcast of the genuinely-small benchmark gram table).

    The stream side is stateless map work (per-token hashes + explode,
    no aggregation), so no watermark is needed; the only streaming
    state is ``dropDuplicates`` on ``doc_id`` (one row per flagged
    doc — bounded by the number of contaminated incoming docs, not
    the gram stream). Output: ``doc_id`` rows to EXCLUDE, the
    ``contaminated = 1`` set of the batch operator (tested
    availableNow ≡ batch)."""
    from cloud_volume_spark.operators.corpus import CONTAM_NGRAM
    from cloud_volume_spark.operators.curation import _word_grams

    bench = (
        _word_grams(benchmark_docs, CONTAM_NGRAM).select("gram").distinct()
    ).persist()  # recomputed per micro-batch otherwise (stream-static)
    return (
        _word_grams(docs_stream, CONTAM_NGRAM)
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )


# ---------------------------------------------------------------------------
# streaming conversion funnel (custom stateful operator)
# ---------------------------------------------------------------------------

def streaming_funnel(events: DataFrame,
                     stages=("view", "click", "purchase"),
                     key: str = "user_id") -> DataFrame:
    """Incrementally maintained N-stage conversion funnel — the
    streaming counterpart of ``relational.funnel`` (default stages =
    the registered ``events_funnel`` instance): per key, the first
    stage-0 event, then per later stage the first event at-or-after
    the previous stage's chosen instant. A per-key N-slot state
    machine via ``applyInPandasWithState`` (the stage DEPENDENCY is
    why this isn't a windowed aggregation: a stage only counts once
    the previous slot is filled, and state outlives any window).

    Equals the batch operator when each key's events arrive in
    non-decreasing ``ts`` order ACROSS micro-batches (a micro-batch's
    rows are concatenated across arrow chunks and sorted ONCE here —
    per-chunk sorting would mis-order disorder that spans the
    arrow-batch boundary — so intra-batch disorder is fine) — the
    usual contract for a log-ordered feed. A stream cannot
    retroactively admit an earlier stage-k event when an even-earlier
    stage-(k-1) event arrives late, because that would require
    retaining every non-qualifying event forever (unbounded state).

    ``events``: streaming DataFrame with at least
    (ts timestamp, <key> long, event_type string). NULL-``ts`` rows
    are dropped — with one honest divergence from batch: a key whose
    ONLY stage-0 events are NULL-ts gets a depth-1 row with a NULL
    epoch from the batch operator (MIN over all-NULL is NULL, the
    group still exists) but no row here, because admitting it would
    have to be retracted if a real-ts stage-0 event arrived later
    (batch MIN skips NULLs), and a stream can't retract. Feeds whose
    ts is non-NULL — the log-ordered contract above — are exactly
    batch-equal. Output mode: update — one row per key per micro-batch
    that touched it; the latest emission per key is the current
    funnel.
    """
    import pandas as pd

    stages = tuple(stages)
    if not stages:
        raise ValueError("streaming_funnel: need at least one stage")
    if len(set(stages)) != len(stages):
        # the rank dict would silently map the repeated stage to its
        # LAST slot, leaving slot 0 unfillable — every key would
        # silently vanish from the output instead of erroring
        raise ValueError(
            f"streaming_funnel: duplicate stage in {stages}")
    # stage timestamps in MICROSECONDS (comparisons at full precision;
    # the floor-to-seconds happens only at the output edge, mirroring
    # relational.funnel)
    state_schema = StructType([
        StructField(f"s{i}_us", LongType(), True)
        for i in range(len(stages))
    ])
    out_schema = StructType(
        [StructField(key, LongType(), True)]
        + [StructField(f"{s}_epoch", LongType(), True) for s in stages]
        + [StructField("funnel_depth", IntegerType(), True)]
    )
    # equal-timestamp stage ties must resolve in STAGE ORDER: batch's
    # `>=` comparisons admit a stage-k event AT the stage-(k-1)
    # instant, so the earlier stage must be applied to state first
    # (and sorting by ts alone is unstable — the tie order would be
    # nondeterministic)
    rank = {s: i for i, s in enumerate(stages)}

    def update(k, pdfs, state):
        slots = list(state.get) if state.exists else [None] * len(stages)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # ONE concat+sort over the whole micro-batch: the arrow
            # chunk iterator carries no cross-chunk ordering
            pdf = pd.concat(chunks).dropna(subset=["ts"])
            pdf = pdf.assign(
                _rank=pdf["event_type"].map(rank)
            ).sort_values(["ts", "_rank"], kind="stable")
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                i = rank.get(et)
                if i is None or slots[i] is not None:
                    continue
                us = ts.value // 1000  # pd.Timestamp.value is ns
                if i == 0:
                    slots[0] = us
                elif slots[i - 1] is not None and us >= slots[i - 1]:
                    slots[i] = us
        state.update(tuple(slots))
        if slots[0] is None:
            # stage 0 not reached: the batch funnel has no row yet
            return
        # NULL keys group together (batch groupBy does the same) and
        # must emit as None — int() of the NULL key (it arrives as
        # None OR float NaN depending on the arrow path) would kill
        # the whole stream on one malformed event
        row = {key: [None if pd.isna(k[0]) else int(k[0])]}
        for name, us in zip(stages, slots):
            row[f"{name}_epoch"] = [
                None if us is None else us // 1_000_000]
        row["funnel_depth"] = [
            1 + sum(1 for us in slots[1:] if us is not None)]
        yield pd.DataFrame(row)

    return (
        events.select("ts", key, "event_type")
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


# ---------------------------------------------------------------------------
# streaming path mining
# ---------------------------------------------------------------------------

def streaming_path_mine(events: DataFrame, n: int = 3,
                        key: str = "user_id") -> DataFrame:
    """Incrementally emit completed length-``n`` event-type paths per
    key — the streaming counterpart of ``relational.top_paths``'s
    n-gram stage. Per-key state is just the last ``n-1`` event types
    (a fixed-width tail, bytes per key, never a growing history), via
    ``applyInPandasWithState``; each arriving event completes at most
    one n-gram ending at it, so output volume ≡ the batch operator's
    pre-aggregation row count.

    Deliberately emits (key, path) ROWS rather than running top-k
    counts: chaining a second stateful aggregation behind
    applyInPandasWithState in one query is not a supported streaming
    topology, and the global top-k over the emitted rows is a cheap
    batch rollup on the sink (exactly ``top_paths``'s groupBy/
    TakeOrderedAndProject tail) — the standard split between the
    stateful stream stage and the serving-side aggregate.

    Ordering contract = ``streaming_funnel``'s: per-key non-decreasing
    ``ts`` ACROSS micro-batches; intra-batch disorder is repaired by
    one concat+sort over the whole micro-batch on (ts, event_id) —
    the batch operator's exact tie rule. NULL-``ts``, NULL-``event_id``
    (the tie-breaker — engines disagree on its NULL sort order), and
    NULL-``event_type`` rows are dropped, the batch operator's exact
    rule (so a NULL-typed event splices its neighbors adjacent on
    both paths; a None in the tail would otherwise crash the join).
    """
    import pandas as pd

    if n < 2:
        raise ValueError("streaming_path_mine: need n >= 2")
    state_schema = StructType([
        StructField(f"t{i}", StringType(), True) for i in range(n - 1)
    ])
    out_schema = StructType([
        StructField(key, LongType(), True),
        StructField("path", StringType(), True),
    ])

    def update(k, pdfs, state):
        tail = list(state.get) if state.exists else [None] * (n - 1)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        paths = []
        if chunks:
            # ONE concat+sort over the micro-batch (cross-arrow-chunk
            # disorder; same rationale as streaming_funnel)
            pdf = pd.concat(chunks).dropna(
                subset=["ts", "event_id", "event_type"])
            pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
            for et in pdf["event_type"]:
                if all(t is not None for t in tail):
                    paths.append(">".join([*tail, et]))
                tail = [*tail[1:], et]
        state.update(tuple(tail))
        if paths:
            # NULL-key group emits as None (same rule as the funnel:
            # one malformed event must never kill the stream; the NULL
            # key arrives as None or NaN depending on the arrow path)
            kv = None if pd.isna(k[0]) else int(k[0])
            yield pd.DataFrame({key: [kv] * len(paths), "path": paths})

    return (
        events.select("ts", "event_id", key, "event_type")
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def streaming_conversion_lag(events: DataFrame,
                             key: str = "user_id") -> DataFrame:
    """Emit ``(user_id, day_idx, lag_s)`` ONCE per user at the moment
    of their first view→purchase conversion — the streaming
    counterpart of ``relational.conversion_lag_frame`` (tested
    row-equal); the per-day median/stats rollup is the batch tail on
    the sink, exactly ``streaming_path_mine``'s stateful/serving
    split. Per-key state is three scalars (first-view nanos, LATEST
    pre-view purchase nanos, done flag) — fixed bytes per user, never
    a history.

    Ordering contract = ``streaming_funnel``'s: per-key non-decreasing
    ``ts`` ACROSS micro-batches. Within a batch the FULL batch is
    visible, so first-view is resolved over all of the batch's views
    before purchases are scanned — a purchase tied on ts with the
    first view matches ``ts >= first_view`` exactly as the batch
    operator's filter does, regardless of intra-batch order. The one
    cross-batch tie (purchase in an EARLIER micro-batch than the view
    it ties with) is covered by a single pending-purchase scalar:
    under non-decreasing ts the eventual first view's ts is >= every
    earlier purchase's ts, so a pre-view purchase can only ever
    convert on ts EQUALITY with it — remembering the LATEST one seen
    is exact (an earlier one is strictly below any future view's ts
    and can never qualify; no purchase history needed). lag_s
    truncates each epoch to whole seconds BEFORE subtracting (Spark
    ``unix_timestamp`` semantics), so values are bit-equal to the
    batch frame. NULL ts/event_type/key rows drop at the edge (the
    batch operator's rule)."""
    import pandas as pd

    state_schema = StructType([
        StructField("first_view_ns", LongType(), True),
        StructField("pend_purchase_ns", LongType(), True),
        StructField("done", IntegerType(), True),
    ])
    out_schema = StructType([
        StructField(key, LongType(), True),
        StructField("day_idx", LongType(), True),
        StructField("lag_s", LongType(), True),
    ])

    def update(k, pdfs, state):
        fv_ns, pend_ns, done = (tuple(state.get) if state.exists
                                else (None, None, 0))
        out = []
        if not done and not pd.isna(k[0]):
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                pdf = pd.concat(chunks).dropna(
                    subset=["ts", "event_type"])
                views = pdf[pdf["event_type"] == "view"]
                if len(views):
                    batch_min = int(views["ts"].min().value)
                    fv_ns = batch_min if fv_ns is None else min(
                        int(fv_ns), batch_min)
                # normalize to ns explicitly: the arrow batch may
                # arrive as datetime64[us] or [ns] depending on the
                # conversion path, and a bare astype(int64) would
                # compare µs against the ns state
                ts_ns = (pdf["ts"].values
                         .astype("datetime64[ns]").astype("int64"))
                is_purch = (pdf["event_type"] == "purchase").to_numpy()
                if fv_ns is not None:
                    fp_ns = None
                    # a pre-view purchase remembered from an earlier
                    # batch converts iff it ties the first view's ts
                    if pend_ns is not None and int(pend_ns) >= int(fv_ns):
                        fp_ns = int(pend_ns)
                    m = is_purch & (ts_ns >= int(fv_ns))
                    if m.any():
                        batch_fp = int(ts_ns[m].min())
                        fp_ns = batch_fp if fp_ns is None else min(
                            fp_ns, batch_fp)
                    if fp_ns is not None:
                        fv_s = int(fv_ns) // 1_000_000_000
                        out.append((int(k[0]), fv_s // 86400,
                                    fp_ns // 1_000_000_000 - fv_s))
                        done = 1
                elif is_purch.any():
                    # keep the LATEST pre-view purchase: only a ts
                    # tied with the (>= everything so far) future
                    # first view can convert, and when it does it IS
                    # the minimum qualifying purchase ts
                    batch_pp = int(ts_ns[is_purch].max())
                    pend_ns = batch_pp if pend_ns is None else max(
                        int(pend_ns), batch_pp)
        state.update((fv_ns, pend_ns, done))
        if out:
            yield pd.DataFrame(out, columns=[key, "day_idx", "lag_s"])

    return (
        events.select("ts", key, "event_type")
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


# ---------------------------------------------------------------------------
# streaming PII redaction
# ---------------------------------------------------------------------------

def streaming_pii_redact(docs: DataFrame) -> DataFrame:
    """On-ingest PII scrubbing: the exact plan fragment of
    ``corpus.pii_redact`` applied to a document stream — stateless
    map-only regexp work, so no watermark and no streaming state at
    all; every micro-batch is independently correct (tested
    availableNow ≡ batch)."""
    from cloud_volume_spark.operators.corpus import pii_redact

    return pii_redact(docs)


def streaming_redact_text(docs: DataFrame) -> DataFrame:
    """Text-preserving on-ingest redaction — the composable stage
    form: downstream streaming operators (incremental dedup,
    contamination, quality) consume the scrubbed ``text`` directly,
    so one pipeline does CDC → redact → dedup in a single query
    (tested end-to-end, availableNow ≡ the batch composition).
    Stateless map-only, like :func:`streaming_pii_redact`."""
    from cloud_volume_spark.operators.corpus import redact_text_frame

    return redact_text_frame(docs)


def streaming_source_mixture(docs: DataFrame) -> DataFrame:
    """Streaming mixture-drift monitor state: per-(source, lang) doc
    and char counts over a document stream — the stateful core of the
    composition dashboard a recurring crawl watches, completing the
    ``operators.text.source_mixture_stats`` story for the CDC/ingest
    feed. The aggregate is EXACTLY the batch operator's shared
    ``lang_count_frame`` fragment, so the stream keeps one bounded
    state row per (source, lang) — |sources|x|langs|, independent of
    stream length — and the readout (dominant language, shares) comes
    from applying ``mixture_from_lang_counts`` over the sink table,
    the same |sources|x|langs|-sized derivation the batch path uses:
    streaming ≡ batch is an identity of shared plan fragments, not a
    re-implementation (tested availableNow ≡ batch across multiple
    micro-batches). Run in complete or update output mode. With a
    timestamped feed, window the same aggregate behind
    ``withWatermark`` to get per-interval drift instead of running
    composition."""
    from cloud_volume_spark.operators.text import lang_count_frame

    return lang_count_frame(docs)
