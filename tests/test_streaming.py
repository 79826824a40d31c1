"""Streaming operators must converge to the batch answers when the
backlog is processed with the availableNow trigger."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cloud_volume_spark.operators.common import load
from cloud_volume_spark.streaming import (
    read_events_stream, session_window_stats, windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), os.path.join(d, "part-0.parquet")
    )
    return str(d)


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark, windowed_event_counts(stream, "10 minutes"), "win_counts"
    ).toPandas()

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            F.col("w").end.alias("window_end"),
            "event_type", "n_events", "total_value",
        )
        .toPandas()
    )
    key = ["window_start", "window_end", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(g) == len(b)
    assert (g["n_events"].to_numpy() == b["n_events"].to_numpy()).all()
    assert (g["total_value"].to_numpy() == b["total_value"].to_numpy()).all()


def test_session_windows_cover_all_events(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark, session_window_stats(stream, gap="30 minutes"), "sessions"
    ).toPandas()
    n_events_total = load(spark, sf_dir, "events").count()
    assert got["n_events"].sum() == n_events_total
    # session windows are disjoint per user
    for uid, grp in got.groupby("user_id"):
        ordered = grp.sort_values("session_start")
        starts = ordered["session_start"].to_numpy()
        ends = ordered["session_end"].to_numpy()
        assert (starts[1:] >= ends[:-1]).all()


def test_streaming_label_envelope_matches_batch(spark, tmp_path):
    """applyInPandasWithState envelope accumulation: feed labeled
    points in two file batches; the final emitted state per label must
    equal the batch groupBy envelope over all points."""
    import numpy as np
    import pandas as pd

    from cloud_volume_spark.streaming import streaming_label_envelope

    rng = np.random.default_rng(9)
    pts = pd.DataFrame({
        "label": rng.integers(1, 6, 400).astype("int64"),
        "x": rng.integers(0, 100, 400).astype("int64"),
        "y": rng.integers(0, 100, 400).astype("int64"),
        "z": rng.integers(0, 50, 400).astype("int64"),
    })
    d = tmp_path / "pts"
    d.mkdir()
    spark.createDataFrame(pts.iloc[:200]).coalesce(1).write.parquet(
        str(d / "b0")
    )
    spark.createDataFrame(pts.iloc[200:]).coalesce(1).write.parquet(
        str(d / "b1")
    )

    stream = (
        spark.readStream
        .schema("label long, x long, y long, z long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_label_envelope(stream)
        .writeStream.format("memory").queryName("env")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from env").toPandas()
    # update mode emits one row per label per batch; last emission wins
    got = got.groupby("label").last().reset_index()

    want = (
        pts.groupby("label")
        .agg(
            n_voxels=("x", "size"),
            x0=("x", "min"), x1=("x", "max"),
            y0=("y", "min"), y1=("y", "max"),
            z0=("z", "min"), z1=("z", "max"),
        )
        .reset_index()
    )
    got = got.sort_values("label").reset_index(drop=True)
    want = want.sort_values("label").reset_index(drop=True)
    for col in ["label", "n_voxels", "x0", "x1", "y0", "y1", "z0", "z1"]:
        assert list(got[col].astype(int)) == list(want[col].astype(int)), col


def test_ingest_annotations_stream(spark, tmp_path):
    """Streamed annotation files land in the layer with grid-cell
    columns; bbox reads see exactly the streamed rows."""
    import pandas as pd

    from cloud_volume_spark.annotations import AnnotationLayer
    from cloud_volume_spark.geometry import Bbox
    from cloud_volume_spark.streaming import ingest_annotations_stream

    layer = AnnotationLayer(
        spark, str(tmp_path / "ann"), annotation_type="POINT",
        grid_cell=(64, 64, 64),
    )
    src = tmp_path / "incoming"
    src.mkdir()
    batch1 = pd.DataFrame({
        "id": [1, 2], "x": [10.0, 200.0], "y": [10.0, 20.0], "z": [5.0, 70.0],
    })
    batch2 = pd.DataFrame({
        "id": [3], "x": [30.0], "y": [40.0], "z": [50.0],
    })
    spark.createDataFrame(batch1).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(batch2).coalesce(1).write.parquet(str(src / "b1"))

    q = ingest_annotations_stream(
        layer, str(src) + "/*", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    layer.commit_info()

    assert layer.count() == 3
    got = layer.get_by_bbox(Bbox((0, 0, 0), (64, 64, 64))).collect()
    assert sorted(r.id for r in got) == [1, 3]
    # grid-cell columns derived during the stream
    row = {r.id: r for r in layer.df().collect()}[2]
    assert (row.gx, row.gy, row.gz) == (3, 0, 1)


def test_streaming_exact_dedup_matches_batch(spark, sf_dir, tmp_path):
    """First-seen-per-hash streaming dedup must pass exactly one doc
    per distinct content hash — same hash set and count as the batch
    exact dedup."""
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_exact_dedup,
    )

    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(str(d), "part-0.parquet"),
    )
    stream = streaming_exact_dedup(read_documents_stream(spark, str(d)))
    q = (
        stream.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select content_hash from sdedup").toPandas()

    batch = (
        load(spark, sf_dir, "documents")
        .select(F.md5("text").alias("content_hash"))
        .distinct()
        .toPandas()
    )
    assert len(got) == len(batch)
    assert set(got.content_hash) == set(batch.content_hash)
    assert got.content_hash.is_unique


def test_streaming_quality_filter_matches_batch(spark, sf_dir, tmp_path):
    """The streaming Gopher filter must pass exactly the docs the
    batch operator passes, with identical rule columns."""
    from cloud_volume_spark.operators.text import doc_quality_filter
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_quality_filter,
    )

    d = tmp_path / "docs_qstream"
    d.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(str(d), "part-0.parquet"),
    )
    stream = streaming_quality_filter(read_documents_stream(spark, str(d)))
    q = (
        stream.writeStream.format("memory")
        .queryName("squality")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import pandas as pd

    got = (
        spark.sql("select * from squality").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    batch = doc_quality_filter(spark, sf_dir).toPandas()
    batch = (
        batch[batch["passes"] == 1]
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch)


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static incremental dedup: the incoming-doc stream joined
    against the static corpus band table must flag exactly the docs the
    batch dedup_incremental marks as duplicates."""
    import pandas as pd

    from cloud_volume_spark.operators.dedup import (
        INGEST_MOD, dedup_incremental,
    )
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_incremental_dedup,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d = tmp_path / "inc_stream"
    d.mkdir()
    docs.where(F.col("doc_id") % INGEST_MOD == 0).toPandas().to_parquet(
        str(d / "part-0.parquet")
    )
    static_docs = docs.where(F.col("doc_id") % INGEST_MOD != 0)

    stream = streaming_incremental_dedup(
        read_documents_stream(spark, str(d)), static_docs
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sincdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = set(
        r.doc_id for r in spark.sql("select doc_id from sincdedup").collect()
    )
    batch = dedup_incremental(spark, sf_dir).toPandas()
    want = set(batch[batch["is_kept"] == 0]["doc_id"])
    assert got == want and len(want) > 0


def test_streaming_contamination_matches_batch(spark, sf_dir, tmp_path):
    """On-ingest decontamination: the stream-static gram join must flag
    exactly the docs the batch corpus_contamination marks
    contaminated = 1."""
    from cloud_volume_spark.operators.corpus import (
        CONTAM_MOD, corpus_contamination,
    )
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_contamination,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d = tmp_path / "contam_stream"
    d.mkdir()
    docs.where(F.col("doc_id") % CONTAM_MOD != 0).toPandas().to_parquet(
        str(d / "part-0.parquet")
    )
    benchmark = docs.where(F.col("doc_id") % CONTAM_MOD == 0)

    stream = streaming_contamination(
        read_documents_stream(spark, str(d)), benchmark
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("scontam")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = set(
        r.doc_id for r in spark.sql("select doc_id from scontam").collect()
    )
    batch = corpus_contamination(spark, sf_dir).toPandas()
    want = set(batch[batch["contaminated"] == 1]["doc_id"])
    assert got == want and len(want) > 0


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    """Per-user stateful funnel over a time-ordered two-batch feed must
    converge to the batch events_funnel result (update mode: last
    emission per user wins)."""
    import pandas as pd

    from cloud_volume_spark.operators.relational import events_funnel
    from cloud_volume_spark.streaming import streaming_funnel

    events = load(spark, sf_dir, "events")
    n = events.count()
    mid_ts = (events.select("ts").orderBy("ts").limit(n // 2)
              .agg(F.max("ts")).collect()[0][0])
    d = tmp_path / "funnel_feed"
    d.mkdir()
    # ts-ordered across batches: every user's early events land in b0
    (events.where(F.col("ts") <= F.lit(mid_ts))
     .coalesce(1).write.parquet(str(d / "b0")))
    (events.where(F.col("ts") > F.lit(mid_ts))
     .coalesce(1).write.parquet(str(d / "b1")))

    ts_type = events.schema["ts"].dataType.simpleString()
    stream = (
        spark.readStream
        .schema(f"event_id long, ts {ts_type}, user_id long, "
                "event_type string, value double, props string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory").queryName("sfunnel")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from sfunnel").toPandas()
        .groupby("user_id").last().reset_index()
        .sort_values("user_id").reset_index(drop=True)
    )
    batch = (
        events_funnel(spark, sf_dir).toPandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    assert list(got["user_id"]) == list(batch["user_id"])
    for col in ["view_epoch", "click_epoch", "purchase_epoch",
                "funnel_depth"]:
        pd.testing.assert_series_equal(
            got[col].astype("float64"), batch[col].astype("float64"),
            check_names=False), col


def test_streaming_funnel_intra_batch_disorder(spark, tmp_path):
    """Rows arriving out of ts order WITHIN a micro-batch are sorted
    before the state machine runs: a (purchase, click, view) file still
    yields a depth-3 funnel."""
    import pandas as pd

    from cloud_volume_spark.streaming import streaming_funnel

    rows = [  # reverse stage order in the file
        (3, "2024-01-01 00:30:00", 7, "purchase", 0.0, "{}"),
        (2, "2024-01-01 00:20:00", 7, "click", 0.0, "{}"),
        (1, "2024-01-01 00:10:00", 7, "view", 0.0, "{}"),
    ]
    d = tmp_path / "disorder"
    d.mkdir()
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(str(d / "b0"))

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory").queryName("sfunnel2")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sfunnel2").toPandas()
    assert len(got) == 1
    assert int(got["funnel_depth"].iloc[0]) == 3


def test_streaming_pii_redact_matches_batch(spark, sf_dir, tmp_path):
    """Stateless streaming redaction emits exactly the batch rows."""
    import pandas as pd

    from cloud_volume_spark.operators.corpus import doc_pii_redact
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_pii_redact,
    )

    d = tmp_path / "docs_pii_stream"
    d.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(str(d), "part-0.parquet"),
    )
    stream = streaming_pii_redact(read_documents_stream(spark, str(d)))
    q = (
        stream.writeStream.format("memory")
        .queryName("spii")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from spii").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    batch = (
        doc_pii_redact(spark, sf_dir).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch)


def test_streaming_funnel_disorder_across_arrow_chunks(spark, tmp_path):
    """Intra-batch disorder that SPANS the arrow-chunk boundary must
    still be sorted as one micro-batch: with 2-row arrow chunks, a file
    ordered (click, purchase, view) puts the view in a later chunk than
    the clicks — per-chunk sorting would reject them forever."""
    from cloud_volume_spark.streaming import streaming_funnel

    rows = [
        (1, "2024-01-01 00:20:00", 7, "click", 0.0, "{}"),
        (2, "2024-01-01 00:30:00", 7, "purchase", 0.0, "{}"),
        (3, "2024-01-01 00:10:00", 7, "view", 0.0, "{}"),
    ]
    d = tmp_path / "chunk_disorder"
    d.mkdir()
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(str(d / "b0"))

    prior = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = (
            spark.readStream
            .schema("event_id long, ts timestamp, user_id long, "
                    "event_type string, value double, props string")
            .parquet(str(d) + "/*")
        )
        q = (
            streaming_funnel(stream)
            .writeStream.format("memory").queryName("sfunnel3")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prior)
    got = spark.sql("select * from sfunnel3").toPandas()
    assert len(got) == 1
    assert int(got["funnel_depth"].iloc[0]) == 3


def test_streaming_funnel_equal_ts_ties_and_null_ts(spark, tmp_path):
    """Batch's >= comparisons admit a click AT the first-view instant
    and a purchase AT that click instant — the streaming sort must
    apply view before click before purchase on ties regardless of file
    order. NULL-ts rows are ignored like batch MIN/>= semantics."""
    from cloud_volume_spark.streaming import streaming_funnel

    rows = [
        # user 7: all three stages at the SAME instant, purchase first
        (1, "2024-01-01 00:10:00", 7, "purchase", 0.0, "{}"),
        (2, "2024-01-01 00:10:00", 7, "click", 0.0, "{}"),
        (3, "2024-01-01 00:10:00", 7, "view", 0.0, "{}"),
        # user 8: only a NULL-ts view -> no funnel row at all
        (4, None, 8, "view", 0.0, "{}"),
        # user 9: NULL-ts view ignored; real view later; click before it
        (5, None, 9, "view", 0.0, "{}"),
        (6, "2024-01-01 00:05:00", 9, "click", 0.0, "{}"),
        (7, "2024-01-01 00:10:00", 9, "view", 0.0, "{}"),
    ]
    d = tmp_path / "tie_null"
    d.mkdir()
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(str(d / "b0"))

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory").queryName("sfunnel4")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {int(r.user_id): r
           for _, r in spark.sql("select * from sfunnel4")
           .toPandas().iterrows()}
    assert set(got) == {7, 9}
    assert int(got[7]["funnel_depth"]) == 3
    # user 9: pre-view click never qualifies; depth stays 1
    assert int(got[9]["funnel_depth"]) == 1


def test_streaming_funnel_n_stage(spark, tmp_path):
    """The N-stage streaming state machine: a 4-stage funnel enforces
    the chain at every hop, matching the batch funnel() core."""
    from cloud_volume_spark.streaming import streaming_funnel

    rows = [
        # user 1 completes all four stages (file order scrambled)
        (1, "2024-01-01 00:40:00", 1, "purchase", 0.0, "{}"),
        (2, "2024-01-01 00:05:00", 1, "signup", 0.0, "{}"),
        (3, "2024-01-01 00:20:00", 1, "click", 0.0, "{}"),
        (4, "2024-01-01 00:10:00", 1, "view", 0.0, "{}"),
        # user 2 skips click: purchase cannot attach
        (5, "2024-01-01 00:05:00", 2, "signup", 0.0, "{}"),
        (6, "2024-01-01 00:10:00", 2, "view", 0.0, "{}"),
        (7, "2024-01-01 00:30:00", 2, "purchase", 0.0, "{}"),
    ]
    d = tmp_path / "nstage"
    d.mkdir()
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(str(d / "b0"))

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_funnel(stream, stages=("signup", "view", "click",
                                         "purchase"))
        .writeStream.format("memory").queryName("sfunnel5")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {int(r.user_id): r
           for _, r in spark.sql("select * from sfunnel5")
           .toPandas().iterrows()}
    assert int(got[1]["funnel_depth"]) == 4
    assert got[1]["signup_epoch"] is not None
    assert int(got[2]["funnel_depth"]) == 2
    import pandas as pd
    assert pd.isna(got[2]["click_epoch"])
    assert pd.isna(got[2]["purchase_epoch"])


def test_streaming_path_mine_matches_batch(spark, sf_dir, tmp_path):
    """Stateful n-gram emission over a time-ordered two-batch feed
    must reproduce the batch top_paths counts exactly — including
    trigrams whose first events landed in batch 0 and whose completer
    arrives in batch 1 (the saved-tail case)."""
    from cloud_volume_spark.operators.relational import top_paths
    from cloud_volume_spark.streaming import streaming_path_mine

    events = load(spark, sf_dir, "events")
    n = events.count()
    mid_ts = (events.select("ts").orderBy("ts").limit(n // 2)
              .agg(F.max("ts")).collect()[0][0])
    d = tmp_path / "paths_feed"
    d.mkdir()
    (events.where(F.col("ts") <= F.lit(mid_ts))
     .coalesce(1).write.parquet(str(d / "b0")))
    (events.where(F.col("ts") > F.lit(mid_ts))
     .coalesce(1).write.parquet(str(d / "b1")))

    ts_type = events.schema["ts"].dataType.simpleString()
    stream = (
        spark.readStream
        .schema(f"event_id long, ts {ts_type}, user_id long, "
                "event_type string, value double, props string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_path_mine(stream, n=3)
        .writeStream.format("memory").queryName("spaths")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select path, count(*) as n_paths from spaths "
                  "group by path order by n_paths desc, path limit 20")
        .toPandas()
    )
    batch = top_paths(events, n=3, k=20).toPandas()
    assert got["path"].tolist() == batch["path"].tolist()
    assert got["n_paths"].tolist() == batch["n_paths"].tolist()


def test_streaming_path_mine_tail_spans_batches(spark, tmp_path):
    """Planted cross-batch check: with (a,b) in batch 0 and (c) in
    batch 1, the a>b>c trigram is emitted by batch 1 off the saved
    2-slot tail; a second user's interleaved events never leak in, and
    NULL-ts rows are dropped."""
    from cloud_volume_spark.streaming import streaming_path_mine

    d = tmp_path / "span"
    d.mkdir()
    sch = ("event_id long, ts string, user_id long, "
           "event_type string, value double, props string")
    b0 = spark.createDataFrame([
        (1, "2024-01-01 00:01:00", 7, "a", 0.0, "{}"),
        (2, "2024-01-01 00:02:00", 7, "b", 0.0, "{}"),
        (3, "2024-01-01 00:01:30", 9, "z", 0.0, "{}"),
        (4, None, 7, "poison", 0.0, "{}"),
        (99, "2024-01-01 00:02:30", 7, None, 0.0, "{}"),
    ], sch).withColumn("ts", F.to_timestamp("ts"))
    b1 = spark.createDataFrame([
        (5, "2024-01-01 00:03:00", 7, "c", 0.0, "{}"),
        (6, "2024-01-01 00:04:00", 9, "z", 0.0, "{}"),
    ], sch).withColumn("ts", F.to_timestamp("ts"))
    b0.coalesce(1).write.parquet(str(d / "b0"))
    b1.coalesce(1).write.parquet(str(d / "b1"))

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_path_mine(stream, n=3)
        .writeStream.format("memory").queryName("spanpaths")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], r["path"])
           for r in spark.sql("select * from spanpaths").collect()}
    assert got == {(7, "a>b>c")}


def test_streaming_path_mine_null_key_group_survives(spark, tmp_path):
    """A NULL user_id event must not kill the stream (int(None) did):
    NULL keys group together and emit with a NULL key, exactly like a
    batch groupBy."""
    from cloud_volume_spark.streaming import streaming_path_mine

    d = tmp_path / "nullkey"
    d.mkdir()
    sch = ("event_id long, ts string, user_id long, "
           "event_type string, value double, props string")
    b0 = spark.createDataFrame([
        (1, "2024-01-01 00:01:00", None, "a", 0.0, "{}"),
        (2, "2024-01-01 00:02:00", None, "b", 0.0, "{}"),
        (3, "2024-01-01 00:03:00", None, "c", 0.0, "{}"),
        (4, "2024-01-01 00:01:00", 5, "x", 0.0, "{}"),
        (5, "2024-01-01 00:02:00", 5, "y", 0.0, "{}"),
        (6, "2024-01-01 00:03:00", 5, "z", 0.0, "{}"),
    ], sch).withColumn("ts", F.to_timestamp("ts"))
    b0.coalesce(1).write.parquet(str(d / "b0"))

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_path_mine(stream, n=3)
        .writeStream.format("memory").queryName("nullkeypaths")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], r["path"])
           for r in spark.sql("select * from nullkeypaths").collect()}
    assert got == {(None, "a>b>c"), (5, "x>y>z")}


def test_streaming_funnel_null_key_group_survives(spark, tmp_path):
    """Same NULL-key guard for the funnel: a NULL user_id view event
    emits a NULL-keyed depth-1 row instead of killing the stream."""
    from cloud_volume_spark.streaming import streaming_funnel

    d = tmp_path / "nullfunnel"
    d.mkdir()
    sch = ("event_id long, ts string, user_id long, "
           "event_type string, value double, props string")
    spark.createDataFrame([
        (1, "2024-01-01 00:01:00", None, "view", 0.0, "{}"),
        (2, "2024-01-01 00:02:00", 3, "view", 0.0, "{}"),
    ], sch).withColumn("ts", F.to_timestamp("ts")).coalesce(1)\
        .write.parquet(str(d / "b0"))

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory").queryName("nullfunnel")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r["funnel_depth"]
           for r in spark.sql("select * from nullfunnel").collect()}
    assert got == {None: 1, 3: 1}


def test_streaming_cdc_redact_dedup_pipeline(spark, sf_dir, tmp_path):
    """The composed CDC-to-curation pipeline the docstrings promise,
    in ONE streaming query: incoming-document stream → on-ingest PII
    redaction (text-preserving) → stream-static incremental dedup
    against the (equally redacted) standing corpus — availableNow ≡
    the batch composition (pii redaction then the registered
    dedup_incremental over the same redacted snapshot). A planted doc
    pair that differs ONLY inside email addresses is flagged by both
    paths BECAUSE redaction ran first — the raw-text batch dedup does
    not flag it — so the test pins the composition's semantics, not
    just its plumbing."""
    import pandas as pd

    from cloud_volume_spark.operators.corpus import redact_text_frame
    from cloud_volume_spark.operators.dedup import (
        INGEST_MOD, dedup_incremental,
    )
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_incremental_dedup,
        streaming_redact_text,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id", "text")
    # planted pair: minimal shared prose, five long pairwise-distinct
    # email addresses each — raw char-8 shingles barely overlap (so
    # the 4-band LSH cannot match them raw), redacted texts are
    # byte-identical
    prose = "cc: "
    mk = lambda names: prose + " ".join(
        f"{n}.vonhumboldt.{n}{i}@dept{i}.{n}corp.example.org"
        for i, n in enumerate(names))
    static_plant = (900001, mk(["alice", "bruno", "carol", "dmitri", "elena"]))
    stream_plant = (900010, mk(["frank", "grete", "henry", "ingrid", "jonas"]))
    assert stream_plant[0] % INGEST_MOD == 0
    assert static_plant[0] % INGEST_MOD != 0

    incoming = docs.where(F.col("doc_id") % INGEST_MOD == 0).unionAll(
        spark.createDataFrame([stream_plant], "doc_id long, text string"))
    static_docs = docs.where(F.col("doc_id") % INGEST_MOD != 0).unionAll(
        spark.createDataFrame([static_plant], "doc_id long, text string"))

    d = tmp_path / "cdc_stream"
    d.mkdir()
    incoming.toPandas().to_parquet(str(d / "part-0.parquet"))

    # ONE composed streaming query: read → redact → dedup
    stream = streaming_incremental_dedup(
        streaming_redact_text(read_documents_stream(spark, str(d))),
        redact_text_frame(static_docs),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("scdc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = set(r.doc_id
              for r in spark.sql("select doc_id from scdc").collect())

    # batch mirror: redact the SAME snapshot, write it as a documents
    # table, run the registered batch operator (explode-path
    # signatures — a genuinely different computation of the same
    # contract)
    mirror = tmp_path / "cdc_mirror"
    mirror.mkdir()
    redact_text_frame(incoming.unionAll(static_docs)).toPandas().to_parquet(
        str(mirror / "documents.parquet"))
    batch = dedup_incremental(spark, str(mirror)).toPandas()
    want = set(batch[batch["is_kept"] == 0]["doc_id"])
    assert got == want and len(want) > 0

    # the planted pair is flagged BECAUSE of redaction...
    assert stream_plant[0] in got
    dup_of = {r.doc_id: r.dup_of
              for r in spark.sql("select * from scdc").collect()}
    assert dup_of[stream_plant[0]] == static_plant[0]
    # ...and would NOT be flagged on the raw text
    raw_mirror = tmp_path / "cdc_mirror_raw"
    raw_mirror.mkdir()
    incoming.unionAll(static_docs).toPandas().to_parquet(
        str(raw_mirror / "documents.parquet"))
    raw = dedup_incremental(spark, str(raw_mirror)).toPandas()
    raw_flagged = set(raw[raw["is_kept"] == 0]["doc_id"])
    assert stream_plant[0] not in raw_flagged


def test_streaming_conversion_lag_matches_batch(spark, sf_dir, tmp_path):
    """The stateful on-arrival conversion emitter must produce exactly
    the rows of relational.conversion_lag_frame — one (user, day_idx,
    lag_s) per converting user, bit-equal lag seconds — across
    multiple micro-batches (per-key ts order held across files), with
    a tied-ts purchase matched exactly as the batch ts >= first_view
    filter does."""
    import pandas as pd

    from cloud_volume_spark.operators.relational import (
        conversion_lag_frame,
    )
    from cloud_volume_spark.streaming import (
        read_events_stream, streaming_conversion_lag,
    )

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # two arrival files split ON TIME (the contract: per-key ts
    # non-decreasing across micro-batches)
    cut = events.agg(
        F.expr("percentile_approx(unix_timestamp(ts), 0.5)")).collect()[0][0]
    d = tmp_path / "conv_stream"
    d.mkdir()
    epdf = events.toPandas()
    early = epdf[epdf["ts"].astype("int64") // 10**9 <= cut]
    late = epdf[epdf["ts"].astype("int64") // 10**9 > cut]
    early.to_parquet(str(d / "part-0.parquet"))
    late.to_parquet(str(d / "part-1.parquet"))

    # one file per trigger so the two arrival files really are two
    # micro-batches
    stream = streaming_conversion_lag(
        read_events_stream(spark, str(d), max_files_per_trigger=1))
    q = (
        stream.writeStream.format("memory")
        .queryName("sconv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.day_idx, r.lag_s)
        for r in spark.sql("select * from sconv").collect())
    want = sorted(
        (r.user_id, r.day_idx, r.lag_s)
        for r in conversion_lag_frame(events).collect())
    assert got == want and len(want) > 0


def test_streaming_conversion_lag_tied_ts_and_nulls(spark, tmp_path):
    """Planted edges: a purchase TIED on ts with the first view (and
    sorted before it by event_id) still converts — the batch filter is
    ts >= first_view, not arrival order; purchases before any view
    never convert; NULL user_id/ts/type rows are dropped; a user
    converts at most once."""
    import pandas as pd

    from cloud_volume_spark.operators.relational import (
        conversion_lag_frame,
    )
    from cloud_volume_spark.streaming import (
        read_events_stream, streaming_conversion_lag,
    )

    base = pd.Timestamp("2024-03-01 12:00:00")

    def row(eid, ts, uid, typ):
        return (eid, ts, uid, typ, 0.0, "{}")

    rows = [
        # user 1: purchase tied on ts with first view, smaller event_id
        row(1, base, 1, "purchase"),
        row(2, base, 1, "view"),
        # user 2: purchase strictly before view -> no conversion, then
        # a later purchase converts
        row(3, base, 2, "purchase"),
        row(4, base + pd.Timedelta(seconds=10), 2, "view"),
        row(5, base + pd.Timedelta(seconds=70), 2, "purchase"),
        # user 3: converts in file 1, second purchase in file 2 must
        # not re-emit
        row(6, base, 3, "view"),
        row(7, base + pd.Timedelta(seconds=5), 3, "purchase"),
        # NULL rows
        row(8, None, 1, "view"),
        row(9, base, None, "view"),
        row(10, base, 4, None),
        # user 5: TWO purchases in THIS file, the later tying on ts
        # with the view that only arrives in the NEXT file (legal
        # under non-decreasing per-key ts) — the pending-purchase
        # scalar must keep the LATEST pre-view purchase (the earlier
        # one is strictly below any future view's ts and can never
        # qualify) and convert on the tie
        row(12, base + pd.Timedelta(minutes=30), 5, "purchase"),
        row(14, base + pd.Timedelta(hours=1), 5, "purchase"),
    ]
    later = [
        row(11, base + pd.Timedelta(hours=1), 3, "purchase"),
        row(13, base + pd.Timedelta(hours=1), 5, "view"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def frame(rws):
        df = pd.DataFrame(rws, columns=cols)
        # None in an int column must stay int64-with-null in parquet
        # (a float64 user_id would mismatch the probed stream schema)
        df["event_id"] = df["event_id"].astype("Int64")
        df["user_id"] = df["user_id"].astype("Int64")
        # NaT-capable MICROSECOND timestamps: parquet ns-precision
        # reads back as bigint on the Spark side
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        return df

    d = tmp_path / "conv_edges"
    d.mkdir()
    frame(rows).to_parquet(str(d / "p0.parquet"))
    frame(later).to_parquet(str(d / "p1.parquet"))

    # ONE FILE PER TRIGGER: the default 8 would fold both files into
    # a single micro-batch under availableNow and the cross-batch
    # state path would never run — the whole point of the planted
    # user-5 case
    stream = streaming_conversion_lag(
        read_events_stream(spark, str(d), max_files_per_trigger=1))
    q = (stream.writeStream.format("memory").queryName("sconv2")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.user_id, r.day_idx, r.lag_s)
                 for r in spark.sql("select * from sconv2").collect())
    events = spark.read.parquet(str(d))
    want = sorted((r.user_id, r.day_idx, r.lag_s)
                  for r in conversion_lag_frame(events).collect())
    assert got == want
    by_user = {u: (dy, lg) for u, dy, lg in got}
    assert by_user[1][1] == 0      # tied-ts conversion, lag 0
    assert by_user[2][1] == 60     # only the post-view purchase counts
    assert by_user[3][1] == 5      # first conversion only, once
    assert by_user[5][1] == 0      # cross-batch tie converts
    assert set(by_user) == {1, 2, 3, 5}


def test_streaming_source_mixture_matches_batch(spark, sf_dir, tmp_path):
    """The mixture-drift monitor: per-(source, lang) streaming state
    after the backlog drains must equal the batch lang_count_frame
    rows exactly, and the mixture readout derived from the sink table
    (mixture_from_lang_counts — the SAME fragment the batch operator
    uses) must equal the registered source_mixture_stats output. The
    backlog is staged as 16 files so the aggregate genuinely updates
    across micro-batches (maxFilesPerTrigger=8 → ≥2 triggers)."""
    from cloud_volume_spark.operators.text import (
        mixture_from_lang_counts, source_mixture_stats,
    )
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_source_mixture,
    )

    d = tmp_path / "docs_mixstream"
    (load(spark, sf_dir, "documents")
     .repartition(16)
     .write.parquet(str(d)))
    stream = streaming_source_mixture(read_documents_stream(spark, str(d)))
    q = (
        stream.writeStream.format("memory")
        .queryName("smix")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 1, "expected >= 2 micro-batches"

    # pin the memory-sink view: mixture_from_lang_counts self-joins
    # its input, and Spark's attribute dedup refuses to resolve a
    # self-joined MemoryPlan
    state = spark.sql("select * from smix").localCheckpoint(eager=True)
    got_state = {tuple(r) for r in state.collect()}
    from cloud_volume_spark.operators.text import lang_count_frame
    want_state = {tuple(r) for r in
                  lang_count_frame(load(spark, sf_dir, "documents"))
                  .collect()}
    assert got_state == want_state and len(got_state) > 0

    got = {tuple(r) for r in mixture_from_lang_counts(state).collect()}
    want = {tuple(r) for r in
            source_mixture_stats(spark, sf_dir).collect()}
    assert got == want


def test_streaming_lsh_index_dedup_matches_batch(spark, sf_dir, tmp_path):
    """The persisted-index streaming twin: a two-file arrival of the
    incoming batch joined against the ON-DISK band table must flag
    exactly the docs the batch dedup_incremental marks as duplicates
    (cross-batch dropDuplicates state exercised by the split)."""
    from cloud_volume_spark.lsh_index import build_lsh_index
    from cloud_volume_spark.operators.dedup import (
        INGEST_MOD, dedup_incremental,
    )
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_lsh_index_dedup,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d = tmp_path / "lsh_stream"
    d.mkdir()
    incoming = docs.where(F.col("doc_id") % INGEST_MOD == 0).toPandas()
    half = len(incoming) // 2
    incoming.iloc[:half].to_parquet(str(d / "part-0.parquet"))
    incoming.iloc[half:].to_parquet(str(d / "part-1.parquet"))
    idx = build_lsh_index(
        docs.where(F.col("doc_id") % INGEST_MOD != 0)
        .select("doc_id", "text"),
        str(tmp_path / "lshidx"))

    stream = streaming_lsh_index_dedup(
        read_documents_stream(spark, str(d)), idx)
    q = (
        stream.writeStream.format("memory")
        .queryName("slshdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = set(
        r.doc_id for r in spark.sql("select doc_id from slshdedup").collect()
    )
    batch = dedup_incremental(spark, sf_dir).toPandas()
    want = set(batch[batch["is_kept"] == 0]["doc_id"])
    assert got == want and len(want) > 0
    # every emitted dup_of is a genuinely indexed corpus doc
    dup_of = set(
        r.dup_of for r in spark.sql("select dup_of from slshdedup").collect()
    )
    indexed = set(r.doc_id for r in idx.indexed_ids().collect())
    assert dup_of <= indexed


def test_streaming_ivf_semantic_dedup_matches_batch(spark, sf_dir,
                                                    tmp_path):
    """The persisted-IVF streaming twin: a two-file arrival of
    incoming vectors, each checked against its assigned cluster's
    ON-DISK inverted list, must flag exactly the vectors a batch
    assignment (shared rank_centroids contract) + cluster-bounded
    cosine join flags — and every dup_of must be an indexed vector."""
    from cloud_volume_spark.ann_index import build_ivf_index
    from cloud_volume_spark.operators.dedup import INGEST_MOD
    from cloud_volume_spark.operators.similarity import (
        _as_double, _dot, _with_norm, rank_centroids,
    )
    from cloud_volume_spark.streaming import streaming_ivf_semantic_dedup

    T = 0.3  # the cross-split same-cluster cosine tops out at ~0.43
    # on this corpus, so the gate threshold must sit inside the
    # distribution for a non-empty contract check
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") % INGEST_MOD != 0)
    incoming = emb.where(F.col("vec_id") % INGEST_MOD == 0)
    idx = build_ivf_index(corpus, str(tmp_path / "ivfsem"), nlist=4,
                          centroid_base_id=101, centroids="kmeans",
                          kmeans_rounds=2)

    d = tmp_path / "emb_stream"
    d.mkdir()
    pdf = incoming.toPandas()
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(str(d / "part-0.parquet"))
    pdf.iloc[half:].to_parquet(str(d / "part-1.parquet"))
    schema = spark.read.parquet(str(d)).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))

    q = (streaming_ivf_semantic_dedup(stream, idx, threshold=T)
         .writeStream.format("memory").queryName("sivfsem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = set(r.vec_id for r in
              spark.sql("select vec_id from sivfsem").collect())

    qb = _with_norm(incoming.select(
        "vec_id", _as_double("embedding").alias("embedding")))
    assign = (rank_centroids(qb, idx.centroids())
              .where(F.col("crnk") == 1)
              .select("vec_id", "embedding", "nrm", "cent_id"))
    lists = idx.lists().select(
        F.col("vec_id").alias("dup_of"),
        F.col("embedding").alias("ie"), F.col("nrm").alias("inrm"),
        "cent_id")
    sim = F.round(_dot(F.col("embedding"), F.col("ie"))
                  / (F.col("nrm") * F.col("inrm")), 6)
    want = set(r.vec_id for r in
               assign.join(lists, "cent_id")
               .where(F.col("vec_id") != F.col("dup_of"))
               .where(sim >= T)
               .select("vec_id").distinct().collect())
    assert got == want and len(want) > 0
    dup_of = set(r.dup_of for r in
                 spark.sql("select dup_of from sivfsem").collect())
    indexed = set(r.vec_id for r in
                  idx.lists().select("vec_id").collect())
    assert dup_of <= indexed


def test_streaming_ingest_gate_matches_batch_composition(spark, sf_dir,
                                                         tmp_path):
    """The cross-modal exclusion stream: quality ∨ text-dup ∨
    semantic-dup reasons over a two-file document arrival must equal
    the batch composition of the three rules on the same split — and
    the whole gate runs as ONE streaming query (single terminal
    dedup, no stream-stream join)."""
    from cloud_volume_spark.ann_index import build_ivf_index
    from cloud_volume_spark.lsh_index import build_lsh_index
    from cloud_volume_spark.operators.dedup import (
        INGEST_MOD, band_frame, signature_frame_maponly,
    )
    from cloud_volume_spark.operators.similarity import (
        _as_double, _dot, _with_norm, rank_centroids,
    )
    from cloud_volume_spark.operators.text import quality_filter_frame
    from cloud_volume_spark.streaming import (
        read_documents_stream, streaming_ingest_gate,
    )

    T = 0.3
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    corpus_docs = docs.where(F.col("doc_id") % INGEST_MOD != 0)
    incoming = docs.where(F.col("doc_id") % INGEST_MOD == 0)
    lsh = build_lsh_index(corpus_docs.select("doc_id", "text"),
                          str(tmp_path / "glsh"))
    ivf = build_ivf_index(emb.where(F.col("vec_id") % INGEST_MOD != 0),
                          str(tmp_path / "givf"), nlist=4,
                          centroid_base_id=101, centroids="kmeans",
                          kmeans_rounds=2)

    d = tmp_path / "gate_stream"
    d.mkdir()
    pdf = incoming.toPandas()
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(str(d / "part-0.parquet"))
    pdf.iloc[half:].to_parquet(str(d / "part-1.parquet"))

    q = (streaming_ingest_gate(
            read_documents_stream(spark, str(d)), lsh, ivf, emb,
            threshold=T)
         .writeStream.format("memory").queryName("singest")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = set((r.doc_id, r.reason) for r in
              spark.sql("select * from singest").collect())

    want = set()
    for r in (quality_filter_frame(incoming)
              .where(F.col("passes") == 0).select("doc_id").collect()):
        want.add((r.doc_id, "quality"))
    inc_bands = band_frame(signature_frame_maponly(incoming))
    cor_bands = band_frame(signature_frame_maponly(
        corpus_docs.select("doc_id", "text"))).select(
        F.col("doc_id").alias("dup_of"), "band", "band_hash")
    for r in (inc_bands.join(cor_bands, ["band", "band_hash"])
              .select("doc_id").distinct().collect()):
        want.add((r.doc_id, "text_dup"))
    inc_vec = emb.join(
        incoming.select(F.col("doc_id").alias("vec_id")), "vec_id")
    qb = _with_norm(inc_vec.select(
        "vec_id", _as_double("embedding").alias("embedding")))
    assign = (rank_centroids(qb, ivf.centroids())
              .where(F.col("crnk") == 1)
              .select("vec_id", "embedding", "nrm", "cent_id"))
    lists = ivf.lists().select(
        F.col("vec_id").alias("dup_of"),
        F.col("embedding").alias("ie"), F.col("nrm").alias("inrm"),
        "cent_id")
    sim = F.round(_dot(F.col("embedding"), F.col("ie"))
                  / (F.col("nrm") * F.col("inrm")), 6)
    for r in (assign.join(lists, "cent_id")
              .where(F.col("vec_id") != F.col("dup_of"))
              .where(sim >= T)
              .select("vec_id").distinct().collect()):
        want.add((r.vec_id, "semantic_dup"))
    assert got == want
    # every rule contributes at least one exclusion on this corpus
    assert {reason for _, reason in want} == {
        "quality", "text_dup", "semantic_dup"}
