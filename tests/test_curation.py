"""Behavioral tests for the curation operators (beyond the duckdb
oracle parity in test_oracle_parity.py): semantic invariants verified
against independent numpy recomputation on the sf0.001 tables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cloud_volume_spark.operators.curation import (
    BOILER_NGRAM,
    MIX_BUDGET_DEN,
    MIX_DEFAULT_W,
    MIX_WEIGHTS,
    boilerplate_ngrams,
    doc_entropy,
    mixture_sample,
    token_bucket_stats,
)
from cloud_volume_spark.operators.similarity import (
    SEMDEDUP_NLIST,
    SEMDEDUP_T,
    semantic_dedup,
)


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_doc_entropy_matches_numpy(spark, sf_dir):
    out = doc_entropy(spark, sf_dir).toPandas().set_index("doc_id")
    docs = _docs(spark, sf_dir)
    for _, row in docs.head(50).iterrows():
        toks = row["text"].strip().split(" ")
        vals, counts = np.unique(toks, return_counts=True)
        p = counts / counts.sum()
        h = -(p * np.log(p)).sum()
        got = out.loc[row["doc_id"]]
        assert got["n_tokens"] == len(toks)
        assert got["n_distinct"] == len(vals)
        assert abs(got["entropy_e4"] - round(h * 10000)) <= 1
    # low-entropy detector sanity: entropy <= ln(n_distinct)
    assert (
        out["entropy_e4"] <= np.log(out["n_distinct"]) * 10000 + 1
    ).all()


def test_token_bucket_stats_partitions_corpus(spark, sf_dir):
    out = token_bucket_stats(spark, sf_dir).toPandas()
    docs = _docs(spark, sf_dir)
    assert out["n_docs"].sum() == len(docs)
    n_tokens = docs["text"].str.strip().str.split(" ").str.len()
    assert out["sum_tokens"].sum() == n_tokens.sum()
    assert out["sum_chars"].sum() == docs["n_chars"].sum()
    # buckets honor their boundaries
    for _, row in out.iterrows():
        name = row["bucket"]
        if name.startswith("lt"):
            assert row["max_tokens"] < int(name[2:])
        else:
            assert row["min_tokens"] >= int(name[2:])


def test_mixture_sample_rates_follow_weights(spark, sf_dir):
    sel = mixture_sample(spark, sf_dir).toPandas()
    docs = _docs(spark, sf_dir)
    counts = docs.groupby("source").size()
    picked = sel.groupby("source").size().reindex(counts.index).fillna(0)
    # thresholds monotone in weight: heavier sources keep a larger share
    thresh = sel.groupby("source")["t_hex"].first()
    w = {s: MIX_WEIGHTS.get(s, MIX_DEFAULT_W) for s in counts.index}
    for a in counts.index:
        for b in counts.index:
            if w[a] > w[b] and a in thresh.index and b in thresh.index:
                assert thresh[a] >= thresh[b]
    # each source's realized rate is within 3 sigma of t_s/256
    n_total = len(docs)
    w_total = sum(w[s] for s in counts.index)
    for s in counts.index:
        t = min(255, (256 * w[s] * n_total) // (MIX_BUDGET_DEN * w_total * counts[s]))
        rate = t / 256
        sigma = np.sqrt(max(rate * (1 - rate) * counts[s], 1.0))
        assert abs(picked[s] - rate * counts[s]) <= 3 * sigma + 1


def test_mixture_sample_is_deterministic(spark, sf_dir):
    a = mixture_sample(spark, sf_dir).toPandas().sort_values("doc_id")
    b = mixture_sample(spark, sf_dir).toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_boilerplate_ngrams_invariants(spark, sf_dir):
    out = boilerplate_ngrams(spark, sf_dir).toPandas()
    docs = _docs(spark, sf_dir)
    assert len(out) == len(docs)
    assert (out["n_boiler"] <= out["n_grams"]).all()
    assert out["boiler_bp"].between(0, 10000).all()
    # independent recomputation of the boilerplate gram set
    grams = {}
    for _, row in docs.iterrows():
        toks = row["text"].strip().split(" ")
        gs = {
            " ".join(toks[i : i + BOILER_NGRAM])
            for i in range(max(len(toks) - BOILER_NGRAM + 1, 0))
        }
        for g in gs:
            grams.setdefault(g, set()).add(row["doc_id"])
    boiler = {g for g, ids in grams.items() if len(ids) >= 2}
    exp = {}
    for _, row in docs.iterrows():
        toks = row["text"].strip().split(" ")
        n = max(len(toks) - BOILER_NGRAM + 1, 0)
        nb = sum(
            1
            for i in range(n)
            if " ".join(toks[i : i + BOILER_NGRAM]) in boiler
        )
        exp[row["doc_id"]] = (n, nb)
    got = out.set_index("doc_id")
    for doc_id, (n, nb) in exp.items():
        assert got.loc[doc_id, "n_grams"] == n
        assert got.loc[doc_id, "n_boiler"] == nb


def test_semantic_dedup_matches_numpy(spark, sf_dir):
    out = (
        semantic_dedup(spark, sf_dir)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    cmask = (ids >= 100) & (ids < 100 + SEMDEDUP_NLIST)
    cents = vecs[cmask]
    cent_ids = ids[cmask]
    nrm = np.linalg.norm(vecs, axis=1)
    cnrm = np.linalg.norm(cents, axis=1)
    sims = np.round(vecs @ cents.T / np.outer(nrm, cnrm), 6)
    # argmax with cent_id asc tie-break: stable argmax over -sims
    best = np.argmax(sims, axis=1)
    assign = cent_ids[best]
    got_assign = out.set_index("vec_id")["cent_id"]
    assert (got_assign.loc[ids].to_numpy() == assign).all()
    # keep decision: dropped iff a lower-id same-cluster mate with sim >= T
    full = np.round(vecs @ vecs.T / np.outer(nrm, nrm), 6)
    for i, vid in enumerate(ids):
        mates = np.where((assign == assign[i]) & (ids < vid))[0]
        n_dups = int((full[i, mates] >= SEMDEDUP_T).sum())
        assert out.set_index("vec_id").loc[vid, "n_dups"] == n_dups
        assert out.set_index("vec_id").loc[vid, "is_kept"] == int(n_dups == 0)


def test_semantic_dedup_keeps_at_least_one_per_cluster(spark, sf_dir):
    out = semantic_dedup(spark, sf_dir).toPandas()
    kept = out.groupby("cent_id")["is_kept"].sum()
    assert (kept >= 1).all()
    # the minimum id in every cluster is always kept
    min_ids = out.groupby("cent_id")["vec_id"].min()
    m = out.set_index("vec_id")
    for vid in min_ids:
        assert m.loc[vid, "is_kept"] == 1


def test_doc_perplexity_matches_numpy(spark, sf_dir):
    from collections import Counter

    from cloud_volume_spark.operators.curation import doc_perplexity

    out = doc_perplexity(spark, sf_dir).toPandas().set_index("doc_id")
    docs = _docs(spark, sf_dir)
    vocab = Counter()
    for t in docs["text"]:
        vocab.update(t.strip().split(" "))
    n_total = sum(vocab.values())
    for _, row in docs.head(40).iterrows():
        toks = row["text"].strip().split(" ")
        nll = -np.mean([np.log(vocab[t] / n_total) for t in toks])
        got = out.loc[row["doc_id"]]
        assert got["n_tokens"] == len(toks)
        assert abs(got["nll_e4"] - np.floor(nll * 10000 + 0.5)) <= 1


def test_dedup_incremental_planted(spark, tmp_path):
    """An incoming doc that duplicates an existing doc must be flagged
    with that doc as dup_of; a unique incoming doc must be kept."""
    import pandas as pd

    from cloud_volume_spark.operators.dedup import dedup_incremental

    # per-doc disjoint vocabularies so only the planted pair collides
    texts = {
        i: " ".join(f"w{i}x{j}" for j in range(40)) for i in range(20)
    }
    texts[10] = texts[7]          # incoming dup of existing doc 7
    pdf = pd.DataFrame({
        "doc_id": list(range(20)),
        "text": [texts[i] for i in range(20)],
        "lang": ["en"] * 20,
        "source": ["src0"] * 20,
        "n_chars": [len(texts[i]) for i in range(20)],
    })
    d = tmp_path / "inc"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    out = dedup_incremental(spark, str(d)).toPandas().set_index("doc_id")
    assert set(out.index) == {0, 10}
    assert out.loc[10, "dup_of"] == 7
    assert out.loc[10, "is_kept"] == 0
    assert out.loc[0, "is_kept"] == 1 and out.loc[0, "dup_of"] == -1


def test_line_dedup_planted(spark, tmp_path):
    """Global first-occurrence semantics: a segment repeated across
    (and within) documents is kept exactly once, at the smallest
    (doc_id, seg_no); unique segments all survive."""
    from cloud_volume_spark.operators.curation import LINE_W, line_dedup

    seg_a = " ".join(f"a{j}" for j in range(LINE_W))   # repeated segment
    uniq = lambda d, s: " ".join(f"u{d}x{s}y{j}" for j in range(LINE_W))
    texts = {
        0: " ".join([seg_a, uniq(0, 1), seg_a]),       # dup within doc 0
        1: " ".join([uniq(1, 0), seg_a]),              # dup across docs
        2: " ".join([uniq(2, 0), uniq(2, 1)]),         # fully unique
    }
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [texts[i] for i in range(3)],
        "lang": ["en"] * 3,
        "source": ["src0"] * 3,
        "n_chars": [len(texts[i]) for i in range(3)],
    })
    d = tmp_path / "lines"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    out = line_dedup(spark, str(d)).toPandas().set_index("doc_id")
    # doc 0: segs [A, u, A] -> first A kept, second dropped
    assert out.loc[0, "n_segs"] == 3 and out.loc[0, "n_kept"] == 2
    # doc 1: its A occurrence is not the global first -> dropped
    assert out.loc[1, "n_segs"] == 2 and out.loc[1, "n_kept"] == 1
    assert out.loc[2, "n_kept"] == out.loc[2, "n_segs"] == 2
    assert out.loc[2, "kept_bp"] == 10000


def test_repeated_spans_planted(spark, tmp_path):
    """A known repeated substring yields exactly one span with the
    right token coverage; unique docs report zero spans; within-doc
    repetition counts too (the gram occurs twice globally)."""
    from cloud_volume_spark.operators.curation import SPAN_L, repeated_spans

    rep = " ".join(f"r{j}" for j in range(SPAN_L + 2))   # 7-token phrase
    uniq = lambda d, k: " ".join(f"u{d}x{k}y{j}" for j in range(6))
    texts = {
        0: " ".join([uniq(0, 0), rep, uniq(0, 1)]),      # shares rep with 1
        1: " ".join([rep, uniq(1, 0)]),
        2: " ".join([uniq(2, 0), uniq(2, 1)]),           # fully unique
        3: " ".join([rep, uniq(3, 0), rep]),             # within-doc too
    }
    pdf = pd.DataFrame({
        "doc_id": list(texts), "text": [texts[i] for i in texts],
        "lang": ["en"] * 4, "source": ["src0"] * 4,
        "n_chars": [len(texts[i]) for i in texts],
    })
    d = tmp_path / "spans"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    out = repeated_spans(spark, str(d)).toPandas().set_index("doc_id")
    # the 7-token phrase has 3 grams of width 5 -> one span of 7 tokens
    assert out.loc[0, "n_spans"] == 1 and out.loc[0, "covered"] == SPAN_L + 2
    assert out.loc[1, "n_spans"] == 1 and out.loc[1, "covered"] == SPAN_L + 2
    assert out.loc[2, "n_spans"] == 0 and out.loc[2, "covered_bp"] == 0
    assert out.loc[3, "n_spans"] == 2 and out.loc[3, "covered"] == 2 * (SPAN_L + 2)


def test_line_dedup_attribution_at_colliding_coords(spark):
    """First-occurrence attribution is lexicographic over
    (doc_id, seg_no) — exercised at planted coordinates where the old
    r6 arithmetic key ``doc_id*1e6+seg_no`` collided: (doc 0,
    seg 5_000_000) and (doc 5, seg 0) both encoded 5_000_000, so BOTH
    rows compared equal to the MIN and were double-counted as kept."""
    from cloud_volume_spark.operators.curation import _line_dedup_from_segs

    segs = spark.createDataFrame(
        [
            (0, 5_000_000, "S"),   # global first occurrence of S
            (5, 0, "S"),           # old okey also 5_000_000 -> collided
            (0, 0, "U0"),          # unique filler so doc 0 has 2 segs
            (5, 1, "U5"),
        ],
        "doc_id bigint, seg_no int, seg_hash string",
    )
    out = {r.doc_id: r for r in _line_dedup_from_segs(segs).collect()}
    assert out[0].n_segs == 2 and out[0].n_kept == 2
    # doc 5's S is NOT the global first -> dropped (old key kept it)
    assert out[5].n_segs == 2 and out[5].n_kept == 1
    # snowflake-scale doc_id: the old key overflowed bigint here
    segs2 = spark.createDataFrame(
        [(9_300_000_000_000, 0, "X"), (9_300_000_000_001, 0, "X")],
        "doc_id bigint, seg_no int, seg_hash string",
    )
    out2 = {r.doc_id: r for r in _line_dedup_from_segs(segs2).collect()}
    assert out2[9_300_000_000_000].n_kept == 1
    assert out2[9_300_000_000_001].n_kept == 0


def test_shuffle_key_collision_free_200k(spark, tmp_path):
    """The 60-bit (15-nibble) shuffle key is collision-free at 200k
    docs (the r6 32-bit key birthday-collided from ~80k), the key
    equals int(md5('shuf|'||id)[:15], 16), and the positions are an
    exact permutation of 1..N."""
    import hashlib

    from cloud_volume_spark.operators.curation import (
        SHUFFLE_NIBBLES, corpus_shuffle_order,
    )

    n = 200_000
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "text": "t",
        "lang": "en",
        "source": "src0",
        "n_chars": 1,
    })
    d = tmp_path / "shuf200k"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    out = corpus_shuffle_order(spark, str(d))
    agg = out.agg(
        F.countDistinct("shuffle_key").alias("dk"),
        F.countDistinct("shuffle_pos").alias("dp"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg.n == n
    assert agg.dk == n, "shuffle_key collided below 200k docs"
    assert agg.dp == n and agg.lo == 1 and agg.hi == n
    # spot-check the Horner chain against hashlib on a few ids
    got = {r.doc_id: r.shuffle_key
           for r in out.where(F.col("doc_id") < 3).collect()}
    for i in range(3):
        h = hashlib.md5(f"shuf|{i}".encode()).hexdigest()
        assert got[i] == int(h[:SHUFFLE_NIBBLES], 16)


def test_rolling_gram_key_properties(spark):
    """The _rolling_gram 64-bit key must be position-invariant (the
    same 5 tokens anywhere in any doc → the same key — what makes
    cross-document matching work), order-sensitive, and
    token-sensitive."""
    from cloud_volume_spark.operators.curation import _rolling_gram

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),                  # the window itself
            (2, "x y a b c d e z"),            # same window, offset 2
            (3, "b a c d e"),                  # first two swapped
            (4, "a b c d f"),                  # last token changed
            (5, "a a a a a"),                  # degenerate repeat
            (6, "a a a a a a"),                # two overlapping repeats
        ],
        schema="doc_id long, text string",
    )
    h, idxs, gram = _rolling_gram(5)
    from pyspark.sql import functions as F
    rows = (
        docs.select("doc_id", h.alias("_th"), idxs.alias("_idxs"))
        .select("doc_id",
                F.posexplode(F.transform("_idxs", gram)).alias("pos", "k"))
        .collect()
    )
    keys = {}
    for r in rows:
        keys.setdefault(r.doc_id, {})[r.pos] = r.k
    # position-invariance: doc 2's window at offset 2 equals doc 1's
    assert keys[2][2] == keys[1][0]
    # order- and token-sensitivity
    assert keys[3][0] != keys[1][0]
    assert keys[4][0] != keys[1][0]
    # overlapping identical windows inside one doc agree
    assert keys[6][0] == keys[6][1] == keys[5][0]
    # a doc shorter than the width produces no grams (guarded sequence)
    short = spark.createDataFrame(
        [(7, "a b")], schema="doc_id long, text string")
    n = (
        short.select(h.alias("_th"), idxs.alias("_idxs"))
        .select(F.explode(F.transform("_idxs", gram)))
        .count()
    )
    assert n == 0
