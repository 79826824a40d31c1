"""10x-scale spot-bench: validate SCALE.md's linearity claims empirically.

No sf1 dataset ships in the container, so this script synthesizes one:
each of 10 replicas of the sf0.1 ``documents``/``embeddings`` tables is
DECORRELATED from the others (per-replica vowel rotation of content,
per-replica cyclic rotation of embedding vectors) so the near-dup /
LSH cluster structure of the original corpus is preserved WITHIN each
replica but not duplicated ACROSS replicas — output sizes should then
scale ~linearly with input, which is exactly the property the 100 TB
notes claim for the banded/bucketed plans.  (Naive replication would
make every doc a 10-clique of near-duplicates and force quadratic
pair growth — a different workload, not a scale test.)

Usage:  python scripts/bench_scale.py [--replicas 10] [--queries q1,q2]
Writes one JSON line per (query, scale) to stdout and a summary table.
Run it alone on the host (same rule as bench.py: no concurrent JVMs).

``--volume`` runs the VOLUMETRIC scale leg instead: the bench.py
segmentation geometry (1024x1024 uint16, gzip) at z=100/200/400
(210/420/840 MB logical — 2x/4x the bench volume, 2x/4x the slab
count), timing write / full-volume cutout / unique / downsample at
each size.  Linear time-vs-size ratios validate the slab+manifest
design the way the query leg validates the banded/bucketed plans.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the 6 most expensive queries of BENCH_r07 — the ones whose scale
# behavior the round-7 verdict asked to validate empirically
DEFAULT_QUERIES = [
    "embedding_kmeans",
    "dedup_clusters",
    "embedding_neardup_pairs",
    "dedup_incremental",
    "minhash_lsh_pairs",
    "repeated_spans",
]

# 10-char translate alphabet: rotations r=0..9 are pairwise DISTINCT
# (a 5-vowel alphabet would repeat at r=5, handing replicas 5-9 content
# byte-identical to replicas 0-4 — exactly the naive-replication
# artifact this script exists to avoid)
VOWS = "aeiousrtln"



def symlink_through(src_dir: str, out_dir: str, tables) -> None:
    """Link the tables these queries don't replicate so query loaders
    that resolve paths eagerly still find every table."""
    for t in tables:
        src = f"{src_dir}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def ensure_scaled(spark, src_dir: str, out_dir: str, replicas: int,
                  builder, what: str) -> None:
    """Build the scaled dir unless a completion marker proves the same
    (replicas, src) pair built it: a stale dir from a different
    --replicas, a DIFFERENT source dataset (SPARK_GRAFT_SF_DIR moved),
    or a crash between table writes must be rebuilt, not silently
    reused — cross-dataset base-vs-scaled ratios are meaningless."""
    marker = f"{out_dir}/_SCALE.json"
    fresh = False
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        fresh = (m.get("replicas") == replicas
                 and m.get("src") == os.path.abspath(src_dir))
    if not fresh:
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        builder(spark, src_dir, out_dir, replicas)
        with open(marker, "w") as f:
            json.dump({"replicas": replicas,
                       "src": os.path.abspath(src_dir)}, f)
        print(f"# synthesized {replicas}x {what} in "
              f"{time.monotonic() - t0:.1f}s", flush=True)


def make_scaled(spark, src_dir: str, out_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    embs = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    ndoc = docs.count()
    nvec = embs.count()
    dim = len(embs.select("embedding").first()[0])

    doc_parts = []
    emb_parts = []
    for r in range(replicas):
        k = r % len(VOWS)
        rot = VOWS[k:] + VOWS[:k]
        d = docs
        if r > 0:
            # decorrelate content across replicas, preserve within-
            # replica dup/near-dup structure and token statistics
            d = d.withColumn("text", F.translate("text", VOWS, rot))
        doc_parts.append(
            d.withColumn("doc_id", (F.col("doc_id") + F.lit(r * ndoc)).cast("long"))
        )
        e = embs
        if r > 0:
            k = 1 + (r % (dim - 1))
            # cyclic rotation: preserves norms + within-replica geometry,
            # decorrelates across replicas
            e = e.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", k + 1, dim - k),
                    F.slice("embedding", 1, k),
                ),
            )
        emb_parts.append(
            e.withColumn("vec_id", (F.col("vec_id") + F.lit(r * nvec)).cast("long"))
        )

    out_docs = doc_parts[0]
    for p in doc_parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_embs = emb_parts[0]
    for p in emb_parts[1:]:
        out_embs = out_embs.unionByName(p)

    out_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet")
    out_embs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet")
    symlink_through(src_dir, out_dir,
                    ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events"))


EVENT_QUERIES = [
    "events_funnel",
    "events_cohort_retention",
    "event_props_extract",
    "events_sessionize",
    "events_running_total",
    "events_top_paths",
    "events_conversion_lag",
]


def make_scaled_events(spark, src_dir: str, out_dir: str,
                       replicas: int) -> None:
    """Replicate the events table with per-replica user_id/event_id
    offsets: users are DISJOINT across replicas, so the per-user state
    and aggregation cardinality the event operators shuffle on grows
    linearly with the data — naive replication would instead deepen
    every user's history 10x (denser per-key groups, same key count),
    a different workload than more users."""
    from pyspark.sql import functions as F

    from cloud_volume_spark.operators.common import load

    ev = load(spark, src_dir, "events")  # handles TIMESTAMP(NANOS)
    parts = []
    for r in range(replicas):
        parts.append(ev.select(
            (F.col("event_id") + F.lit(r * 10 ** 12)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(r * 10 ** 9)).alias("user_id"),
            "event_type", "value", "props",
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet")
    symlink_through(src_dir, out_dir,
                    ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "documents", "embeddings"))


TPCH_QUERIES = [
    "q4_order_priority",
    "q21_suppliers_waiting",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
    "q22_global_sales_opportunity",
    "q16_parts_supplier_relationship",
    "q9_product_type_profit",
    "q12_shipmode_priority",
]


def make_scaled_tpch(spark, src_dir: str, out_dir: str,
                     replicas: int) -> None:
    """Replicate orders + lineitem with per-replica o_orderkey /
    l_orderkey offsets: ORDERS are disjoint across replicas (the
    semi/anti joins and per-order groups that Q4/Q21 shuffle on grow
    linearly), while customer/supplier keys repeat — each customer and
    supplier simply carries 10x the history, which is exactly how a
    fact table outgrows its dimensions at constant dimension
    cardinality."""
    from pyspark.sql import functions as F

    from cloud_volume_spark.operators.common import load

    orders = load(spark, src_dir, "orders")
    li = load(spark, src_dir, "lineitem")
    o_parts, l_parts = [], []
    for r in range(replicas):
        off = F.lit(r * 10 ** 12)
        o_parts.append(orders.withColumn(
            "o_orderkey", (F.col("o_orderkey") + off).cast("long")))
        l_parts.append(li.withColumn(
            "l_orderkey", (F.col("l_orderkey") + off).cast("long")))
    out_o, out_l = o_parts[0], l_parts[0]
    for p in o_parts[1:]:
        out_o = out_o.unionByName(p)
    for p in l_parts[1:]:
        out_l = out_l.unionByName(p)
    out_o.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet")
    out_l.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet")
    symlink_through(src_dir, out_dir,
                    ("region", "nation", "customer", "supplier", "part",
                     "events", "documents", "embeddings"))


def bench_volume_scale(spark, zs=(100, 200, 400)) -> dict:
    """Write → read → unique → downsample a segmentation volume at
    increasing z-extent (constant chunk size, so slab/manifest counts
    grow with the data).  Content generation matches bench.py's seg
    probe (piecewise-constant 16x16x10 cells) so per-chunk decode cost
    is constant and any super-linear growth is orchestration overhead
    — the thing under test."""
    import shutil
    import tempfile

    import numpy as np

    from cloud_volume_spark.catalog import VolumeInfo
    from cloud_volume_spark.geometry import Bbox
    from cloud_volume_spark.volume import Volume

    cs = (256, 256, 50)
    out = {}
    # warm codegen/Arrow/Python-worker paths on a micro volume so the
    # first timed size measures the data path, not one-time compiles
    # (the z=100 write was 2.7x the z=200 write before this)
    _warm = tempfile.mkdtemp(prefix="cvs_volscale_warm_")
    try:
        import numpy as _np
        wv = Volume.from_numpy(
            spark,
            _np.random.default_rng(0).integers(
                0, 100, (64, 64, 64, 1)).astype(np.uint16),
            os.path.join(_warm, "vol"), chunk_size=(32, 32, 32))
        wv.cutout(Bbox((0, 0, 0), (64, 64, 64)))
        wv.blocks_df().selectExpr("sum(length(blob))").collect()
        wv.unique().count()
        wv.downsample(from_mip=0, factor=(2, 2, 1))
    finally:
        shutil.rmtree(_warm, ignore_errors=True)

    for z in zs:
        shape = (1024, 1024, z)
        base = tempfile.mkdtemp(prefix=f"cvs_volscale_{z}_")
        try:
            info = VolumeInfo.create(
                layer_type="segmentation", data_type="uint16",
                num_channels=1, resolution=(1, 1, 1),
                voxel_offset=(0, 0, 0), volume_size=shape,
                chunk_size=cs, encoding="raw",
            )
            # slab_shift=4 (16 chunks/slab): slab and manifest-entry
            # counts actually grow with z (default 64/slab keeps even
            # z=400's 128 chunks in 2 slabs — nothing to scale-test)
            vol = Volume.create(spark, os.path.join(base, "vol"), info,
                                slab_shift=4)
            # SAME content generator as bench.py's seg probe — the
            # cross-bench comparability in SCALE.md depends on it
            from bench import make_seg_blocks

            blocks = make_seg_blocks(spark, shape, cs)
            logical_mb = 2 * int(np.prod(shape)) / 1e6

            t0 = time.monotonic()
            vol.write_blocks_df(blocks, mip=0, compression="gzip")
            write_sec = time.monotonic() - t0
            os.sync()
            slabs_mip0 = len(vol._read_manifest().get("entries", {}))

            # distributed full-volume read at every size (cutout's
            # driver assembly caps at 512 MiB — z=400 is 0.8 GB; the
            # blocks_df decode+aggregate is the same full decode with
            # no driver collect, comparable across all sizes)
            t0 = time.monotonic()
            total_bytes = vol.blocks_df(mip=0).selectExpr(
                "sum(length(blob)) b").collect()[0]["b"]
            read_sec = time.monotonic() - t0
            assert total_bytes == 2 * int(np.prod(shape)), total_bytes

            t0 = time.monotonic()
            n_labels = vol.unique().count()
            unique_sec = time.monotonic() - t0

            t0 = time.monotonic()
            vol.downsample(from_mip=0, factor=(2, 2, 1))
            down_sec = time.monotonic() - t0

            rec = {
                "z": z, "logical_mb": round(logical_mb, 1),
                "slabs_mip0": slabs_mip0,
                "write_sec": round(write_sec, 2),
                "read_sec": round(read_sec, 2),
                "unique_sec": round(unique_sec, 2),
                "unique_labels": int(n_labels),
                "downsample_sec": round(down_sec, 2),
            }
            out[z] = rec
            print(json.dumps({"volume_scale": rec}), flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    base_z = zs[0]
    print("\n# z  mb  slabs_mip0  write_s  read_s  unique_s  down_s  "
          "(ratios vs z=%d)" % base_z)
    summary = {}
    for z in zs:
        r = out[z]
        ratios = {
            k: round(r[k] / max(out[base_z][k], 1e-9), 2)
            for k in ("write_sec", "read_sec", "unique_sec",
                      "downsample_sec")
        }
        summary[z] = {**r, "ratios": ratios}
        print(f"# {z}  {r['logical_mb']}  {r['slabs_mip0']}  "
              f"{r['write_sec']}  {r['read_sec']}  {r['unique_sec']}  "
              f"{r['downsample_sec']}  {ratios}")
    print("VOLSCALE_SUMMARY "
          + json.dumps(summary, separators=(",", ":")))
    return summary


def _clear_session_caches() -> None:
    """Drop every compute-once (session, dataset) cache so a timed
    pass measures the COMPUTE, not a cache read — the r13 verdict's
    note: once a query is session-materialized, only first-call
    timings are an honest scaling signal for it."""
    from cloud_volume_spark.operators.dedup import (
        clear_cluster_cache, clear_lsh_index_cache,
    )
    from cloud_volume_spark.operators.similarity import (
        clear_ivf_index_cache, clear_kmeans_cache,
    )

    clear_cluster_cache()
    clear_lsh_index_cache()
    clear_ivf_index_cache()
    clear_kmeans_cache()


def run(queries, names, sf_dir, passes=2, first_call=False):
    out = {}
    for name in names:
        fn = queries[name]
        best = None
        for _ in range(passes):
            if first_call:
                _clear_session_caches()
            t0 = time.monotonic()
            n = fn(SPARK, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {"sec": round(best, 3), "rows": n}
        print(json.dumps({"query": name, "sf_dir": sf_dir,
                          "first_call": bool(first_call), **out[name]}),
              flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--scaled-dir", default="/tmp/cvs_sf1_synth")
    ap.add_argument("--volume", action="store_true",
                    help="run the volumetric scale leg instead of the "
                         "query leg")
    ap.add_argument("--events", action="store_true",
                    help="run the EVENT-operator scale leg (funnel/"
                         "json/sessionize/running-total over a "
                         "disjoint-user replicated events table)")
    ap.add_argument("--events-dir", default="/tmp/cvs_events_synth")
    ap.add_argument("--tpch", action="store_true",
                    help="run the TPC-H fact-table scale leg (Q4/Q21 "
                         "semi/anti joins over order-disjoint "
                         "replicated orders+lineitem)")
    ap.add_argument("--tpch-dir", default="/tmp/cvs_tpch_synth")
    ap.add_argument("--ivf", action="store_true",
                    help="run the persistent-IVF-index scale leg "
                         "(build + partition-pruned search, 1x vs 10x "
                         "embeddings)")
    ap.add_argument("--ann-dim", action="store_true",
                    help="run the embedding-WIDTH scale leg: kmeans "
                         "IVF build + search at dim 64 vs 768 (same "
                         "row count) — proves the posexplode mean "
                         "reduction holds at realistic widths")
    ap.add_argument("--ivf-recall", action="store_true",
                    help="characterize IVFIndex.search recall@k vs the "
                         "brute-force truth at nprobe in {1,2,4,8,nlist} "
                         "on sf0.1 embeddings (both centroid modes) and "
                         "once at a synthetic dim-768 corpus")
    ap.add_argument("--annotations", action="store_true",
                    help="run the annotation-layer scale leg: export "
                         "+ bbox query at 2M vs 20M points")
    ap.add_argument("--lsh", action="store_true",
                    help="run the persistent-LSH-band-index scale leg: "
                         "build / fixed-delta add / fixed-batch lookup "
                         "at 1x vs 10x corpus, vs the re-signature "
                         "(dedup_incremental-shaped) recompute path — "
                         "ingest cost must scale with the DELTA, the "
                         "recompute path with the corpus")
    ap.add_argument("--first-call", action="store_true",
                    help="clear every session-materialized cache "
                         "before each timed pass of the --queries leg "
                         "so cached queries (embedding_kmeans / "
                         "embedding_outliers / dedup_clusters / the "
                         "standing indexes) report compute, not cache "
                         "reads")
    ap.add_argument("--zs", default="100,200,400",
                    help="z extents for --volume (1024x1024xZ uint16)")
    args = ap.parse_args()

    if args.volume:
        from cloud_volume_spark import get_spark

        SPARK = get_spark()
        bench_volume_scale(
            SPARK, zs=tuple(int(z) for z in args.zs.split(",")))
        sys.exit(0)

    if args.lsh:
        import shutil
        import tempfile
        import time as _t

        from pyspark.sql import functions as F

        from cloud_volume_spark import get_spark
        from cloud_volume_spark.lsh_index import build_lsh_index
        from cloud_volume_spark.operators.dedup import (
            INGEST_MOD, band_frame, signature_frame_maponly,
        )

        SPARK = get_spark()
        ensure_scaled(SPARK, SF01, args.scaled_dir, args.replicas,
                      make_scaled, "docs")

        def _docs(d):
            return SPARK.read.parquet(f"{d}/documents.parquet").select(
                "doc_id", "text")

        out = {}
        for tag, d in (("1x", SF01), (f"{args.replicas}x",
                                      args.scaled_dir)):
            docs = _docs(d)
            corpus = docs.where(F.col("doc_id") % INGEST_MOD != 0)
            # fixed-size batch/delta at BOTH scales: doc_id < 640 with
            # the ingest residue — the same 64 documents everywhere
            batch = docs.where((F.col("doc_id") % INGEST_MOD == 0)
                               & (F.col("doc_id") < 640))
            path = tempfile.mkdtemp(prefix=f"cvs_lsh_leg_{tag}_")
            shutil.rmtree(path)
            t0 = _t.monotonic()
            idx = build_lsh_index(corpus, path)
            t_build = _t.monotonic() - t0
            # delta add: the SAME 64 docs under fresh ids
            delta = batch.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(10 ** 12))
                .cast("long"))
            t0 = _t.monotonic()
            idx.add(delta)
            t_add = _t.monotonic() - t0
            idx.remove(delta.select("doc_id"))
            t_lkp = None
            for _ in range(2):
                t0 = _t.monotonic()
                n_lkp = idx.lookup(batch).count()
                dt = _t.monotonic() - t0
                t_lkp = dt if t_lkp is None else min(t_lkp, dt)
            # the re-signature path: corpus bands derived from parquet
            # per run (the dedup_incremental shape, same 64-doc batch)
            t_rec = None
            for _ in range(2):
                t0 = _t.monotonic()
                cb = band_frame(signature_frame_maponly(corpus))
                nb = band_frame(signature_frame_maponly(batch)).select(
                    F.col("doc_id").alias("new_id"), "band", "band_hash")
                n_rec = (cb.join(F.broadcast(nb), ["band", "band_hash"])
                         .groupBy("new_id")
                         .agg(F.min("doc_id").alias("dup_of"),
                              F.countDistinct("doc_id").alias("n"))
                         .count())
                dt = _t.monotonic() - t0
                t_rec = dt if t_rec is None else min(t_rec, dt)
            out[tag] = {"n_corpus": corpus.count(),
                        "build_sec": round(t_build, 3),
                        "add64_sec": round(t_add, 3),
                        "lookup64_sec": round(t_lkp, 3),
                        "lookup_rows": n_lkp,
                        "recompute64_sec": round(t_rec, 3),
                        "recompute_rows": n_rec}
            print(json.dumps({"leg": "lsh", "scale": tag, **out[tag]}),
                  flush=True)
            shutil.rmtree(path, ignore_errors=True)
        b, s = out["1x"], out[f"{args.replicas}x"]
        print(f"\n# lsh_index  corpus {b['n_corpus']}→{s['n_corpus']}: "
              f"build {b['build_sec']}→{s['build_sec']} "
              f"({round(s['build_sec'] / max(b['build_sec'], 1e-9), 2)}x), "
              f"add64 {b['add64_sec']}→{s['add64_sec']} "
              f"({round(s['add64_sec'] / max(b['add64_sec'], 1e-9), 2)}x), "
              f"lookup64 {b['lookup64_sec']}→{s['lookup64_sec']} "
              f"({round(s['lookup64_sec'] / max(b['lookup64_sec'], 1e-9), 2)}x), "
              f"recompute64 {b['recompute64_sec']}→{s['recompute64_sec']} "
              f"({round(s['recompute64_sec'] / max(b['recompute64_sec'], 1e-9), 2)}x)"
              )
        sys.exit(0)

    if args.ivf_recall:
        import shutil
        import time as _t

        from pyspark.sql import functions as F

        from cloud_volume_spark import get_spark
        from cloud_volume_spark.ann_index import (
            brute_force_topk, build_ivf_index, recall_at_k,
        )

        SPARK = get_spark()
        K, NQ, NLIST = 10, 50, 16

        def leg(tag, emb, pq_m=None):
            q = emb.where(F.col("vec_id") < NQ).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
            truth = brute_force_topk(emb, q, k=K).cache()
            truth.count()
            for mode in ("sample", "kmeans"):
                path = f"/tmp/cvs_ivfrec_{tag}_{mode}"
                shutil.rmtree(path, ignore_errors=True)
                idx = build_ivf_index(emb, path, nlist=NLIST,
                                      centroids=mode, kmeans_rounds=3)
                for nprobe in (1, 2, 4, 8, NLIST):
                    got = idx.search(q, k=K, nprobe=nprobe)
                    r = recall_at_k(got, truth)
                    best = None
                    for _ in range(2):
                        t0 = _t.monotonic()
                        got.count()
                        dt = _t.monotonic() - t0
                        best = dt if best is None else min(best, dt)
                    print(json.dumps({
                        "leg": "ivf_recall", "corpus": tag,
                        "mode": mode, "nprobe": nprobe, "k": K,
                        "recall": round(r, 3),
                        "search_s": round(best, 3)}), flush=True)
            # int8 sidecar: recall vs the FLOAT search at the same
            # nprobe (how much the quantized-affinity pruning costs as
            # rerank_r shrinks), sample centroids, nprobe=nlist so the
            # only approximation left is the int8 top-R cut
            path = f"/tmp/cvs_ivfrec_{tag}_int8"
            shutil.rmtree(path, ignore_errors=True)
            idx8 = build_ivf_index(emb, path, nlist=NLIST,
                                   centroids="sample", int8=True)
            fref = idx8.search(q, k=K, nprobe=NLIST).cache()
            fref.count()
            for rr in (K, 2 * K, 4 * K, 8 * K):
                got = idx8.search_int8(q, k=K, nprobe=NLIST,
                                       rerank_r=rr)
                r_vs_float = recall_at_k(got, fref)
                r_vs_truth = recall_at_k(got, truth)
                best = None
                for _ in range(2):
                    t0 = _t.monotonic()
                    got.count()
                    dt = _t.monotonic() - t0
                    best = dt if best is None else min(best, dt)
                print(json.dumps({
                    "leg": "ivf_int8_recall", "corpus": tag,
                    "rerank_r": rr, "k": K,
                    "recall_vs_float": round(r_vs_float, 3),
                    "recall_vs_truth": round(r_vs_truth, 3),
                    "search_s": round(best, 3)}), flush=True)
            # PQ sidecar (r14): same protocol as int8 — recall vs the
            # float search at nprobe=nlist isolates what the 4-bit ADC
            # top-R cut costs as rerank_r shrinks, at ~13x less scan
            # IO than the float lists (int8: 4x)
            path = f"/tmp/cvs_ivfrec_{tag}_pq"
            shutil.rmtree(path, ignore_errors=True)
            # geometry is per-corpus (the similarity.PQ_M sweep note):
            # the default 32x16 wins on the weakly-clustered dim-64
            # corpus; structured high-dim corpora do better AND run a
            # far smaller ADC LUT with coarser subspaces
            idxpq = build_ivf_index(emb, path, nlist=NLIST,
                                    centroids="sample", pq=True,
                                    pq_m=pq_m)
            for rr in (K, 2 * K, 4 * K, 8 * K):
                got = idxpq.search_pq(q, k=K, nprobe=NLIST,
                                      rerank_r=rr)
                r_vs_float = recall_at_k(got, fref)
                r_vs_truth = recall_at_k(got, truth)
                best = None
                for _ in range(2):
                    t0 = _t.monotonic()
                    got.count()
                    dt = _t.monotonic() - t0
                    best = dt if best is None else min(best, dt)
                print(json.dumps({
                    "leg": "ivf_pq_recall", "corpus": tag,
                    "rerank_r": rr, "k": K,
                    "recall_vs_float": round(r_vs_float, 3),
                    "recall_vs_truth": round(r_vs_truth, 3),
                    "search_s": round(best, 3)}), flush=True)
            fref.unpersist()
            truth.unpersist()

        leg("sf0.1_dim64",
            SPARK.read.parquet(f"{SF01}/embeddings.parquet"))
        # synthetic dim-768 corpus, same construction as --ann-dim:
        # deterministic JVM sin() spread, no RAND
        n = SPARK.read.parquet(f"{SF01}/embeddings.parquet").count()
        leg("synth_dim768", SPARK.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(767)),
                lambda p: F.sin(F.col("id") * 0.7 + p * 0.13),
            ).alias("embedding")), pq_m=8)

        # ---- retrain drift leg (r14): recall decay under a drifted
        # add() stream and its restoration by the warm-start retrain,
        # vs the fresh-rebuild reference, with the retrain wall time —
        # at 1x and 10x vectors so the delta-bounded claim carries a
        # measured scaling ratio
        def drift_leg(tag, emb):
            emb = emb.select("vec_id", "embedding")
            drift = emb.select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                F.transform("embedding", lambda x: -x).alias("embedding"))
            full = emb.unionByName(drift)
            q = drift.where(F.col("vec_id") % 37 == 0).limit(NQ).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
            truth = brute_force_topk(full, q, k=K).cache()
            truth.count()

            def rec(ix):
                return recall_at_k(
                    ix.search(q, k=K, nprobe=4)
                    .select("query_id", "neighbor_id"), truth)

            path = f"/tmp/cvs_ivfdrift_{tag}"
            shutil.rmtree(path, ignore_errors=True)
            shutil.rmtree(path + "_fresh", ignore_errors=True)
            idx = build_ivf_index(emb, path, nlist=NLIST,
                                  centroids="kmeans", kmeans_rounds=3)
            idx.add(drift)
            pre = rec(idx)
            t0 = _t.monotonic()
            res = idx.retrain(sample_frac=1.0, rounds=3,
                              move_threshold=0.01)
            retrain_s = _t.monotonic() - t0
            post = rec(idx)
            fresh = build_ivf_index(full, path + "_fresh", nlist=NLIST,
                                    centroids="kmeans", kmeans_rounds=3)
            ref = rec(fresh)
            truth.unpersist()
            print(json.dumps({
                "leg": "ivf_retrain_drift", "corpus": tag,
                "nprobe": 4, "k": K,
                "recall_pre": round(pre, 3),
                "recall_post": round(post, 3),
                "recall_fresh": round(ref, 3),
                "retrain_s": round(retrain_s, 3),
                "moved": len(res["moved"]),
                "touched": len(res["touched"]),
                "reassigned": res["reassigned"]}), flush=True)

        drift_leg("sf0.1_dim64",
                  SPARK.read.parquet(f"{SF01}/embeddings.parquet"))
        # 10x leg uses the decorrelated scaled REAL corpus (the sin
        # synthetic is phase-dense: negation is a π shift that lands
        # inside the existing distribution — no drift, nothing moves,
        # the leg proves nothing)
        ensure_scaled(SPARK, SF01, args.scaled_dir, args.replicas,
                      make_scaled, "corpus")
        drift_leg("scaled10x_dim64", SPARK.read.parquet(
            f"{args.scaled_dir}/embeddings.parquet"))
        sys.exit(0)

    if args.ivf:
        import time as _t

        from pyspark.sql import functions as F

        from cloud_volume_spark import get_spark
        from cloud_volume_spark.ann_index import build_ivf_index

        SPARK = get_spark()
        ensure_scaled(SPARK, SF01, args.scaled_dir, args.replicas,
                      make_scaled, "corpus")
        import shutil

        out = {}
        for tag, d in (("1x", SF01), ("10x", args.scaled_dir)):
            emb = SPARK.read.parquet(f"{d}/embeddings.parquet")
            path = f"/tmp/cvs_ivf_{tag}"
            shutil.rmtree(path, ignore_errors=True)
            # hold out a 1% delta so the LIFECYCLE timings (add of the
            # delta, remove of an equal-sized id set) are measured at
            # both scales — the mutations must stay delta-/list-bounded,
            # not index-bounded
            n_total = emb.count()
            n_delta = max(n_total // 100, 5)
            cut = emb.select("vec_id").orderBy(F.desc("vec_id")).limit(
                n_delta).agg(F.min("vec_id")).collect()[0][0]
            base_emb = emb.where(F.col("vec_id") < cut)
            delta_emb = emb.where(F.col("vec_id") >= cut)
            t0 = _t.monotonic()
            idx = build_ivf_index(base_emb, path, nlist=16,
                                  centroids="sample")
            build_s = _t.monotonic() - t0
            t0 = _t.monotonic()
            added = idx.add(delta_emb)
            add_s = _t.monotonic() - t0
            t0 = _t.monotonic()
            removed = idx.remove(
                [r["vec_id"] for r in delta_emb.select("vec_id").collect()])
            remove_s = _t.monotonic() - t0
            idx.add(delta_emb)  # restore for the search timing
            q = emb.where(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
            best = None
            for _ in range(2):
                t0 = _t.monotonic()
                n = idx.search(q, k=5, nprobe=4).count()
                dt = _t.monotonic() - t0
                best = dt if best is None else min(best, dt)
            out[tag] = {"vectors": idx.meta["count"],
                        "build_s": round(build_s, 3),
                        "add_s": round(add_s, 3), "n_delta": added,
                        "remove_s": round(remove_s, 3),
                        "n_removed": removed,
                        "search_s": round(best, 3), "rows": n}
            print(json.dumps({"leg": "ivf", "scale": tag, **out[tag]}),
                  flush=True)
        b, s = out["1x"], out["10x"]
        print(f"\n# ivf  build {b['build_s']}→{s['build_s']} "
              f"({round(s['build_s'] / max(b['build_s'], 1e-9), 2)}x), "
              f"add(1%) {b['add_s']}→{s['add_s']} "
              f"({round(s['add_s'] / max(b['add_s'], 1e-9), 2)}x), "
              f"remove(1%) {b['remove_s']}→{s['remove_s']} "
              f"({round(s['remove_s'] / max(b['remove_s'], 1e-9), 2)}x), "
              f"search {b['search_s']}→{s['search_s']} "
              f"({round(s['search_s'] / max(b['search_s'], 1e-9), 2)}x) "
              f"at {round(s['vectors'] / max(b['vectors'], 1), 1)}x vectors")
        sys.exit(0)

    if args.ann_dim:
        import shutil
        import time as _t

        from pyspark.sql import functions as F

        from cloud_volume_spark import get_spark
        from cloud_volume_spark.ann_index import build_ivf_index

        SPARK = get_spark()
        n = SPARK.read.parquet(f"{SF01}/embeddings.parquet").count()
        out = {}
        for dim in (64, 768):
            # deterministic synthetic vectors at width `dim`, same row
            # count as sf0.1 embeddings: JVM-side sin() spread, no RAND
            # (content is irrelevant to the timing; what is under test
            # is that the spherical-kmeans build and the cosine search
            # stay O(dim) in TIME with a constant-size PLAN — the
            # pre-round-11 per-dimension F.avg aggregate would emit a
            # 768-column plan here)
            emb = SPARK.range(n).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda p: F.sin(F.col("id") * 0.7 + p * 0.13),
                ).alias("embedding"))
            path = f"/tmp/cvs_ivf_dim{dim}"
            shutil.rmtree(path, ignore_errors=True)
            t0 = _t.monotonic()
            idx = build_ivf_index(emb, path, nlist=16,
                                  centroids="kmeans", kmeans_rounds=3)
            build_s = _t.monotonic() - t0
            q = emb.where(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
            best = None
            for _ in range(2):
                t0 = _t.monotonic()
                rows = idx.search(q, k=5, nprobe=4).count()
                dt = _t.monotonic() - t0
                best = dt if best is None else min(best, dt)
            out[dim] = {"vectors": idx.meta["count"], "dim": dim,
                        "build_s": round(build_s, 3),
                        "search_s": round(best, 3), "rows": rows}
            print(json.dumps({"leg": "ann_dim", **out[dim]}),
                  flush=True)
        b, s = out[64], out[768]
        print(f"\n# ann_dim  build {b['build_s']}→{s['build_s']} "
              f"({round(s['build_s'] / max(b['build_s'], 1e-9), 2)}x), "
              f"search {b['search_s']}→{s['search_s']} "
              f"({round(s['search_s'] / max(b['search_s'], 1e-9), 2)}x) "
              f"at 12x dim")
        sys.exit(0)

    if args.annotations:
        from bench import bench_annotations
        from cloud_volume_spark import get_spark

        SPARK = get_spark()
        out = {}
        for n in (2_000_000, 20_000_000):
            out[n] = bench_annotations(SPARK, n=n)
            print(json.dumps({"leg": "annotations", "n": n, **out[n]}),
                  flush=True)
        b, s = out[2_000_000], out[20_000_000]
        print(f"\n# annotations  export {b['export_sec']}→"
              f"{s['export_sec']} "
              f"({round(s['export_sec'] / max(b['export_sec'], 1e-9), 2)}x),"
              f" bbox_query {b['bbox_query_sec']}→{s['bbox_query_sec']} "
              f"({round(s['bbox_query_sec'] / max(b['bbox_query_sec'], 1e-9), 2)}x)"
              f" at 10x points")
        sys.exit(0)

    if args.tpch:
        from cloud_volume_spark import get_spark
        from cloud_volume_spark import operators

        SPARK = get_spark()
        qs = operators.all_queries()
        ensure_scaled(SPARK, SF01, args.tpch_dir, args.replicas,
                      make_scaled_tpch, "tpch")
        base = run(qs, TPCH_QUERIES, SF01)
        scaled = run(qs, TPCH_QUERIES, args.tpch_dir)
        print("\n# query  base_s  scaled_s  time_ratio  rows_ratio  "
              f"(scale={args.replicas}x)")
        for name in TPCH_QUERIES:
            b, s = base[name], scaled[name]
            print(f"# {name}  {b['sec']}  {s['sec']}  "
                  f"{round(s['sec'] / max(b['sec'], 1e-9), 2)}  "
                  f"{round(s['rows'] / max(b['rows'], 1), 2)}")
        sys.exit(0)

    if args.events:
        from cloud_volume_spark import get_spark
        from cloud_volume_spark import operators

        SPARK = get_spark()
        qs = operators.all_queries()
        ensure_scaled(SPARK, SF01, args.events_dir, args.replicas,
                      make_scaled_events, "events")
        base = run(qs, EVENT_QUERIES, SF01)
        scaled = run(qs, EVENT_QUERIES, args.events_dir)
        print("\n# query  base_s  scaled_s  time_ratio  rows_ratio  "
              f"(scale={args.replicas}x)")
        for name in EVENT_QUERIES:
            b, s = base[name], scaled[name]
            print(f"# {name}  {b['sec']}  {s['sec']}  "
                  f"{round(s['sec'] / max(b['sec'], 1e-9), 2)}  "
                  f"{round(s['rows'] / max(b['rows'], 1), 2)}")
        sys.exit(0)

    # the vowel-rotation decorrelation has period len(VOWS): replica 10
    # would be byte-identical to replica 0 (modulo doc_id), handing the
    # measurement the exact cross-replica near-dup cliques it exists to
    # avoid — refuse rather than silently measure the wrong workload
    if not (2 <= args.replicas <= len(VOWS)):
        sys.exit(f"--replicas must be in [2, {len(VOWS)}]: the content/"
                 "embedding decorrelation rotations repeat beyond that "
                 "and replicas become cross-replica near-duplicates")

    from cloud_volume_spark import get_spark
    from cloud_volume_spark import operators

    SPARK = get_spark()
    names = [q for q in args.queries.split(",") if q]
    qs = operators.all_queries()

    ensure_scaled(SPARK, SF01, args.scaled_dir, args.replicas,
                  make_scaled, "corpus")

    base = run(qs, names, SF01, first_call=args.first_call)
    scaled = run(qs, names, args.scaled_dir, first_call=args.first_call)

    print("\n# query  sf0.1_s  10x_s  time_ratio  rows_ratio")
    summary = {}
    for n in names:
        tr = scaled[n]["sec"] / max(base[n]["sec"], 1e-9)
        rr = scaled[n]["rows"] / max(base[n]["rows"], 1)
        summary[n] = {"sf01_sec": base[n]["sec"], "x10_sec": scaled[n]["sec"],
                      "time_ratio": round(tr, 2), "rows_ratio": round(rr, 2)}
        print(f"# {n}  {base[n]['sec']}  {scaled[n]['sec']}  "
              f"{tr:.2f}  {rr:.2f}")
    print("SCALE_SUMMARY " + json.dumps(summary, separators=(",", ":")))
