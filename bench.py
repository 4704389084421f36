#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

  index_build         ingest documents + postings + compressed segments
                      (x16 replicated corpus so the measurement is work-,
                      not overhead-dominated)
  bm25_batch          exact DataFrame BM25, 8-query batch (per-query plans)
  single_query        cost-dispatched single-query search (engine.search_best
                      shape): each query routed to the faster of the exact /
                      WAND rank-identical plans on matched posting volume
  wand_batch          block-max WAND over compressed segments, same queries
  wand_batch_oneplan  all 8 queries in ONE cogroup pass (the offline-
                      retrieval scale shape)
  bm25_batch_oneplan  exact scorer, one plan for the batch
  route_demo_*        dispatch route demonstration on a x128 + needle
                      corpus: the same search_topk_auto call routes the
                      light selective query exact and the heavy one to
                      two-phase WAND (measured thresholds, engine.py)
  dedup_minhash       MinHash+LSH candidate pairs over documents
  simsearch           brute-force cosine top-20 over embeddings
  nsw_build           persisted NSW ANN: build adjacency parquet over a
                      deterministic synthetic 65536x64 embedding table
  nsw_query           query-many half over the stored graphs (8 queries,
                      recall@10 vs numpy brute force reported)
  relational          pricing summary + revenue-by-nation star join

Every workload is timed best-of-$BENCH_RUNS (default 3); the sub-second
query sections repeat more, best-of-$BENCH_QUERY_RUNS (default 4): this
sandbox VM has large cross-minute frequency variance, and ALU + memory-
bandwidth probes bracket the engine sections so a degraded window is
visible in the JSON line itself (control_* fields).

{"metric": "total_wall_sec", "value": N, "unit": "sec",
 "queries": {name: sec, ...}, "sf": 0.1, "files_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "table scan merge join",
    "window agg stream dup",
    "data value result",
    "spark filter query group",
    "hash join batch row column",
    "dup",
    "tableScan mergeJoin",
    "slow vector line order key",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    replicate = int(os.environ.get("BENCH_REPLICATE", "16"))

    from pyspark.sql import functions as F

    from pyspark_codesearch.indexing import (
        build_postings_with_dl,
        build_segments,
        build_term_stats,
        corpus_stats,
    )
    from pyspark_codesearch.pyfiles import ensure_py_files
    from pyspark_codesearch.scoring import bm25_topk
    from pyspark_codesearch.session import get_spark
    from pyspark_codesearch.wand import wand_topk

    # best-of-3 by default since round 4: the VM's cross-minute variance
    # reached 4-6x this session; a third observation materially improves
    # the odds one lands in a clean window (~+8s total bench wall).
    # Query sections repeat more (BENCH_QUERY_RUNS, default 4): they are
    # the sub-second headline metrics and cost seconds to repeat.
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    query_runs = int(os.environ.get("BENCH_QUERY_RUNS", "4"))

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_py_files(spark)
    timings: dict[str, float] = {}

    # ---- hardware-window controls (see BENCH/BASELINE.md): measured
    # BEFORE and AFTER the engine sections so a degraded cross-minute
    # window is VISIBLE IN THE ARTIFACT instead of silently contaminating
    # the engine numbers. Clean-window reference values are recorded in
    # BENCH/BASELINE.md history; a worst/best ratio >> 1.5 or absolute
    # values far above reference mean the window was degraded.
    def control_probe() -> tuple[float, float]:
        # ALU: pure-JVM range->hash->sum, no shuffle, no python
        t0 = time.perf_counter()
        spark.range(0, 1_000_000_000, 1, int(cpus) * 2).select(
            F.sum(F.hash("id").cast("double"))
        ).collect()
        alu = time.perf_counter() - t0
        # memory bandwidth: numpy widening copy + cumsum (the posting-
        # decode access pattern), one process — the bus, not the cores.
        # Buffers are PRE-ALLOCATED and warmed: a fresh 450 MB alloc per
        # probe would measure kernel page-fault/zeroing throughput (wildly
        # state-dependent next to a big JVM), not the memory bus.
        t0 = time.perf_counter()
        np.copyto(bw_dst, bw_src, casting="unsafe")
        np.cumsum(bw_dst[:12_500_000], out=bw_cs)
        bw = time.perf_counter() - t0
        return round(alu, 3), round(bw, 3)

    bw_src = np.arange(50_000_000, dtype=np.uint8)
    bw_dst = np.empty(50_000_000, dtype=np.uint64)
    bw_cs = np.empty(12_500_000, dtype=np.uint64)
    control_probe()  # warmup: JVM codegen + numpy page-in, not the window
    controls: list[tuple[float, float]] = [control_probe()]

    def timed(name, fn, n_runs=None):
        """best-of-N wall time: this sandbox VM has large cross-minute
        frequency/steal variance (see BENCH/BASELINE.md); min is the
        least-contaminated observation."""
        best = None
        for _ in range(n_runs or runs):
            t0 = time.perf_counter()
            fn()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)

    # ---- index build over a replicated corpus (bigger, still deterministic)
    from pyspark_codesearch.corpus import replicated_documents

    docs = replicated_documents(spark, sf_dir, replicate, int(cpus) * 2).cache()
    n_docs = docs.count()

    # salt_range is an index-layout property: ~2 salt groups per core so
    # hash collisions cannot serialize the cogroup, identical plan shape
    # to the scaling harness
    salt_range = max(1024, n_docs // (int(cpus) * 2))
    state: dict = {}

    def build_once():
        if "postings" in state:  # best-of-N: drop the previous run's caches
            state["postings"].unpersist()
            state["segments"].unpersist()
            state["doc_lens"].unpersist()
        stats = corpus_stats(docs)
        doc_lens = docs.select("doc_id", "doc_len").cache()
        postings_dl = build_postings_with_dl(docs).cache()
        postings_dl.count()
        segments = build_segments(postings_dl, stats, salt_range=salt_range).cache()
        segments.count()
        state.update(stats=stats, doc_lens=doc_lens, postings=postings_dl, segments=segments)

    timed("index_build", build_once)
    stats, doc_lens = state["stats"], state["doc_lens"]
    postings, segments = state["postings"], state["segments"]
    term_stats = build_term_stats(postings).cache()
    term_stats.count()

    # Query sessions run with AQE OFF: the scorer plans are small fixed-
    # shape cogroups/joins over cached inputs, and AQE's runtime re-
    # planning only adds per-query latency (measured +10-15% per query).
    # The build above keeps AQE on (skew backstop). Restored before the
    # dedup/relational sections, which want the skew-join safety net.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    from pyspark_codesearch.analysis import tokenize_py
    from pyspark_codesearch.wand import (
        TermDictionary,
        prepare_lens_by_salt,
        wand_topk_batch,
    )

    lens_by_salt = prepare_lens_by_salt(doc_lens, salt_range)
    lens_by_salt.count()
    # resident term dictionary (df + touched salts) — FILTERED lookups
    # only, never a full-vocab collect (the Lucene terms-dict analogue);
    # the first timed run pays the dictionary seeks, best-of-N reports the
    # warm-dictionary path
    td = TermDictionary(term_stats, segments)

    def one_bm25(q):
        dfs, _ = td.lookup(tokenize_py(q))
        # literal plan path + resident df lookup: ONE Spark job per query
        return bm25_topk(
            postings, doc_lens, term_stats, stats, q, 10, df_lookup=dfs
        ).collect()

    # the exact scorer's per-query agg is tiny — 8 shuffle partitions
    # beats 32 (fewer sub-ms tasks to launch per stage); the wand cogroup
    # sections below want whatever get_spark sized (max(cpus, 8)), so
    # save/restore rather than hardcode
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    timed("bm25_batch", lambda: [one_bm25(q) for q in BENCH_QUERIES], n_runs=query_runs)

    # ---- cost-dispatched single-query search: the path a user actually
    # gets (engine.search_best) — routes each query to the faster of the
    # two rank-identical plans on matched posting volume (sum df from the
    # resident term dictionary). The headline single-query latency is the
    # min of both paths by construction.
    from pyspark_codesearch.engine import search_topk_auto

    single_best: dict[str, float] = {}
    single_routes: dict[str, int] = {}

    def one_single(q):
        dfs, salts = td.lookup(tokenize_py(q))
        route: dict = {}
        out = search_topk_auto(
            postings, segments, doc_lens, term_stats, stats, q, 10,
            salt_range=salt_range, lens_by_salt=lens_by_salt,
            df_lookup=dfs, salt_lookup=salts, route_out=route,
        ).collect()
        single_routes[q] = route["route"]
        return out

    def single_all():
        for q in BENCH_QUERIES:
            t0 = time.perf_counter()
            one_single(q)
            el = time.perf_counter() - t0
            single_best[q] = min(single_best.get(q, el), el)

    timed("single_query", single_all, n_runs=query_runs)

    # oneplan exact batch: same tiny-agg shape as bm25_batch, so it
    # belongs inside the 8-partition bracket too (interleaved best-of-5
    # probe, r7: 0.208 s/q at sp=8 vs 0.2195 at sp=32 on the same 80k
    # corpus — the r6 "0.178 -> 0.204 regression" was window noise plus
    # this bracket placement)
    from pyspark_codesearch.scoring import bm25_topk_batch

    qmap = {f"q{i}": q for i, q in enumerate(BENCH_QUERIES)}
    timed("bm25_batch_oneplan", lambda: bm25_topk_batch(
        postings, doc_lens, term_stats, stats, qmap, 10,
    ).collect(), n_runs=query_runs)

    spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    def one_wand(q):
        dfs, salts = td.lookup(tokenize_py(q))
        # salt_group_factor: latency-bound single queries amortize python
        # task dispatch over coarser groups (the batch path below keeps
        # G=1 — its per-task compute is large enough to want all cores)
        return wand_topk(
            segments, doc_lens, term_stats, stats, q, 10,
            salt_range=salt_range, lens_by_salt=lens_by_salt,
            df_lookup=dfs, salt_lookup=salts, salt_group_factor=16,
        ).collect()

    # per-query latencies for p50/p99 (the baseline metric is stated as
    # top-k latency percentiles): best-of-N per query, percentile across
    # the query set
    per_query_best: dict[str, float] = {}

    def wand_all():
        for q in BENCH_QUERIES:
            t0 = time.perf_counter()
            one_wand(q)
            el = time.perf_counter() - t0
            per_query_best[q] = min(per_query_best.get(q, el), el)

    timed("wand_batch", wand_all, n_runs=query_runs)

    def wand_oneplan():
        dfs, salts = td.lookup({t for q in BENCH_QUERIES for t in tokenize_py(q)})
        return wand_topk_batch(
            segments, doc_lens, term_stats, stats, qmap, 10,
            salt_range=salt_range, lens_by_salt=lens_by_salt,
            df_lookup=dfs, salt_lookup=salts,
        ).collect()

    timed("wand_batch_oneplan", wand_oneplan, n_runs=query_runs)

    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # ---- dispatch route demo (r6): a corpus big enough that the measured
    # WAND thresholds are reachable, so the official artifact exercises
    # BOTH routes of the single-query dispatch (r5 verdict item 2 — at
    # x16 every query routes exact). x128 replication + a rare needle
    # term (corpus.replicated_documents needle_every=5000, the canonical
    # rare-identifier-plus-context code-search shape): the heavy
    # selective query's prunable volume (~8M) crosses
    # SEARCH_EXACT_MAX_POSTINGS (6M) -> two-phase WAND; the light one
    # stays under -> exact. Same dispatch, same corpus. Timings live
    # under route_demo_* keys; total_excl_route_demo preserves
    # comparability with pre-r6 artifacts.
    from pyspark_codesearch.engine import search_topk_auto as _auto
    from pyspark_codesearch.wand import TermDictionary as _TD

    for c in (postings, segments, doc_lens, lens_by_salt, term_stats, docs):
        c.unpersist()
    big_replicate = int(os.environ.get("BENCH_BIG_REPLICATE", "128"))
    from pyspark_codesearch.indexing import (
        build_postings_with_dl as _bp,
        build_segments as _bs,
        build_term_stats as _bt,
        corpus_stats as _cs,
    )
    from pyspark_codesearch.wand import prepare_lens_by_salt as _pl

    big_state: dict = {}

    def big_build():
        big_docs = replicated_documents(
            spark, sf_dir, big_replicate, int(cpus) * 2, needle_every=5000
        ).cache()
        n = big_docs.count()
        sr = max(1024, n // (int(cpus) * 2))
        stats_b = _cs(big_docs)
        lens_b = big_docs.select("doc_id", "doc_len").cache()
        post_b = _bp(big_docs).cache()
        post_b.count()
        seg_b = _bs(post_b, stats_b, salt_range=sr).cache()
        seg_b.count()
        ts_b = _bt(post_b).cache()
        ts_b.count()
        big_state.update(docs=big_docs, n=n, sr=sr, stats=stats_b,
                         lens=lens_b, postings=post_b, segments=seg_b, ts=ts_b)

    timed("route_demo_build", big_build, n_runs=1)
    lens_by_salt_b = _pl(big_state["lens"], big_state["sr"])
    lens_by_salt_b.count()
    td_b = _TD(big_state["ts"], big_state["segments"])
    commons = [
        r["term"]
        for r in big_state["ts"].filter(F.col("term").rlike("^[a-z]+$"))
        .orderBy(F.desc("df"), "term").limit(16).collect()
    ]
    demo_queries = {
        "needle_light": "uniqneedle " + " ".join(commons[:2]),   # -> exact
        "needle_heavy": "uniqneedle " + " ".join(commons),       # -> wand
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    route_demo: dict = {}

    def demo_all():
        for name, q in demo_queries.items():
            dfs, salts, imps = td_b.lookup3(tokenize_py(q))
            route: dict = {}
            t0 = time.perf_counter()
            _auto(
                big_state["postings"], big_state["segments"], big_state["lens"],
                big_state["ts"], big_state["stats"], q, 10,
                salt_range=big_state["sr"], lens_by_salt=lens_by_salt_b,
                df_lookup=dfs, salt_lookup=salts, imp_lookup=imps,
                route_out=route,
            ).collect()
            el = time.perf_counter() - t0
            prev = route_demo.get(name, {}).get("sec")
            route_demo[name] = {
                "sec": round(el if prev is None else min(prev, el), 3),
                "route": route["route"],
                "plan": route.get("wand_plan"),
                "matched_postings": route["matched_postings"],
                "prunable_postings": route["prunable_postings"],
                "phase2": route.get("phase2"),
            }
            single_routes[f"demo:{name}"] = route["route"]

    timed("route_demo_queries", demo_all, n_runs=query_runs)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    for c in (big_state["postings"], big_state["segments"], big_state["lens"],
              lens_by_salt_b, big_state["ts"], big_state["docs"]):
        c.unpersist()

    from pyspark_codesearch.operators.dedup import lsh_candidate_pairs
    from pyspark_codesearch.operators.relational import pricing_summary, revenue_by_nation
    from pyspark_codesearch.operators.simsearch import cosine_topk

    raw_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("dedup_minhash", lambda: lsh_candidate_pairs(raw_docs).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    timed("simsearch", lambda: cosine_topk(emb, qv, 20).collect())

    # ---- persisted NSW ANN at a build-worthy scale (VERDICT r6 ask #3):
    # build-once adjacency parquet over a deterministic synthetic
    # embedding table (NSW_N vectors x 64 dims, per-row seeded so the
    # data is partitioning-independent), then the query-many half over
    # the stored graphs; recall@10 vs numpy brute force on the same
    # vectors is reported alongside the timings.
    import shutil as _sh
    import tempfile as _tf

    from pyspark_codesearch.operators.simsearch import (
        build_nsw_index,
        nsw_topk_indexed,
    )

    nsw_n = int(os.environ.get("SPARK_GRAFT_NSW_N", "65536"))
    # one graph partition per core: interleaved probe (r7) read build
    # 7.4 s / query 0.13-0.18 s / recall 1.000 at parts=32 vs 17.7 s /
    # 0.16 s / 0.975 at parts=8 (build is per-partition-parallel; more,
    # smaller graphs also widen the merged candidate pool). At real
    # scale partitions >> cores anyway.
    nsw_parts = int(os.environ.get("SPARK_GRAFT_NSW_PARTS", str(cpus)))
    # ef=64 reads 0.863 recall@10 at this scale; 128 reads 0.975 at the
    # SAME wall (per-task fixed overhead dominates the wider beam)
    nsw_ef = int(os.environ.get("SPARK_GRAFT_NSW_EF", "128"))
    dim = 64

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = [
                np.random.default_rng(int(i)).standard_normal(dim).tolist()
                for i in ids
            ]
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    synth = (
        spark.range(nsw_n)
        .repartition(int(cpus))
        .mapInPandas(_gen, "vec_id long, embedding array<double>")
        .cache()
    )
    synth.count()
    nsw_dir = os.path.join(_tf.gettempdir(), "spark_graft_bench_nsw")
    _sh.rmtree(nsw_dir, ignore_errors=True)
    timed(
        "nsw_build",
        lambda: build_nsw_index(synth, nsw_dir, n_partitions=nsw_parts),
        n_runs=1,
    )
    nsw_qids = [1, 7, 1001, 2003, 30007, 40009, 50021, 60013]
    nsw_queries = {
        f"q{i:05d}": np.random.default_rng(i).standard_normal(dim).tolist()
        for i in nsw_qids
    }
    nsw_res: dict = {}

    def _nsw_query():
        rows = nsw_topk_indexed(
            spark, nsw_dir, nsw_queries, k=10, ef_search=nsw_ef
        ).collect()
        got: dict = {}
        for r in rows:
            got.setdefault(r["query_id"], []).append(r["vec_id"])
        nsw_res["got"] = got

    timed("nsw_query", _nsw_query, n_runs=query_runs)
    # exact baseline: numpy brute force over the same deterministic data
    V = np.stack(
        [np.random.default_rng(i).standard_normal(dim) for i in range(nsw_n)]
    )
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    hits = 0
    for i in nsw_qids:
        q = np.random.default_rng(i).standard_normal(dim)
        q = q / np.linalg.norm(q)
        brute = set(np.argsort(-(Vn @ q))[:10].tolist())
        hits += len(brute & set(nsw_res["got"][f"q{i:05d}"]))
    nsw_recall = round(hits / (10 * len(nsw_qids)), 3)
    synth.unpersist()

    def relational():
        pricing_summary(spark, sf_dir).collect()
        revenue_by_nation(spark, sf_dir).collect()

    timed("relational", relational)

    controls.append(control_probe())
    alu_vals = [c[0] for c in controls]
    bw_vals = [c[1] for c in controls]

    total = round(sum(timings.values()), 3)
    total_excl_demo = round(
        sum(v for k, v in timings.items() if not k.startswith("route_demo")), 3
    )
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs_indexed": n_docs,
                "files_per_sec": round(n_docs / timings["index_build"], 1),
                # window health: best/worst of the before/after hardware
                # probes. Clean-window reference (BENCH/BASELINE.md):
                # alu ~=1s @32 threads, bw ~=1s single-process; worst >>
                # 1.5x best (or >> reference) = degraded window, read the
                # engine numbers accordingly
                "control_alu_sec": min(alu_vals),
                "control_alu_worst_sec": max(alu_vals),
                "control_bw_sec": min(bw_vals),
                "control_bw_worst_sec": max(bw_vals),
                "single_query_sec_per_query": round(
                    timings["single_query"] / len(BENCH_QUERIES), 4
                ),
                "single_p50_sec": round(
                    float(np.percentile(list(single_best.values()), 50)), 4
                ),
                "single_p99_sec": round(
                    float(np.percentile(list(single_best.values()), 99)), 4
                ),
                "single_query_routes": {
                    r: sum(1 for v in single_routes.values() if v == r)
                    for r in sorted(set(single_routes.values()))
                },
                # pre-r6 artifacts have no route_demo section; compare
                # their totals against this field
                "total_excl_route_demo_sec": total_excl_demo,
                "route_demo": route_demo,
                "bm25_sec_per_query": round(timings["bm25_batch"] / len(BENCH_QUERIES), 4),
                "wand_sec_per_query": round(timings["wand_batch"] / len(BENCH_QUERIES), 4),
                "batch_sec_per_query": round(
                    timings["bm25_batch_oneplan"] / len(BENCH_QUERIES), 4
                ),
                "wand_batch_sec_per_query": round(
                    timings["wand_batch_oneplan"] / len(BENCH_QUERIES), 4
                ),
                # true interpolated percentiles over the per-query bests
                # (with 8 distinct queries p99 is effectively the max —
                # labeled as the percentile it is, computed as one)
                "wand_p50_sec": round(
                    float(np.percentile(list(per_query_best.values()), 50)), 4
                ),
                "wand_p99_sec": round(
                    float(np.percentile(list(per_query_best.values()), 99)), 4
                ),
                "nsw_n_vectors": nsw_n,
                "nsw_ef_search": nsw_ef,
                "nsw_recall_at10": nsw_recall,
                "nsw_query_sec_per_query": round(
                    timings["nsw_query"] / len(nsw_qids), 4
                ),
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
