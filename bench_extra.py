#!/usr/bin/env python
"""Per-step breakdown benchmarks for optimization work (round 8).

bench.py is FROZEN for driver measurement; this file holds the
fine-grained instrumentation the optimization guide (§1) asks for:
per-step timings of the fat bench sections (route_demo_build,
index_build, dedup_minhash, nsw_build, relational), each bracketed by a
small ALU control probe so a degraded VM window is visible per section.

Usage: python bench_extra.py [big_build] [index_build] [dedup] [nsw]
                             [relational] [queries]
(no args = all). Prints one JSON line per section.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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
    sections = set(sys.argv[1:]) or {
        "big_build", "index_build", "dedup", "nsw", "relational", "queries"
    }
    from pyspark.sql import functions as F

    from pyspark_codesearch.pyfiles import ensure_py_files
    from pyspark_codesearch.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_py_files(spark)

    def alu() -> float:
        t0 = time.perf_counter()
        spark.range(0, 1_000_000_000, 1, CPUS * 2).select(
            F.sum(F.hash("id").cast("double"))
        ).collect()
        return round(time.perf_counter() - t0, 3)

    alu()  # warm codegen

    def run_section(name, fn):
        out: dict = {"section": name, "alu_before": alu()}
        t0 = time.perf_counter()
        fn(out)
        out["wall"] = round(time.perf_counter() - t0, 3)
        out["alu_after"] = alu()
        print(json.dumps(out), flush=True)

    def step(out, name, fn):
        spark.sparkContext.setJobDescription(f"{out['section']}: {name}")
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return r

    # ---- route_demo_build breakdown (mirrors bench.py big_build exactly)
    def big_build(out):
        from pyspark_codesearch.corpus import replicated_documents
        from pyspark_codesearch.indexing import (
            build_postings_with_dl,
            build_segments,
            build_term_stats,
            corpus_stats,
        )

        big_docs = replicated_documents(
            spark, SF_DIR, int(os.environ.get("BENCH_BIG_REPLICATE", "128")),
            CPUS * 2, needle_every=5000,
        ).cache()
        n = step(out, "replicate_tokenize_cache", big_docs.count)
        out["n_docs"] = n
        sr = max(1024, n // (CPUS * 2))
        stats_b = step(out, "corpus_stats", lambda: corpus_stats(big_docs))
        post_b = build_postings_with_dl(big_docs).cache()
        out["n_postings"] = step(out, "postings_cache", post_b.count)
        seg_b = build_segments(post_b, stats_b, salt_range=sr).cache()
        out["n_seg_rows"] = step(out, "segments_cache", seg_b.count)
        ts_b = build_term_stats(post_b).cache()
        out["n_terms"] = step(out, "term_stats_cache", ts_b.count)
        for c in (post_b, seg_b, ts_b, big_docs):
            c.unpersist()

    # ---- index_build breakdown (x16; docs cached OUTSIDE like bench.py)
    def index_build(out):
        from pyspark_codesearch.corpus import replicated_documents
        from pyspark_codesearch.indexing import (
            build_postings_with_dl,
            build_segments,
            corpus_stats,
        )

        docs = replicated_documents(spark, SF_DIR, 16, CPUS * 2).cache()
        out["n_docs"] = step(out, "docs_cache_untimed_in_bench", docs.count)
        sr = max(1024, out["n_docs"] // (CPUS * 2))
        stats = step(out, "corpus_stats", lambda: corpus_stats(docs))
        lens = docs.select("doc_id", "doc_len").cache()
        post = build_postings_with_dl(docs).cache()
        out["n_postings"] = step(out, "postings_cache", post.count)
        seg = build_segments(post, stats, salt_range=sr).cache()
        out["n_seg_rows"] = step(out, "segments_cache", seg.count)
        for c in (post, seg, lens, docs):
            c.unpersist()

    def dedup(out):
        from pyspark_codesearch.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        step(out, "signatures_only",
             lambda: minhash_signatures(raw_docs)
             .write.format("noop").mode("overwrite").save())
        out["n_pairs"] = step(
            out, "full_pairs_count", lambda: lsh_candidate_pairs(raw_docs).count()
        )

    def nsw(out):
        import shutil as _sh
        import tempfile as _tf

        from pyspark_codesearch.operators.simsearch import (
            build_nsw_index,
            nsw_topk_indexed,
        )

        nsw_n, dim = 65536, 64

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
            spark.range(nsw_n).repartition(CPUS)
            .mapInPandas(_gen, "vec_id long, embedding array<double>")
            .cache()
        )
        step(out, "synth_cache", synth.count)
        nsw_dir = os.path.join(_tf.gettempdir(), "spark_graft_extra_nsw")
        _sh.rmtree(nsw_dir, ignore_errors=True)
        step(out, "build", lambda: build_nsw_index(synth, nsw_dir, n_partitions=CPUS))
        qs = {
            f"q{i:05d}": np.random.default_rng(i).standard_normal(dim).tolist()
            for i in [1, 7, 1001, 2003, 30007, 40009, 50021, 60013]
        }
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            nsw_topk_indexed(spark, nsw_dir, qs, k=10, ef_search=128).collect()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out["query_best3"] = round(best, 3)
        synth.unpersist()

    def relational(out):
        from pyspark_codesearch.operators.relational import (
            pricing_summary,
            revenue_by_nation,
        )

        for name, fn in (
            ("pricing_summary", lambda: pricing_summary(spark, SF_DIR).collect()),
            ("revenue_by_nation", lambda: revenue_by_nation(spark, SF_DIR).collect()),
        ):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            out[name + "_best3"] = round(best, 3)

    # ---- query sections over the x16 corpus (bm25 exact / wand forced)
    def queries(out):
        from pyspark_codesearch.analysis import tokenize_py
        from pyspark_codesearch.corpus import replicated_documents
        from pyspark_codesearch.engine import search_topk_auto
        from pyspark_codesearch.indexing import (
            build_postings_with_dl,
            build_segments,
            build_term_stats,
            corpus_stats,
        )
        from pyspark_codesearch.scoring import bm25_topk
        from pyspark_codesearch.wand import (
            TermDictionary,
            prepare_lens_by_salt,
            wand_topk,
        )

        docs = replicated_documents(spark, SF_DIR, 16, CPUS * 2).cache()
        n_docs = docs.count()
        sr = max(1024, n_docs // (CPUS * 2))
        stats = corpus_stats(docs)
        doc_lens = docs.select("doc_id", "doc_len").cache()
        post = build_postings_with_dl(docs).cache()
        post.count()
        seg = build_segments(post, stats, salt_range=sr).cache()
        seg.count()
        ts = build_term_stats(post).cache()
        ts.count()
        lens_by_salt = prepare_lens_by_salt(doc_lens, sr)
        lens_by_salt.count()
        td = TermDictionary(ts, seg)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        def bm25_all():
            for q in BENCH_QUERIES:
                dfs, _ = td.lookup(tokenize_py(q))
                bm25_topk(post, doc_lens, ts, stats, q, 10, df_lookup=dfs).collect()

        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            bm25_all()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out["bm25_batch_best4"] = round(best, 3)
        out["bm25_sec_per_query"] = round(best / len(BENCH_QUERIES), 4)
        spark.conf.set("spark.sql.shuffle.partitions", prev)

        def wand_all():
            for q in BENCH_QUERIES:
                dfs, salts = td.lookup(tokenize_py(q))
                wand_topk(
                    seg, doc_lens, ts, stats, q, 10, salt_range=sr,
                    lens_by_salt=lens_by_salt, df_lookup=dfs,
                    salt_lookup=salts, salt_group_factor=16,
                ).collect()

        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            wand_all()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out["wand_batch_best4"] = round(best, 3)
        out["wand_sec_per_query"] = round(best / len(BENCH_QUERIES), 4)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for c in (post, seg, ts, doc_lens, lens_by_salt, docs):
            c.unpersist()

    table = {
        "big_build": big_build,
        "index_build": index_build,
        "dedup": dedup,
        "nsw": nsw,
        "relational": relational,
        "queries": queries,
    }
    for name in ("big_build", "index_build", "dedup", "nsw", "relational", "queries"):
        if name in sections:
            run_section(name, table[name])
    spark.stop()


if __name__ == "__main__":
    main()
