"""Profile per-query WAND variants at bench scale (throwaway diagnostics).

Usage: python scripts/profile_wand.py [variant ...]
Variants: base nolookup noaqe few_parts
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_codesearch.analysis import tokenize_py
from pyspark_codesearch.corpus import replicated_documents
from pyspark_codesearch.indexing import (
    build_postings_with_dl,
    build_segments,
    build_term_stats,
    corpus_stats,
)
from pyspark_codesearch.pyfiles import ensure_py_files
from pyspark_codesearch.session import get_spark
from pyspark_codesearch.wand import TermDictionary, prepare_lens_by_salt, wand_topk

QUERIES = [
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
    spark = get_spark("profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_py_files(spark)

    docs = replicated_documents(spark, sf_dir, 16, int(cpus) * 2).cache()
    n_docs = docs.count()
    salt_range = max(1024, n_docs // (int(cpus) * 2))
    stats = corpus_stats(docs)
    doc_lens = docs.select("doc_id", "doc_len").cache()
    postings = build_postings_with_dl(docs).cache()
    postings.count()
    segments = build_segments(postings, stats, salt_range=salt_range).cache()
    segments.count()
    term_stats = build_term_stats(postings).cache()
    term_stats.count()
    lens_by_salt = prepare_lens_by_salt(doc_lens, salt_range)
    lens_by_salt.count()
    td = TermDictionary(term_stats, segments)
    td.lookup({t for q in QUERIES for t in tokenize_py(q)})  # warm

    def run(tag, **kw):
        for rep in range(3):
            t0 = time.perf_counter()
            for q in QUERIES:
                dfs, salts = td.lookup(tokenize_py(q))
                wand_topk(
                    segments, doc_lens, term_stats, stats, q, 10,
                    salt_range=salt_range, lens_by_salt=lens_by_salt,
                    df_lookup=dfs, salt_lookup=salts, **kw,
                ).collect()
            el = time.perf_counter() - t0
            print(f"{tag:12s} rep{rep}: {el:.3f}s  ({el/len(QUERIES):.3f}/q)")

    variants = sys.argv[1:] or ["base"]
    for v in variants:
        if v == "base":
            run("base")
        elif v == "nolookup":
            # no salt pruning / no lens reuse (r1-ish shape)
            for rep in range(3):
                t0 = time.perf_counter()
                for q in QUERIES:
                    wand_topk(
                        segments, doc_lens, term_stats, stats, q, 10,
                        salt_range=salt_range,
                    ).collect()
                el = time.perf_counter() - t0
                print(f"nolookup     rep{rep}: {el:.3f}s  ({el/len(QUERIES):.3f}/q)")
        elif v == "noaqe":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            run("noaqe")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        elif v == "few_parts":
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            run("few_parts")
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()


if __name__ == "__main__":
    main()
