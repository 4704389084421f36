#!/usr/bin/env python
"""Capture .explain('formatted') for every query path touched in round 8.

Usage: python capture_plans_r08.py <out_dir> <suffix>
  suffix = 'before' (run with PYTHONPATH at the round-start tree) or
  'after' (HEAD). Writes <out_dir>/<name>_<suffix>.txt.

Uses the x16 bench corpus shape (sf0.1) so the plans match what
bench.py executes; AQE off for the query sections like the bench.
"""

from __future__ import annotations

import os
import sys

OUT = sys.argv[1]
SUFFIX = sys.argv[2]
os.makedirs(OUT, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from pyspark_codesearch.analysis import tokenize_py  # noqa: E402
from pyspark_codesearch.corpus import replicated_documents  # noqa: E402
from pyspark_codesearch.indexing import (  # noqa: E402
    build_postings_with_dl,
    build_segments,
    build_term_stats,
    corpus_stats,
)
from pyspark_codesearch.pyfiles import ensure_py_files  # noqa: E402
from pyspark_codesearch.scoring import bm25_topk, bm25_topk_batch  # noqa: E402
from pyspark_codesearch.session import get_spark  # noqa: E402
from pyspark_codesearch.wand import (  # noqa: E402
    TermDictionary,
    prepare_lens_by_salt,
    wand_topk,
    wand_topk_batch,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("plans_r08", master=f"local[{CPUS}]")
spark.sparkContext.setLogLevel("ERROR")
ensure_py_files(spark)


def dump(name, df):
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(txt)
    print("wrote", name)


# ---- build-path plans (lazy frames, pre-cache)
docs_lazy = replicated_documents(spark, SF, 16, CPUS * 2)
dump("build_replicated_ingest", docs_lazy)

docs = docs_lazy.cache()
n_docs = docs.count()
sr = max(1024, n_docs // (CPUS * 2))
stats = corpus_stats(docs)
doc_lens = docs.select("doc_id", "doc_len").cache()
dump("build_postings", build_postings_with_dl(docs))
post = build_postings_with_dl(docs).cache()
post.count()
dump("build_segments", build_segments(post, stats, salt_range=sr))
seg = build_segments(post, stats, salt_range=sr).cache()
seg.count()
ts = build_term_stats(post).cache()
ts.count()
lens_by_salt = prepare_lens_by_salt(doc_lens, sr)
lens_by_salt.count()
dump("build_lens_by_salt", prepare_lens_by_salt(doc_lens, sr))
td = TermDictionary(ts, seg)

spark.conf.set("spark.sql.adaptive.enabled", "false")
q = "table scan merge join"
dfs, salts = td.lookup(tokenize_py(q))

spark.conf.set("spark.sql.shuffle.partitions", "8")
dump("query_bm25_exact_literal", bm25_topk(post, doc_lens, ts, stats, q, 10, df_lookup=dfs))
qmap = {f"q{i}": s for i, s in enumerate([q, "data value result", "dup"])}
dump("query_bm25_batch_oneplan", bm25_topk_batch(post, doc_lens, ts, stats, qmap, 10))
spark.conf.set("spark.sql.shuffle.partitions", "32")

dump("query_wand_single_G16", wand_topk(
    seg, doc_lens, ts, stats, q, 10, salt_range=sr, lens_by_salt=lens_by_salt,
    df_lookup=dfs, salt_lookup=salts, salt_group_factor=16))
dfs_b, salts_b = td.lookup({t for s in qmap.values() for t in tokenize_py(s)})
dump("query_wand_batch_oneplan", wand_topk_batch(
    seg, doc_lens, ts, stats, qmap, 10, salt_range=sr, lens_by_salt=lens_by_salt,
    df_lookup=dfs_b, salt_lookup=salts_b))
spark.conf.set("spark.sql.adaptive.enabled", "true")

# ---- dedup + NSW + relational
from pyspark_codesearch.operators.dedup import lsh_candidate_pairs, minhash_signatures  # noqa: E402
from pyspark_codesearch.operators.relational import pricing_summary, revenue_by_nation  # noqa: E402

raw_docs = spark.read.parquet(f"{SF}/documents.parquet")
dump("dedup_minhash_signatures", minhash_signatures(raw_docs))
dump("dedup_lsh_candidate_pairs", lsh_candidate_pairs(raw_docs))
dump("relational_pricing_summary", pricing_summary(spark, SF))
dump("relational_revenue_by_nation", revenue_by_nation(spark, SF))

import shutil
import tempfile

import numpy as np  # noqa: E402

from pyspark_codesearch.operators.simsearch import build_nsw_index, nsw_topk_indexed  # noqa: E402


def _gen(batches):
    import pandas as pd

    for pdf in batches:
        ids = pdf["id"].to_numpy()
        vecs = [np.random.default_rng(int(i)).standard_normal(64).tolist() for i in ids]
        yield pd.DataFrame({"vec_id": ids, "embedding": vecs})


synth = (
    spark.range(8192).repartition(CPUS)
    .mapInPandas(_gen, "vec_id long, embedding array<double>").cache()
)
synth.count()
nd = os.path.join(tempfile.gettempdir(), f"plans_r08_nsw_{SUFFIX}")
shutil.rmtree(nd, ignore_errors=True)
build_nsw_index(synth, nd, n_partitions=8)
qs = {f"q{i}": np.random.default_rng(i).standard_normal(64).tolist() for i in (1, 7)}
dump("query_nsw_topk_indexed", nsw_topk_indexed(spark, nd, qs, k=10, ef_search=128))
shutil.rmtree(nd, ignore_errors=True)
spark.stop()
print("done", SUFFIX)
