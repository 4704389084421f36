"""Physical-plan contracts: the plans we'd want at 100 TB, asserted.

- no row-at-a-time PythonUDF (BatchEvalPython) anywhere — the north
  rule's "no per-row Python"; only Arrow-vectorized python nodes allowed
- term IN-filter pushed into the parquet scan of a materialized index
- small dims broadcast in the star join
- whole-stage codegen covers the BM25 scoring expression
- bounded top-k planned as TakeOrderedAndProject, never a global sort
"""

import re

import pytest
from pyspark.sql import functions as F

from pyspark_codesearch.corpus import corpus_df, ingest
from pyspark_codesearch.indexing import write_index
from pyspark_codesearch.scoring import bm25_topk


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df) -> str:
    return df._jdf.queryExecution().toString()


FORBIDDEN = "BatchEvalPython"  # row-at-a-time python UDF node


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ix"))
    docs = ingest(corpus_df(spark, 200, seed=9))
    write_index(docs, d, salt_range=64)
    return d


def test_no_per_row_python_in_core_plans(spark, sf_dir):
    from pyspark_codesearch.engine import documents_engine
    from pyspark_codesearch.operators.dedup import lsh_candidate_pairs
    from pyspark_codesearch.operators.textstats import quality_score

    eng = documents_engine(spark, sf_dir)
    plans = [
        plan_str(eng.search("data value", 10)),
        plan_str(eng.search_wand("data value", 10)),
        plan_str(lsh_candidate_pairs(spark.read.parquet(f"{sf_dir}/documents.parquet"))),
        plan_str(quality_score(spark.read.parquet(f"{sf_dir}/documents.parquet"))),
    ]
    for p in plans:
        assert FORBIDDEN not in p


def test_term_filter_pushed_to_parquet_scan(spark, index_dir):
    segs = spark.read.parquet(f"{index_dir}/segments")
    q = segs.filter(F.col("term").isin("parse", "json", "string"))
    p = full_plan(q)
    assert re.search(r"PushedFilters: \[.*[Ii]n\(term", p), p


def test_column_pruning_reaches_scan(spark, index_dir):
    docs = spark.read.parquet(f"{index_dir}/docs")
    q = docs.select("doc_id", "lang")
    p = full_plan(q)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and set(f.split(":")[0] for f in m.group(1).split(",")) == {"doc_id", "lang"}


def test_star_join_broadcasts_dims(spark, sf_dir):
    from pyspark_codesearch.operators.relational import revenue_by_nation

    p = plan_str(revenue_by_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert p.count("BroadcastHashJoin") >= 2  # customer + nation


def test_bm25_plan_shape(spark, index_dir):
    # exact scorer: heap top-k + broadcast + codegen
    docs = ingest(corpus_df(spark, 200, seed=9))
    from pyspark_codesearch.indexing import (
        build_postings,
        build_term_stats,
        corpus_stats,
    )

    po = build_postings(docs)
    q = bm25_topk(po, docs.select("doc_id", "doc_len"), build_term_stats(po),
                  corpus_stats(docs), "parse json string", 10)
    q.collect()  # AQE: codegen spans appear only in the FINAL plan
    p = plan_str(q)
    assert "TakeOrderedAndProject" in p, "top-k must be heap-based, not global sort"
    # '*(N)' operator prefixes mark WholeStageCodegen spans in compact form
    assert re.search(r"\*\(\d+\) (HashAggregate|Project)", p), "scoring must be codegen'd"
    assert FORBIDDEN not in p
    assert "BroadcastHashJoin" in p  # query terms broadcast into postings


def test_bm25_literal_case_carries_only_constants(spark):
    """The literal plan's CASE branches are folded constants — a CASE of
    full BM25 expressions crossed the JIT's 8KB generated-method limit
    at 25-28 branches and silently fell out of compiled codegen (22.8 s
    vs 5.2 s at 24 branches, BENCH/crossover_r7.json). Guard: the
    optimized plan's scoring projection contains no LOG call (idf is
    computed on the driver) and exactly TWO divisions (dl/avgdl and the
    shared tf/(tf+norm) factor — NOT one per branch), at a term count
    beyond the old cliff."""
    from pyspark_codesearch.indexing import (
        build_postings,
        build_term_stats,
        corpus_stats,
    )

    docs = ingest(corpus_df(spark, 200, seed=9))
    po = build_postings(docs)
    # 28 distinct terms, resolved or not — the plan shape is what counts
    terms = [r["term"] for r in build_term_stats(po).limit(28).collect()]
    q = bm25_topk(po, docs.select("doc_id", "doc_len"), build_term_stats(po),
                  corpus_stats(docs), " ".join(terms), 10)
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    proj = next(ln for ln in opt.splitlines() if "CASE WHEN" in ln)
    assert "LOG" not in proj.upper(), proj[:300]
    assert proj.count("/") == 2, proj[:300]


def test_bucketed_ingest_has_no_single_partition_exchange(spark):
    """Scale contract: doc-id assignment must never funnel the corpus
    through one partition. ingest() (dense ids, global row_number) is the
    test-scale reference and DOES — ingest_bucketed must not.

    (r8: restored as its own test — the r7 edit had absorbed this body
    into test_bm25_literal_case_carries_only_constants, so a CASE-plan
    regression would have masked an ingest regression.)"""
    from pyspark_codesearch.corpus import ingest_bucketed

    raw = corpus_df(spark, 200, seed=9)
    assert "Exchange SinglePartition" in plan_str(ingest(raw))  # control
    p = plan_str(ingest_bucketed(raw, n_buckets=32))
    assert "Exchange SinglePartition" not in p, p
    assert FORBIDDEN not in p


def test_delete_by_ids_broadcasts_anti_join(spark, sf_dir):
    """DELETE-by-id must never shuffle the big side: broadcast left-anti."""
    from pyspark_codesearch.operators.merge import delete_by_ids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_str(delete_by_ids(docs, [3, 42, 99], key="doc_id"))
    assert re.search(r"BroadcastHashJoin .*LeftAnti", p), p
    assert "Exchange hashpartitioning" not in p, "big side must not shuffle"


def test_merge_upsert_single_key_shuffle(spark, sf_dir):
    """Keyed MERGE: exactly one hash shuffle on the key (the window);
    no sort-merge join, no cross product."""
    from pyspark_codesearch.operators.merge import merge_upsert

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("doc_id", F.substring("text", 1, 8).alias("payload"))
    delta = base.filter(F.col("doc_id") % 7 == 0)
    p = plan_str(merge_upsert(base, delta, key="doc_id"))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "CartesianProduct" not in p and FORBIDDEN not in p


def test_arrow_udf_nodes_are_vectorized(spark, sf_dir):
    from pyspark_codesearch.operators.textstats import token_counts

    p = plan_str(token_counts(spark.read.parquet(f"{sf_dir}/documents.parquet")))
    assert "ArrowEvalPython" in p  # pandas UDF, Arrow-batched
    assert FORBIDDEN not in p
