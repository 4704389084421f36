"""Reference-parity search layer vs pure-python oracle: multi_match
best_fields + boosts, bool-sum, ES terms-agg bucket semantics, post-
filters, min-max normalization, paper-mode key-ordered bucket survival."""

import pytest
from pyspark.sql import functions as F

from pyspark_codesearch.fake_embedder import embed_py
from pyspark_codesearch.oracle_search import SearchOracle
from pyspark_codesearch.papers import generate_papers, papers_tables
from pyspark_codesearch.search import SearchService

QUERIES = [
    "transformer attention mechanism",
    "transformer models",
    "graph embedding",
    "query optimization index",
    "sparse retrieval",
    "study 3",
]


@pytest.fixture(scope="module")
def svc(spark):
    papers, chunks = papers_tables(spark, n_papers=20, seed=11)
    # attach deterministic chunk embeddings for hybrid mode
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def emb(s):
        from pyspark_codesearch.fake_embedder import embed_pandas

        return embed_pandas(s)

    chunks = chunks.withColumn("chunk_embedding", emb("chunk_text"))
    return SearchService(spark, papers.cache(), chunks.cache())


@pytest.fixture(scope="module")
def oracle():
    p, c = generate_papers(20, seed=11)
    return SearchOracle(p, c)


@pytest.mark.parametrize("query", QUERIES)
def test_fulltext_rank_identity(svc, oracle, query):
    got = svc.search(query, 10, normalize=False).collect()
    exp = oracle.search(query, 10, normalize=False)
    assert [r["paper_id"] for r in got] == [r["paper_id"] for r in exp], query
    for g, e in zip(got, exp):
        assert g["score"] == pytest.approx(e["score"], abs=1e-9)
        assert g["matching_chunks"] == e["matching_chunks"]
        assert g["best_chunk_id"] == e["best_chunk_id"]


@pytest.mark.parametrize("query", QUERIES[:3])
def test_hybrid_rank_identity(svc, oracle, query):
    got = svc.search(query, 10, mode="hybrid", normalize=False).collect()
    exp = oracle.search(query, 10, mode="hybrid", normalize=False)
    assert [r["paper_id"] for r in got] == [r["paper_id"] for r in exp], query
    for g, e in zip(got, exp):
        assert g["score"] == pytest.approx(e["score"], abs=1e-9)


def test_normalization(svc, oracle):
    q = "transformer attention mechanism"
    got = svc.search(q, 10).collect()
    exp = oracle.search(q, 10)
    assert [r["paper_id"] for r in got] == [r["paper_id"] for r in exp]
    for g, e in zip(got, exp):
        assert g["score"] == pytest.approx(e["score"], abs=1e-6)
    scores = [r["score"] for r in got]
    assert max(scores) == 1.0
    if len(set(scores)) > 1:
        assert min(scores) == 0.0


def test_normalization_spread(svc, oracle):
    # a query with non-degenerate score spread exercises the (s-min)/(max-min) path
    q = "query optimization index"
    got = svc.search(q, 10).collect()
    exp = oracle.search(q, 10)
    scores = [r["score"] for r in got]
    assert len(set(scores)) > 1, "fixture should produce a score spread"
    assert max(scores) == 1.0 and min(scores) == 0.0
    for g, e in zip(got, exp):
        assert g["score"] == pytest.approx(e["score"], abs=1e-6)


def test_author_and_date_filters(svc, oracle):
    q = "transformer attention mechanism"
    got = svc.search(q, 10, author="lovelace", normalize=False).collect()
    exp = oracle.search(q, 10, author="lovelace", normalize=False)
    assert [r["paper_id"] for r in got] == [r["paper_id"] for r in exp]
    got = svc.search(q, 10, date_from="2023-03-01", date_to="2023-09-30", normalize=False).collect()
    exp = oracle.search(q, 10, date_from="2023-03-01", date_to="2023-09-30", normalize=False)
    assert [r["paper_id"] for r in got] == [r["paper_id"] for r in exp]


def test_paper_mode_bucket_survival(svc, oracle):
    """doc_count==1 buckets -> survival is key-ordered BEFORE score sort
    (SURVEY §7); with max_results small enough this is observable."""
    q = "transformer attention mechanism"
    got = svc.search_papers(q, 3).collect()
    exp = oracle.search_papers(q, 3)
    assert [(r["paper_id"], round(r["score"], 9)) for r in got] == [
        (p, round(s, 9)) for p, s in exp
    ]


def test_semantic_mode(svc, oracle):
    q = "graph neural network"
    got = svc.search(q, 5, mode="semantic", normalize=False).collect()
    exp = oracle.search(q, 5, mode="semantic", normalize=False)
    assert [r["paper_id"] for r in got] == [r["paper_id"] for r in exp]


def test_detail_stitch(svc, spark):
    row = svc.get_paper_details("2301.10000").collect()[0]
    assert row["n_chunks"] >= 3
    chunks = (
        svc.chunks.filter(F.col("paper_id") == "2301.10000")
        .orderBy("chunk_index")
        .select("chunk_text")
        .collect()
    )
    assert row["full_text"] == " ".join(c["chunk_text"] for c in chunks)


def test_pagination(svc):
    q = "transformer attention mechanism"
    full = svc.search(q, 10, normalize=False)
    page1 = svc.paginate(full, 0, 3).collect()
    page2 = svc.paginate(full, 3, 3).collect()
    all_rows = full.orderBy(F.desc("score"), F.asc("paper_id")).collect()
    assert [r["paper_id"] for r in page1] == [r["paper_id"] for r in all_rows[:3]]
    assert [r["paper_id"] for r in page2] == [r["paper_id"] for r in all_rows[3:6]]


def test_stopword_only_query_empty(svc):
    assert svc.search("the and of", 10, normalize=False).count() == 0


def test_get_index_stats_category_distribution(svc):
    """A4 over the categories keyword ARRAY: multi-category papers count
    once per category (ES terms-agg semantics), bucket order preserved."""
    from collections import Counter

    from pyspark_codesearch.papers import generate_papers

    p, c = generate_papers(20, seed=11)
    exp = Counter(cat for cats in p["categories"] for cat in cats)
    got = svc.get_index_stats()
    assert got["total_papers"] == 20
    assert got["total_chunks"] == len(c)
    assert got["category_distribution"] == dict(exp)
    # ES bucket order: doc_count desc, key asc
    items = list(got["category_distribution"].items())
    assert items == sorted(items, key=lambda kv: (-kv[1], kv[0]))
    assert got["avg_chunks_per_paper"] == round(len(c) / 20, 2)


def test_find_similar_papers_rank_identity(svc, oracle):
    """D2: embed title+abstract, semantic-only, exclude self, +5 over-fetch,
    normalize (reference es_search_service.py:416-476)."""
    pid = "2301.10000"
    got = svc.find_similar_papers(pid, 5).collect()
    exp = oracle.find_similar_papers(pid, 5)
    assert len(got) > 0, "similar-papers must be non-vacuous on the fixture"
    assert all(r["paper_id"] != pid for r in got), "self must be excluded"
    assert [r["paper_id"] for r in got] == [r["paper_id"] for r in exp]
    for g, e in zip(got, exp):
        assert g["score"] == pytest.approx(e["score"], abs=1e-6)


def test_find_similar_papers_missing_ref(svc):
    assert svc.find_similar_papers("nope.99999", 5).count() == 0


def test_get_chunks_for_papers_with_query(svc, oracle):
    pids = ["2301.10000", "2301.10003", "2301.10007"]
    q = "transformer attention mechanism"
    got = svc.get_chunks_for_papers(pids, query=q, max_chunks_per_paper=3).collect()
    exp = oracle.get_chunks_for_papers(pids, query=q, max_chunks_per_paper=3)
    by_pid: dict[str, list] = {}
    for r in got:
        by_pid.setdefault(r["paper_id"], []).append(r)
    assert sorted(by_pid) == sorted(pids)
    assert any(r["score"] > 0 for r in got), "query must match some chunk"
    for pid in pids:
        g = by_pid[pid]
        e = exp[pid]
        assert [r["doc_id"] for r in g] == [c.doc_id for c, _ in e]
        for gr, (_, es) in zip(g, e):
            assert gr["score"] == pytest.approx(es, abs=1e-9)


def test_get_chunks_for_papers_no_query(svc, oracle):
    pids = ["2301.10000", "2301.10001"]
    got = svc.get_chunks_for_papers(pids, max_chunks_per_paper=4).collect()
    exp = oracle.get_chunks_for_papers(pids, max_chunks_per_paper=4)
    by_pid: dict[str, list] = {}
    for r in got:
        by_pid.setdefault(r["paper_id"], []).append(r)
    for pid in pids:
        # no query -> chunk_index ascending
        idxs = [r["chunk_index"] for r in by_pid[pid]]
        assert idxs == sorted(idxs)
        assert [r["doc_id"] for r in by_pid[pid]] == [c.doc_id for c, _ in exp[pid]]


def test_a1_driver_entry_prune_then_resort_bites(spark, sf_dir):
    """The a1_bucket_order_best_chunk driver entry exercises the
    counterintuitive ES terms-agg order for real: per-source match counts
    VARY, and the surviving bucket set differs from a plain
    top-size-by-score selection (a high-scoring group is pruned by a more
    prolific one)."""
    from pyspark_codesearch.entry_queries import (
        _A1_QUERY,
        _A1_SIZE,
        a1_bucket_order_best_chunk,
    )
    from pyspark_codesearch.engine import documents_engine
    from pyspark_codesearch.search import group_best_chunk
    from pyspark.sql import functions as F

    rows = a1_bucket_order_best_chunk(spark, sf_dir).collect()
    assert len(rows) == _A1_SIZE
    counts = {r["matching_chunks"] for r in rows}
    assert len(counts) > 1, "query must produce varied per-source counts"

    # unpruned grouping -> what a naive top-by-score would keep
    eng = documents_engine(spark, sf_dir)
    hits = eng.search_scores(_A1_QUERY, round_to=12).withColumnRenamed("doc_id", "id")
    chunks = eng.docs.select(
        "doc_id", F.col("source").alias("paper_id"),
        F.lit(0).alias("chunk_index"), F.col("content").alias("chunk_text"),
    )
    all_groups = group_best_chunk(hits, chunks, size=10**6).collect()
    by_score = sorted(
        all_groups, key=lambda r: (-r["score"], -r["matching_chunks"], r["paper_id"])
    )[:_A1_SIZE]
    assert {r["source"] for r in rows} != {r["paper_id"] for r in by_score}
