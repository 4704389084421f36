"""Deterministic paper/chunk fixture corpus (reference doc model).

Mirrors the reference's two-document-kind index (paper + chunk docs,
discriminated by doc_type — es_indexer.py:65-144, built at
ingest_papers.py:380-449): papers carry full metadata, chunks carry
denormalized parent metadata (join avoidance, SURVEY J3). Titles,
abstracts and chunk texts have controlled term overlaps so per-field
boosts and best_fields max are observable (FIXTURES.md §3-4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_TOPICS = [
    "transformer attention mechanism",
    "graph neural network embedding",
    "distributed query optimization",
    "sparse retrieval index compression",
    "reinforcement learning policy gradient",
    "convolutional image segmentation",
    "language model pretraining corpus",
    "vector similarity search pruning",
]
_FILLER = (
    "method results experiments analysis approach model training "
    "evaluation dataset baseline performance novel propose framework"
).split()
_AUTHORS = [
    "Ada Lovelace", "Grace Hopper", "Alan Turing", "Edsger Dijkstra",
    "Barbara Liskov", "Donald Knuth", "Frances Allen", "Tony Hoare",
]
_CATS = ["cs.CL", "cs.IR", "cs.LG", "cs.DB", "cs.CV"]


def generate_papers(n_papers: int = 20, seed: int = 11):
    """-> (papers_pdf, chunks_pdf) pandas frames."""
    rng = np.random.default_rng(seed)
    papers, chunks = [], []
    for i in range(n_papers):
        pid = f"2301.{10000 + i}"
        topic = _TOPICS[i % len(_TOPICS)]
        tw = topic.split()
        title = f"{tw[0].capitalize()} {tw[1]} for {tw[2]} study {i}"
        abstract = (
            f"We study {topic}. "
            + " ".join(rng.choice(_FILLER, 18))
            + f" Our {tw[0]} {tw[1]} approach improves {tw[2]}."
        )
        n_auth = int(rng.integers(1, 4))
        authors = list(rng.choice(_AUTHORS, n_auth, replace=False))
        cats = list(rng.choice(_CATS, int(rng.integers(1, 3)), replace=False))
        date = f"2023-{(i % 12) + 1:02d}-{(i % 27) + 1:02d}"
        n_chunks = int(rng.integers(3, 9))
        papers.append(
            (pid, title, authors, abstract, cats, date, "paper", n_chunks)
        )
        for j in range(n_chunks):
            # chunk j of paper i leans into the topic word j%3 so different
            # chunks win for different query terms
            lean = tw[j % 3]
            text = (
                f"section {j} discusses {lean} "
                + " ".join(rng.choice(_FILLER, int(rng.integers(10, 30))))
                + (f" {topic}" if j == 0 else f" {lean} {lean}")
            )
            chunks.append(
                (
                    f"{pid}_chunk_{j}", pid, j, text,
                    j * 500, j * 500 + len(text), title, date, cats, "chunk",
                )
            )
    papers_pdf = pd.DataFrame(
        papers,
        columns=[
            "paper_id", "title", "authors", "abstract", "categories",
            "publish_date", "doc_type", "total_chunks",
        ],
    )
    chunks_pdf = pd.DataFrame(
        chunks,
        columns=[
            "doc_id", "paper_id", "chunk_index", "chunk_text", "chunk_start",
            "chunk_end", "title", "publish_date", "categories", "doc_type",
        ],
    )
    return papers_pdf, chunks_pdf


PAPERS_SCHEMA = (
    "paper_id string, title string, authors array<string>, abstract string, "
    "categories array<string>, publish_date string, doc_type string, "
    "total_chunks int"
)
CHUNKS_SCHEMA = (
    "doc_id string, paper_id string, chunk_index int, chunk_text string, "
    "chunk_start int, chunk_end int, title string, publish_date string, "
    "categories array<string>, doc_type string"
)


def papers_tables(spark: SparkSession, n_papers: int = 20, seed: int = 11) -> tuple[DataFrame, DataFrame]:
    p, c = generate_papers(n_papers, seed)
    return (
        spark.createDataFrame(p, PAPERS_SCHEMA),
        spark.createDataFrame(c, CHUNKS_SCHEMA),
    )
