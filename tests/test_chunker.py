"""Chunker semantics (reference document_chunker.py behavior, FIXTURES §5)."""

from pyspark.sql import functions as F

from pyspark_codesearch.chunker import (
    chunk_docs,
    chunk_text_py,
    count_tokens,
    split_markdown_sections,
    split_sentences,
)

# the reference's own fixture doc (document_chunker.py:285-306)
TEST_DOC = """
# Introduction

Natural language processing has evolved significantly over the past decade.
The introduction of transformer models marked a paradigm shift in how we approach language understanding tasks.

## Background

BERT, or Bidirectional Encoder Representations from Transformers, revolutionized NLP by introducing bidirectional training.
This approach allows the model to understand context from both directions, leading to superior performance on various tasks.

## Methodology

Our approach combines the strengths of BERT with task-specific fine-tuning.
We utilize a multi-layer architecture with attention mechanisms to capture long-range dependencies.
The model is trained on a large corpus of scientific texts.

## Results

Experimental results demonstrate significant improvements over baseline models.
We achieve state-of-the-art performance on multiple benchmarks.
"""


def test_sentence_split():
    s = split_sentences("First sentence. Second one! Third? And fourth. but lowercase stays")
    assert s == [
        "First sentence.",
        "Second one!",
        "Third?",
        "And fourth. but lowercase stays",
    ]


def test_markdown_sections():
    secs = split_markdown_sections(TEST_DOC)
    titles = [t for t, _ in secs]
    assert titles == ["", "Introduction", "Background", "Methodology", "Results"]
    assert split_markdown_sections("no headers here") == [("", "no headers here")]


def test_chunk_indexes_sequential_and_sections_respected():
    chunks = chunk_text_py(TEST_DOC, chunk_size=100, chunk_overlap=20)
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
    assert all(c["token_count"] > 0 for c in chunks)
    # section prefixes appear (## Title\n\n carried into chunk text)
    assert any(c["text"].startswith("## Background") for c in chunks)


def test_overlap_carry():
    # small size forces multiple chunks per section; with overlap>0 the
    # last sentence of chunk i reappears at the start of chunk i+1
    text = ". ".join(f"Sentence number {i} has several words here" for i in range(20)) + "."
    chunks = chunk_text_py(text, chunk_size=30, chunk_overlap=15)
    assert len(chunks) > 2
    for a, b in zip(chunks, chunks[1:]):
        last_sent = split_sentences(a["text"])[-1]
        assert b["text"].startswith(last_sent.split(".")[0][:20])


def test_oversize_sentence_truncated():
    long_sent = "A" + "b" * 5000 + " end."
    chunks = chunk_text_py(long_sent, chunk_size=100, chunk_overlap=10)
    assert chunks[0]["text"] == long_sent[: 100 * 4]
    assert len(chunks[0]["text"]) == 400


def test_empty_and_none():
    assert chunk_text_py("") == []
    assert chunk_text_py("   \n  ", chunk_size=10, chunk_overlap=0) == []


def test_deterministic():
    a = chunk_text_py(TEST_DOC, 100, 20)
    b = chunk_text_py(TEST_DOC, 100, 20)
    assert a == b


def test_spark_chunk_docs_matches_python(spark):
    df = spark.createDataFrame(
        [("p1", TEST_DOC), ("p2", "Short doc. Only one chunk here."), ("p3", "")],
        "paper_id string, content string",
    )
    got = (
        chunk_docs(df, chunk_size=100, chunk_overlap=20)
        .orderBy("id", "chunk_index")
        .collect()
    )
    exp = []
    for pid, text in [("p1", TEST_DOC), ("p2", "Short doc. Only one chunk here."), ("p3", "")]:
        for c in chunk_text_py(text, 100, 20):
            exp.append((pid, c["chunk_index"], c["text"], c["start_pos"], c["end_pos"], c["token_count"]))
    assert [
        (r["id"], r["chunk_index"], r["chunk_text"], r["chunk_start"], r["chunk_end"], r["token_count"])
        for r in got
    ] == exp
    # deterministic doc ids
    assert got[0]["doc_id"] == "p1_chunk_0"


def test_token_count_fallback_deterministic():
    assert count_tokens("hello world") == count_tokens("hello world")
    assert count_tokens("") == 0
    assert count_tokens("a") == 1
    # cl100k pre-tokenizer pieces: "a" + ",b" (a single leading
    # non-letter merges into the following word piece — exact reference
    # segmentation); each short piece estimates to one token
    assert count_tokens("a,b") == 2
    assert count_tokens("a , b") == 3
    # 1-3 digit runs are true single tokens in cl100k
    assert count_tokens("123456") == 2
    # contraction suffixes are true single tokens
    assert count_tokens("it's") == 2
