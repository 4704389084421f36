"""Scalar functions from the reference ingest pipeline (SURVEY §2.8),
as pure Column expressions (whole-stage codegen; no python).

Each cites the reference behavior it reproduces (file:line of
/root/reference — studied, not copied).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "extract_title",
    "extract_abstract",
    "split_authors",
    "split_categories",
    "arxiv_id_to_publish_date",
    "has_images",
    "figure_caption_lines",
    "chunk_doc_id",
    "word_count",
    "parse_date_or_null",
    "year_of",
    "sha16",
    "decode_base64_images",
]


def extract_title(md: Column | str) -> Column:
    """First markdown H1: ``^#\\s+(.+)$`` (ingest_papers.py:172-174)."""
    c = F.col(md) if isinstance(md, str) else md
    return F.regexp_extract(c, r"(?m)^#\s+(.+?)\s*$", 1)


def extract_abstract(md: Column | str) -> Column:
    """Abstract section body up to the next header (ingest_papers.py
    :202-209 — DOTALL regex over the '## Abstract' section)."""
    c = F.col(md) if isinstance(md, str) else md
    raw = F.regexp_extract(c, r"(?is)#+\s*abstract\s*\n(.*?)(?:\n#+\s|\Z)", 1)
    # Spark trim() strips spaces only — strip ALL whitespace like python .strip()
    return F.regexp_replace(raw, r"^\s+|\s+$", "")


def split_authors(authors: Column | str) -> Column:
    """Split on ``,``/``;``/`` and `` and keep len>2 entries
    (ingest_papers.py:94-98)."""
    c = F.col(authors) if isinstance(authors, str) else authors
    parts = F.split(c, r",|;|\band\b")
    # explicit 1-arg lambda: transform() hands (element, index) to any
    # callable accepting two args, which turns F.trim into trim(str, trimStr)
    return F.filter(
        F.transform(parts, lambda x: F.trim(x)), lambda x: F.length(x) > 2
    )


def split_categories(cats: Column | str) -> Column:
    """Whitespace split (ingest_papers.py:101-103)."""
    c = F.col(cats) if isinstance(cats, str) else cats
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def arxiv_id_to_publish_date(paper_id: Column | str) -> Column:
    """``YYMM.NNNNN`` -> ``20YY-MM-01`` date (ingest_papers.py:109-114);
    non-matching ids -> null."""
    c = F.col(paper_id) if isinstance(paper_id, str) else paper_id
    yy = F.regexp_extract(c, r"^(\d{2})(\d{2})\.\d{4,5}", 1)
    mm = F.regexp_extract(c, r"^(\d{2})(\d{2})\.\d{4,5}", 2)
    return F.when(
        (yy != "") & (mm.cast("int").between(1, 12)),
        F.to_date(F.concat(F.lit("20"), yy, F.lit("-"), mm, F.lit("-01"))),
    )


def has_images(md: Column | str) -> Column:
    """Markdown contains an image tag ``![`` (ingest_papers.py:164)."""
    c = F.col(md) if isinstance(md, str) else md
    return c.contains("![")


def figure_caption_lines(md: Column | str) -> Column:
    """Lines that look like figure captions (ingest_papers.py:336-344)."""
    c = F.col(md) if isinstance(md, str) else md
    return F.filter(
        F.split(c, r"\n"),
        lambda line: line.rlike(r"(?i)^\s*(figure|fig\.?)\s*\d") | line.startswith("!["),
    )


def chunk_doc_id(paper_id: Column | str, chunk_index: Column | str) -> Column:
    """Deterministic chunk id ``{pid}_chunk_{i}`` (es_indexer.py:179)."""
    p = F.col(paper_id) if isinstance(paper_id, str) else paper_id
    i = F.col(chunk_index) if isinstance(chunk_index, str) else chunk_index
    return F.concat_ws("_chunk_", p, i.cast("string"))


def word_count(text: Column | str) -> Column:
    """``len(content.split())`` (ingest_papers.py:311)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(F.split(c, r"\s+"), lambda x: x != ""))


def parse_date_or_null(s: Column | str, fmt: str | None = None) -> Column:
    """pandas ``to_datetime(errors=coerce)`` analogue
    (arxiv_nlp_pipeline.py:273-280): unparseable -> null, never error."""
    c = F.col(s) if isinstance(s, str) else s
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)


def year_of(ts: Column | str) -> Column:
    return F.year(F.col(ts) if isinstance(ts, str) else ts)


def sha16(c: Column | str) -> Column:
    """sha256 16-hex prefix — image identity (ingestion_service.py:258)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.substring(F.sha2(col, 256), 1, 16)


def decode_base64_images(md: Column | str) -> Column:
    """Extract embedded-base64 image payload sizes: the Spark-side shape
    of the reference's base64 decode + rewrite (ingestion_service.py
    :246-298). Returns array<int> of decoded byte lengths."""
    c = F.col(md) if isinstance(md, str) else md
    b64s = F.regexp_extract_all(c, F.lit(r"data:image/[a-z]+;base64,([A-Za-z0-9+/=]+)"), F.lit(1))
    return F.transform(b64s, lambda s: F.length(F.unbase64(s)))
