"""Unit tests for the reference scalar-function surface (SURVEY §2.8)."""

import base64

import pytest
from pyspark.sql import functions as F

from pyspark_codesearch.functions import (
    arxiv_id_to_publish_date,
    chunk_doc_id,
    decode_base64_images,
    extract_abstract,
    extract_title,
    figure_caption_lines,
    has_images,
    parse_date_or_null,
    sha16,
    split_authors,
    split_categories,
    word_count,
    year_of,
)

MD = """# Attention Is All You Need

some preamble

## Abstract

We propose a new architecture. It is good.

## Introduction

Figure 1: the architecture
![diagram](img.png)
text
fig. 2 shows results
"""


@pytest.fixture(scope="module")
def one(spark):
    def run(col):
        return spark.range(1).select(col.alias("v")).collect()[0]["v"]

    return run


def test_extract_title(one):
    assert one(extract_title(F.lit(MD))) == "Attention Is All You Need"
    assert one(extract_title(F.lit("no title here"))) == ""


def test_extract_abstract(one):
    assert one(extract_abstract(F.lit(MD))) == "We propose a new architecture. It is good."
    assert one(extract_abstract(F.lit("# T\n\nbody"))) == ""


def test_split_authors(one):
    got = one(split_authors(F.lit("Ada Lovelace, Grace Hopper; Alan Turing and Tony Hoare, Li")))
    assert got == ["Ada Lovelace", "Grace Hopper", "Alan Turing", "Tony Hoare"]


def test_split_categories(one):
    assert one(split_categories(F.lit(" cs.CL  cs.IR\ncs.LG "))) == ["cs.CL", "cs.IR", "cs.LG"]


def test_arxiv_id_to_date(one):
    assert str(one(arxiv_id_to_publish_date(F.lit("2301.10000")))) == "2023-01-01"
    assert str(one(arxiv_id_to_publish_date(F.lit("1912.12345")))) == "2019-12-01"
    assert one(arxiv_id_to_publish_date(F.lit("2399.10000"))) is None  # month 99
    assert one(arxiv_id_to_publish_date(F.lit("not-an-id"))) is None


def test_has_images_and_captions(one):
    assert one(has_images(F.lit(MD))) is True
    assert one(has_images(F.lit("plain"))) is False
    caps = one(figure_caption_lines(F.lit(MD)))
    assert caps == ["Figure 1: the architecture", "![diagram](img.png)", "fig. 2 shows results"]


def test_chunk_doc_id(one):
    assert one(chunk_doc_id(F.lit("2301.1"), F.lit(3))) == "2301.1_chunk_3"


def test_word_count(one):
    assert one(word_count(F.lit("  a b   c\nd "))) == 4
    assert one(word_count(F.lit(""))) == 0


def test_parse_date_or_null(one):
    assert one(parse_date_or_null(F.lit("2023-05-01 10:00:00"))) is not None
    assert one(parse_date_or_null(F.lit("garbage"))) is None
    assert one(year_of(parse_date_or_null(F.lit("2023-05-01 10:00:00")))) == 2023


def test_sha16(one):
    import hashlib

    assert one(sha16(F.lit("abc"))) == hashlib.sha256(b"abc").hexdigest()[:16]


def test_decode_base64_images(one):
    payload = base64.b64encode(b"0123456789").decode()
    md = f"![a](data:image/png;base64,{payload}) and ![b](data:image/jpeg;base64,{payload})"
    assert one(decode_base64_images(F.lit(md))) == [10, 10]
