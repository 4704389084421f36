"""Tokenizer parity: Column expr == pandas UDF == pure python == DuckDB."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspark_codesearch.analysis import (
    ENGLISH_STOPWORDS,
    duckdb_tokens_expr,
    tokenize_pandas_udf,
    tokenize_py,
    tokenize_series,
    tokens_col,
)

CASES = [
    "parseJsonString(readFileBuffer)",
    "HTTPServer2 handles utf8 and UTF8Decoder",
    "snake_case_name and camelCaseName; the quick brown fox",
    "the a an and of to",          # stopwords only
    "",                            # empty
    "x",                           # single char
    "foo123bar BAZ_QUX 42",
    "def parse_json(s): return json.loads(s)  # the parser",
    "Ünicode–dashes—and\ttabs\nnewlines",
    "a1B2c3 XMLHttpRequest ID3v2",
    "UPPERONLY lowercase MixedCase2You",
    # unicode (UAX#29-approximation: split on non-Letter/Number runs)
    "café Café CAFÉ naïve façade über señor",
    "日本語のテキスト処理 と 漢字123",
    "Москва-сити и Санкт-Петербург",
    "ελληνικά κείμενα και κώδικας",
    "한국어 텍스트 처리",
    "emoji 🚀 rocket · bullet — dash",
    "café NFC vs café NFD",
    "mixedСyrillicLatin Αlpha",
]


def test_unicode_spec():
    # accented Latin survives as one token (was "caf" before round 3)
    assert tokenize_py("café") == ["café"]
    assert tokenize_py("Naïve Façade") == ["naïve", "façade"]
    # non-Latin scripts tokenize instead of vanishing
    assert tokenize_py("日本語のテキスト処理") == ["日本語のテキスト処理"]
    assert tokenize_py("Москва-сити") == ["москва", "сити"]
    assert tokenize_py("ελληνικά κείμενα") == ["ελληνικά", "κείμενα"]
    assert tokenize_py("한국어 텍스트") == ["한국어", "텍스트"]
    # ASCII-digit boundary rules stay ASCII-only: CJK+digits is one token
    assert tokenize_py("漢字123") == ["漢字123"]
    # combining marks are separators (decomposed é splits; NFC é does not)
    assert tokenize_py("café") == ["cafe"]
    # emoji/symbols/punct are separators
    assert tokenize_py("emoji 🚀 rocket") == ["emoji", "rocket"]


def test_pure_python_spec():
    assert tokenize_py("parseJsonString") == ["parse", "json", "string"]
    assert tokenize_py("HTTPServer") == ["http", "server"]
    assert tokenize_py("utf8") == ["utf", "8"]
    assert tokenize_py("snake_case") == ["snake", "case"]
    assert tokenize_py("the and of") == []
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    # stopword dropped post-split: "theParser" -> ["parser"]
    assert tokenize_py("theParser") == ["parser"]


def test_keep_stopwords_flag():
    assert tokenize_py("the parser", keep_stopwords=True) == ["the", "parser"]


@pytest.mark.parametrize("text", CASES)
def test_python_vs_pandas(text):
    got = tokenize_series(pd.Series([text])).iloc[0]
    assert list(got) == tokenize_py(text)


def test_python_vs_duckdb():
    con = duckdb.connect()
    con.register("cases", pd.DataFrame({"i": range(len(CASES)), "t": CASES}))
    expr = duckdb_tokens_expr("t")
    rows = con.execute(f"SELECT i, {expr} AS toks FROM cases ORDER BY i").fetchall()
    for i, got in rows:
        assert list(got) == tokenize_py(CASES[i]), CASES[i]


def test_python_vs_spark_column(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i int, t string")
    rows = df.select("i", tokens_col("t").alias("toks")).orderBy("i").collect()
    for r in rows:
        assert list(r["toks"]) == tokenize_py(CASES[r["i"]])


def test_python_vs_spark_pandas_udf(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i int, t string")
    tok = tokenize_pandas_udf()
    rows = df.select("i", tok("t").alias("toks")).orderBy("i").collect()
    for r in rows:
        assert list(r["toks"]) == tokenize_py(CASES[r["i"]])


def test_stopword_list_is_lucene_english():
    assert len(ENGLISH_STOPWORDS) == 33
    assert "the" in ENGLISH_STOPWORDS and "with" in ENGLISH_STOPWORDS
