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
    # unicode (UAX#29-style: split on non-Letter/Number runs + CJK rules)
    "caf\u00e9 Caf\u00e9 CAF\u00c9 na\u00efve fa\u00e7ade \u00fcber se\u00f1or",
    "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u51e6\u7406 \u3068 \u6f22\u5b57123",
    "\u041c\u043e\u0441\u043a\u0432\u0430-\u0441\u0438\u0442\u0438 \u0438 \u0421\u0430\u043d\u043a\u0442-\u041f\u0435\u0442\u0435\u0440\u0431\u0443\u0440\u0433",
    "\u03b5\u03bb\u03bb\u03b7\u03bd\u03b9\u03ba\u03ac \u03ba\u03b5\u03af\u03bc\u03b5\u03bd\u03b1",
    "\ud55c\uad6d\uc5b4 \ud14d\uc2a4\ud2b8 \ucc98\ub9ac",
    "emoji \U0001f680 rocket \u00b7 bullet \u2014 dash",
    "caf\u00e9 NFC vs cafe\u0301 NFD",
    "mixed\u0421yrillicLatin \u0391lpha",
    # CJK segmentation + NFC (round 4)
    "wifi\u30ef\u30a4\u30d5\u30a1\u30a4123 \u3068 \u30e2\u30d0\u30a4\u30eb\ud55c\uad6d",
    "x\U00020000\U00020001y supplementary \U0002A6A5",
    "\u3072\u3089\u304c\u306a\u3068\u30ab\u30bf\u30ab\u30ca\u306e\u6df7\u5728\u30c6\u30ad\u30b9\u30c8",
    "\ud55c\uad6d\uc5b4\uc870\uc0ac\uc5c6\uc774 jamo\u1100\u1101 compat\u3131\u3134",
    "cafe\u0301 mixed with caf\u00e9 forms",
    "\u30ac\u30ae\u30b0\u30b2\u30b4 voiced \u304b\u3099 composed \u304c",
    # ideographic iteration marks (round 5): per-char like Han
    "\u4f50\u3005\u6728 \u6642\u3005 \u3007\u3005abc \u301c\u303b",
]


def test_unicode_spec():
    # accented Latin survives as one token (was "caf" before round 3)
    assert tokenize_py("caf\u00e9") == ["caf\u00e9"]
    assert tokenize_py("Na\u00efve Fa\u00e7ade") == ["na\u00efve", "fa\u00e7ade"]
    # NFC normalization (round 4): decomposed == precomposed, byte-identical
    assert tokenize_py("cafe\u0301") == tokenize_py("caf\u00e9") == ["caf\u00e9"]
    # CJK segmentation (round 4, ES standard / UAX#29 style):
    # Han + Hiragana per character, Katakana and Hangul runs chained
    assert tokenize_py("\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u51e6\u7406") == [
        "\u65e5", "\u672c", "\u8a9e", "\u306e", "\u30c6\u30ad\u30b9\u30c8",
        "\u51e6", "\u7406",
    ]
    assert tokenize_py("\u6f22\u5b57123") == ["\u6f22", "\u5b57", "123"]
    assert tokenize_py("wifi\u30ef\u30a4\u30d5\u30a1\u30a4123") == [
        "wifi", "\u30ef\u30a4\u30d5\u30a1\u30a4", "123"
    ]
    assert tokenize_py("\ubaa8\ubc14\uc77cwifi") == ["\ubaa8\ubc14\uc77c", "wifi"]
    # supplementary-plane Han segments per character too
    assert tokenize_py("x\U00020000\U00020001y") == [
        "x", "\U00020000", "\U00020001", "y"
    ]
    # decomposed hiragana voicing mark composes first (ka + combining
    # voiced mark -> GA), then segments per character
    assert tokenize_py("\u304b\u3099\u304d") == ["\u304c", "\u304d"]
    # non-Latin scripts tokenize instead of vanishing
    assert tokenize_py("\u041c\u043e\u0441\u043a\u0432\u0430-\u0441\u0438\u0442\u0438") == ["\u043c\u043e\u0441\u043a\u0432\u0430", "\u0441\u0438\u0442\u0438"]
    assert tokenize_py("\ud55c\uad6d\uc5b4 \ud14d\uc2a4\ud2b8") == ["\ud55c\uad6d\uc5b4", "\ud14d\uc2a4\ud2b8"]
    # ideographic iteration marks 々 〇 〻 segment per-char like Han
    assert tokenize_py("\u4f50\u3005\u6728") == ["\u4f50", "\u3005", "\u6728"]
    assert tokenize_py("\u3005abc\u3007") == ["\u3005", "abc", "\u3007"]
    # emoji/symbols/punct are separators
    assert tokenize_py("emoji \U0001f680 rocket") == ["emoji", "rocket"]


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
