"""Tokenizer / analyzer — ONE spec, four implementations, parity-tested.

Semantics (the engine's analyzer, mirroring the reference's declared ES
analyzer ``paper_analyzer`` = standard tokenizer + lowercase + ``_english_``
stopwords — reference data_pipeline/es_indexer.py:69-76 — extended with
code-aware splitting per BASELINE.json input_hint):

1. split CamelCase boundaries      ``fooBar`` -> ``foo Bar``,
                                   ``HTTPServer`` -> ``HTTP Server``
   (ASCII-only by design: camelCase is an ASCII identifier convention)
2. split letter<->digit boundaries ``utf8`` -> ``utf 8``, ``2fa`` -> ``2 fa``
3. lowercase
4. split on any run of characters outside Unicode Letter/Number classes
   (underscores, punctuation, whitespace, symbols, combining marks) —
   the UAX#29-approximation of the reference's ES ``standard`` tokenizer
   (es_indexer.py:69-76): "café" -> ``café``, "Москва-сити" ->
   ``москва``/``сити``, CJK ideograph runs stay one token per run
   (true UAX#29 would segment CJK per character — documented deviation)
5. drop empty tokens and the 33 classic Lucene English stopwords

Implementations (ALL must agree; see tests/test_analysis.py):

- :func:`tokens_col`     — pure Column expression (JVM, whole-stage codegen;
                           the fast path used by the index build)
- :func:`tokenize_pandas_udf` — Arrow-vectorized pandas UDF (the north-rule
                           mandated form; same output)
- :func:`tokenize_py`    — pure python (shared by the rank-identity oracle)
- :func:`duckdb_tokens_expr` — DuckDB SQL snippet (used by oracle_sql())
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# the 33 classic Lucene `_english_` stopwords (reference es_indexer.py:69-76)
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)
_STOP_SET = frozenset(ENGLISH_STOPWORDS)

# (pattern, java_replacement, python/duckdb_replacement)
_BOUNDARY_RULES: tuple[tuple[str, str, str], ...] = (
    (r"([a-z])([A-Z])", r"$1 $2", r"\1 \2"),
    (r"([A-Z]+)([A-Z][a-z])", r"$1 $2", r"\1 \2"),
    (r"([A-Za-z])([0-9])", r"$1 $2", r"\1 \2"),
    (r"([0-9])([A-Za-z])", r"$1 $2", r"\1 \2"),
)
# one split SPEC, two regex dialects (parity-tested across all four impls):
# Java and RE2 express "outside Letter/Number" as [^\p{L}\p{N}]+; python re
# has no \p classes, but \w == Unicode L* + N* + '_' (str.isalnum + _), so
# [\W_]+ is the same character set. Both treat combining marks (Mn) as
# separators — decomposed "café" splits, NFC "café" does not; normalize
# upstream if mixed forms matter.
_SPLIT_PATTERN_JAVA = r"[^\p{L}\p{N}]+"
_SPLIT_PATTERN_PY = r"[\W_]+"


# ---------------------------------------------------------------- column expr
def tokens_col(col: Column | str, *, keep_stopwords: bool = False) -> Column:
    """array<string> of analyzed tokens, as a pure Column expression.

    Stays inside whole-stage codegen — no python boundary. This is the
    index-build hot path.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, java_rep, _ in _BOUNDARY_RULES:
        c = F.regexp_replace(c, pat, java_rep)
    arr = F.split(F.lower(c), _SPLIT_PATTERN_JAVA)
    if keep_stopwords:
        return F.filter(arr, lambda x: x != F.lit(""))
    stop = [F.lit(s) for s in ENGLISH_STOPWORDS]
    return F.filter(arr, lambda x: (x != F.lit("")) & ~x.isin(*stop))


# ---------------------------------------------------------------- pandas UDF
def tokenize_series(s, *, keep_stopwords: bool = False):
    """pandas Series[str] -> Series[list[str]] — vectorized .str ops only."""
    s = s.fillna("")
    for pat, _, py_rep in _BOUNDARY_RULES:
        s = s.str.replace(pat, py_rep, regex=True)
    toks = s.str.lower().str.split(_SPLIT_PATTERN_PY, regex=True)
    if keep_stopwords:
        return toks.map(lambda ts: [t for t in ts if t])
    return toks.map(lambda ts: [t for t in ts if t and t not in _STOP_SET])


def tokenize_pandas_udf():
    """Arrow-vectorized pandas UDF: str -> array<string>."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _tok(s):
        return tokenize_series(s)

    return _tok


# ---------------------------------------------------------------- pure python
_PY_RULES = [(re.compile(p), r) for p, _, r in _BOUNDARY_RULES]
_PY_SPLIT = re.compile(_SPLIT_PATTERN_PY)


def tokenize_py(text: str, *, keep_stopwords: bool = False) -> list[str]:
    """Pure-python implementation — imported by the oracle AND the tests."""
    if not text:
        return []
    for pat, rep in _PY_RULES:
        text = pat.sub(rep, text)
    toks = _PY_SPLIT.split(text.lower())
    if keep_stopwords:
        return [t for t in toks if t]
    return [t for t in toks if t and t not in _STOP_SET]


# ---------------------------------------------------------------- duckdb SQL
def duckdb_tokens_expr(col_sql: str, *, keep_stopwords: bool = False) -> str:
    """DuckDB SQL expression producing the same array<string> of tokens."""
    e = col_sql
    for pat, _, rep in _BOUNDARY_RULES:
        e = f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
    e = f"string_split_regex(lower({e}), '{_SPLIT_PATTERN_JAVA}')"
    if keep_stopwords:
        return f"list_filter({e}, t -> len(t) > 0)"
    stop_list = ", ".join(f"'{s}'" for s in ENGLISH_STOPWORDS)
    return f"list_filter({e}, t -> len(t) > 0 AND t NOT IN ({stop_list}))"
