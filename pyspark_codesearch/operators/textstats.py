"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All JVM-side column expressions with DuckDB
oracles; the BPE-ish counter reuses the chunker's python fallback via a
pandas UDF (python-oracle tested)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import ENGLISH_STOPWORDS, duckdb_tokens_expr, tokens_col

_STOP_SQL = ", ".join(f"'{s}'" for s in ENGLISH_STOPWORDS)


def _stop_ratio_col(text_col: str):
    toks = tokens_col(text_col, keep_stopwords=True)
    stops = F.size(F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in ENGLISH_STOPWORDS])))
    return F.when(F.size(toks) > 0, stops / F.size(toks)).otherwise(F.lit(0.0))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                threshold: float = 0.08) -> DataFrame:
    """Stopword-density heuristic language ID: 'en' vs 'unk'.

    (A real n-gram profile classifier plugs into the same shape; the
    heuristic is the deterministic, oracle-checkable core.)
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(_stop_ratio_col(text_col) > threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("lang_pred"),
        F.round(_stop_ratio_col(text_col), 4).alias("stop_ratio"),
    ).orderBy("doc_id")


def language_id_sql(text_col: str = "text", threshold: float = 0.08) -> str:
    toks = duckdb_tokens_expr(text_col, keep_stopwords=True)
    ratio = f"""(CASE WHEN len({toks}) > 0
        THEN len(list_filter({toks}, t -> t IN ({_STOP_SQL})))::DOUBLE / len({toks})
        ELSE 0.0 END)"""
    return f"""
SELECT doc_id,
       CASE WHEN {ratio} > {threshold} THEN 'en' ELSE 'unk' END AS lang_pred,
       round({ratio}, 4) AS stop_ratio
FROM documents ORDER BY doc_id
"""


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality: length saturation, alnum density, mean token len.

    quality = 0.4*min(n_tokens/64, 1) + 0.3*alnum_ratio
            + 0.3*min(mean_token_len/8, 1), rounded to 4.
    """
    toks = tokens_col(text_col, keep_stopwords=True)
    n_toks = F.size(toks)
    alnum = F.length(F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N}]", ""))
    alnum_ratio = F.when(F.length(text_col) > 0, alnum / F.length(text_col)).otherwise(F.lit(0.0))
    mean_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_toks,
    ).otherwise(F.lit(0.0))
    q = (
        0.4 * F.least(n_toks.cast("double") / 64.0, F.lit(1.0))
        + 0.3 * alnum_ratio
        + 0.3 * F.least(mean_len / 8.0, F.lit(1.0))
    )
    # floor-based half-up rounding: engine-independent on identical doubles
    # (Spark round() and DuckDB round() disagree on exact decimal halves)
    from ..rounding import round_half_up

    q4 = round_half_up(q, 4)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("n_chars"),
        n_toks.alias("n_tokens"),
        q4.alias("quality"),
    ).orderBy("doc_id")


def quality_score_sql(text_col: str = "text") -> str:
    toks = duckdb_tokens_expr(text_col, keep_stopwords=True)
    return f"""
WITH t AS (
  SELECT doc_id, n_chars, {toks} AS toks,
         length(regexp_replace({text_col}, '[^\\p{{L}}\\p{{N}}]', '', 'g'))::DOUBLE AS alnum,
         length({text_col})::DOUBLE AS chars
  FROM documents
)
SELECT doc_id, n_chars, len(toks) AS n_tokens,
       floor((0.4 * least(len(toks)::DOUBLE / 64.0, 1.0)
           + 0.3 * (CASE WHEN chars > 0 THEN alnum / chars ELSE 0.0 END)
           + 0.3 * least((CASE WHEN len(toks) > 0
                 THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
                 ELSE 0.0 END) / 8.0, 1.0)) * 10000.0 + 0.5) / 10000.0 AS quality
FROM t ORDER BY doc_id
"""


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """whitespace tokens, analyzer tokens, BPE-ish subword estimate.

    BPE-ish goes through an Arrow-batched pandas UDF (shares
    chunker.count_tokens with the python oracle)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bpe_ish(s):
        from pyspark_codesearch.chunker import count_tokens

        return s.map(lambda t: count_tokens(t or ""))

    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        F.size(tokens_col(text_col)).alias("analyzer_tokens"),
        bpe_ish(F.col(text_col)).alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set (bag-of-words identity), plus sha256 raw identity."""
    toks = tokens_col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("bow_fp"),
        F.sha2(F.col(text_col), 256).alias("raw_fp"),
    ).orderBy("doc_id")


def fingerprint_sql(text_col: str = "text") -> str:
    toks = duckdb_tokens_expr(text_col)
    return f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({toks})), ' ')) AS bow_fp,
       sha256({text_col}) AS raw_fp
FROM documents ORDER BY doc_id
"""
