"""Registry backing __spark_entry__.queries() / oracle_sql().

Every implemented operator from SURVEY.md §2 gets (a) a Spark callable
(spark, sf_dir) -> DataFrame and (b) where SQL-expressible, a DuckDB oracle
SQL string over the driver's pre-registered views. Register with
:func:`register` so both dicts stay in sync.

Determinism rules applied to every entry:
- every computed column aliased identically on both sides
- float aggregates rounded to 4 decimals on both sides
- any LIMIT is preceded by a total tie-broken ORDER BY on both sides
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import duckdb_tokens_expr, tokens_col
from .engine import bm25_oracle_sql, documents_engine

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------- BM25 core

# query strings drawn from the documents-table vocabulary (mix of hot
# terms, the rare term "dup", camelCase needing analysis, and a miss)
_BM25_QUERIES = {
    "bm25_topk_scan_merge": ("table scan merge join", 20),
    "bm25_topk_rare_term": ("dup", 15),
    "bm25_topk_mixed_rarity": ("window agg stream dup", 20),
    "bm25_topk_common_term": ("data", 15),
    "bm25_topk_camelcase": ("tableScan mergeJoin the", 20),
    "bm25_topk_with_miss": ("filter zzznotaterm", 10),
}

for _name, (_q, _k) in _BM25_QUERIES.items():

    def _mk(q=_q, k=_k):
        def f(spark: SparkSession, sf_dir: str) -> DataFrame:
            return documents_engine(spark, sf_dir).search(q, k, round_to=4)

        return f

    register(_name, bm25_oracle_sql(_q, _k))(_mk())


# the SAME queries through the compressed-segment block-max WAND path —
# proves the scale path is rank-identical, checked by the same SQL oracle
for _name, (_q, _k) in {
    "bm25_wand_scan_merge": ("table scan merge join", 20),
    "bm25_wand_mixed_rarity": ("window agg stream dup", 20),
}.items():

    def _mk_wand(q=_q, k=_k):
        def f(spark: SparkSession, sf_dir: str) -> DataFrame:
            return documents_engine(spark, sf_dir).search_wand(q, k, round_to=4)

        return f

    register(_name, bm25_oracle_sql(_q, _k))(_mk_wand())


# ------------------------------------------------- analyzer-derived columns

@register(
    "doc_token_stats",
    f"""SELECT doc_id,
               len({duckdb_tokens_expr('text')}) AS n_tokens,
               sha256(text) AS sha
        FROM documents ORDER BY doc_id""",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F12 sha256 + A8 token count, JVM-side expressions only
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(tokens_col("text")).alias("n_tokens"),
            F.sha2("text", 256).alias("sha"),
        )
        .orderBy("doc_id")
    )


@register(
    "term_frequencies_top50",
    f"""SELECT term, count(*) AS cnt
        FROM (SELECT unnest({duckdb_tokens_expr('text')}) AS term FROM documents)
        GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 50""",
)
def term_frequencies_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A9: explode + groupBy + ordered top-n (map-side partial agg)
    return (
        _docs(spark, sf_dir)
        .select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(50)
    )


@register(
    "document_frequencies_top50",
    f"""SELECT term, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest({duckdb_tokens_expr('text')}) AS term FROM documents)
        GROUP BY term ORDER BY df DESC, term ASC LIMIT 50""",
)
def document_frequencies_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A11: df(term) — the BM25 side-table aggregation
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


# ------------------------------------------------------ relational operators

@register(
    "lang_distribution",
    "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang ORDER BY cnt DESC, lang ASC",
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A4-shaped category distribution
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("lang"))
    )


@register(
    "longest_docs_top10",
    "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 10",
)
def longest_docs_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T2/T5: orderBy+limit -> TakeOrderedAndProject (bounded top-k heap)
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "per_lang_top3_longest",
    """SELECT lang, doc_id, n_chars FROM (
         SELECT lang, doc_id, n_chars,
                row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
         FROM documents) t
       WHERE rn <= 3 ORDER BY lang, n_chars DESC, doc_id""",
)
def per_lang_top3_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T6: per-group top-k via window row_number
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        _docs(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", F.desc("n_chars"), "doc_id")
    )
