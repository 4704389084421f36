"""High-level engine facade over the driver `documents` table.

Bundles ingest -> index -> query for in-memory use (tests, driver entry,
bench) and exposes the SQL strings the DuckDB oracle runs side-by-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import duckdb_tokens_expr, tokenize_py
from .corpus import ingest_documents_table
from .indexing import B, K1, CorpusStats, build_term_stats, corpus_stats
from .scoring import bm25_topk

# -------------------------------------------------- single-query cost dispatch
# Matched posting volume (sum of df over the query's terms, from the
# resident TermDictionary — zero extra jobs) below which the literal-CASE
# exact scorer is the faster single-query plan. The exact path is ONE
# JVM-only job (IN-filtered postings scan + codegen CASE + top-k heap);
# the WAND cogroup pays a fixed python-scorer dispatch + Arrow round trip
# per query (~0.3-0.5 s on this box) that only block-max pruning over a
# LARGE matched volume can buy back. Measured at sf0.1 (80k docs, warm
# caches, local[32]): exact 0.34-0.43 s/q at sum(df) up to ~2e5 vs WAND
# 0.48-0.86 s/q — the crossover is far above any volume reachable at
# local scale, so the default routes on an absolute posting budget sized
# where decode+score work (~1e6 postings, ~10 ms/1e5 in the JVM) starts
# to rival the dispatch cost WAND would amortize. Both paths are
# rank-identical (tests/test_bm25_rank_identity.py), so routing is purely
# a latency decision.
SEARCH_EXACT_MAX_POSTINGS = 1_000_000


def search_topk_auto(
    postings: DataFrame,
    segments: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    stats: CorpusStats,
    query: str,
    k: int = 10,
    *,
    salt_range: int,
    lens_by_salt: DataFrame | None = None,
    df_lookup: dict[str, int] | None = None,
    salt_lookup: dict[str, tuple[int, ...]] | None = None,
    max_exact_postings: int = SEARCH_EXACT_MAX_POSTINGS,
    wand_salt_group_factor: int = 16,
    impact_scale: float = 1.0,
    route_out: dict | None = None,
) -> DataFrame:
    """Single-query top-k with df-based cost dispatch: the literal exact
    plan when the matched posting volume is small, block-max WAND when a
    heavy term makes pruning worthwhile. ``route_out['route']`` (if a
    dict is passed) records which path planned the query."""
    if df_lookup is None:
        from collections import Counter

        terms = list(Counter(tokenize_py(query)))
        df_lookup = {
            r["term"]: int(r["df"])
            for r in term_stats.filter(F.col("term").isin(terms)).collect()
        }
    matched_volume = sum(df_lookup.values())
    if matched_volume <= max_exact_postings:
        if route_out is not None:
            route_out["route"] = "exact"
            route_out["matched_postings"] = matched_volume
        return bm25_topk(
            postings, doc_lens, term_stats, stats, query, k, df_lookup=df_lookup
        )
    from .wand import wand_topk

    if route_out is not None:
        route_out["route"] = "wand"
        route_out["matched_postings"] = matched_volume
    return wand_topk(
        segments, doc_lens, term_stats, stats, query, k,
        salt_range=salt_range, lens_by_salt=lens_by_salt,
        df_lookup=df_lookup, salt_lookup=salt_lookup,
        impact_scale=impact_scale, salt_group_factor=wand_salt_group_factor,
    )


class DocumentsEngine:
    """BM25 engine over documents.parquet (doc_id, text, lang, source, n_chars)."""

    SALT_RANGE = 128  # small so doc-range salting is exercised at test scale

    def __init__(self, spark: SparkSession, sf_dir: str):
        from .pyfiles import ensure_py_files

        ensure_py_files(spark)  # executors need the package for pandas UDFs
        self.spark = spark
        self.docs = ingest_documents_table(spark, sf_dir).cache()
        # dl-carrying postings: queries skip the doc_lens join entirely
        from .indexing import build_postings_with_dl

        self.postings = build_postings_with_dl(self.docs).cache()
        self.doc_lens = self.docs.select("doc_id", "doc_len").cache()
        self.term_stats = build_term_stats(self.postings)
        self.stats: CorpusStats = corpus_stats(self.docs)
        self._segments = None

    @property
    def segments(self) -> DataFrame:
        if self._segments is None:
            from .indexing import build_postings_with_dl, build_segments

            self._segments = build_segments(
                build_postings_with_dl(self.docs), self.stats, salt_range=self.SALT_RANGE
            ).cache()
        return self._segments

    def search(self, query: str, k: int = 10, round_to: int | None = None) -> DataFrame:
        out = bm25_topk(
            self.postings, self.doc_lens, self.term_stats, self.stats, query, k
        )
        if round_to is not None:
            out = out.select("doc_id", F.round("score", round_to).alias("score"))
        return out

    def search_scores(self, query: str, round_to: int | None = None) -> DataFrame:
        """ALL matching docs' BM25 scores, unordered — for consumers that
        group/rank downstream (e.g. the A1 terms-agg entry)."""
        from .scoring import bm25_scores

        out = bm25_scores(
            self.postings, self.doc_lens, self.term_stats, self.stats, query
        )
        if round_to is not None:
            out = out.select("doc_id", F.round("score", round_to).alias("score"))
        return out

    def _wand_residents(self):
        """Driver-resident query-time side state: pre-partitioned lens and
        a lazily-populated term dictionary (Lucene term-dict analogue).
        The dictionary issues FILTERED lookups per query — no full-vocab
        collect ever happens, so the resident state is bounded by the
        queried vocabulary even on a 10^12-file corpus."""
        from .wand import TermDictionary, prepare_lens_by_salt

        if not hasattr(self, "_lens_by_salt"):
            self._lens_by_salt = prepare_lens_by_salt(self.doc_lens, self.SALT_RANGE)
        if not hasattr(self, "_term_dict"):
            self._term_dict = TermDictionary(self.term_stats, self.segments)
        return self._lens_by_salt, self._term_dict

    def _query_lookups(self, query_text: str):
        from collections import Counter

        from .analysis import tokenize_py

        lens_by_salt, td = self._wand_residents()
        dfs, salts = td.lookup(Counter(tokenize_py(query_text)).keys())
        return lens_by_salt, dfs, salts

    def search_wand(self, query: str, k: int = 10, round_to: int | None = None) -> DataFrame:
        from .wand import wand_topk

        lens_by_salt, df_lookup, salt_lookup = self._query_lookups(query)
        out = wand_topk(
            self.segments, self.doc_lens, self.term_stats, self.stats, query, k,
            salt_range=self.SALT_RANGE, lens_by_salt=lens_by_salt,
            df_lookup=df_lookup, salt_lookup=salt_lookup,
        )
        if round_to is not None:
            out = out.select("doc_id", F.round("score", round_to).alias("score"))
        return out

    def search_best(
        self, query: str, k: int = 10, round_to: int | None = None,
        *, max_exact_postings: int | None = None, route_out: dict | None = None,
    ) -> DataFrame:
        """Cost-dispatched single-query search: min-latency of the two
        rank-identical paths (literal exact vs block-max WAND), routed on
        the matched posting volume from the resident TermDictionary."""
        lens_by_salt, df_lookup, salt_lookup = self._query_lookups(query)
        out = search_topk_auto(
            self.postings, self.segments, self.doc_lens, self.term_stats,
            self.stats, query, k,
            salt_range=self.SALT_RANGE, lens_by_salt=lens_by_salt,
            df_lookup=df_lookup, salt_lookup=salt_lookup,
            max_exact_postings=(
                SEARCH_EXACT_MAX_POSTINGS
                if max_exact_postings is None
                else max_exact_postings
            ),
            route_out=route_out,
        )
        if round_to is not None:
            out = out.select("doc_id", F.round("score", round_to).alias("score"))
        return out

    def search_wand_batch(self, queries: dict[str, str], k: int = 10) -> DataFrame:
        from .wand import wand_topk_batch

        lens_by_salt, df_lookup, salt_lookup = self._query_lookups(" ".join(queries.values()))
        return wand_topk_batch(
            self.segments, self.doc_lens, self.term_stats, self.stats, queries, k,
            salt_range=self.SALT_RANGE, lens_by_salt=lens_by_salt,
            df_lookup=df_lookup, salt_lookup=salt_lookup,
        )


_ENGINE_CACHE: dict[tuple[int, str], DocumentsEngine] = {}


def documents_engine(spark: SparkSession, sf_dir: str) -> DocumentsEngine:
    key = (id(spark), sf_dir)
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE[key] = DocumentsEngine(spark, sf_dir)
    return _ENGINE_CACHE[key]


def bm25_oracle_sql(query: str, k: int = 10, round_to: int = 4,
                    k1: float = K1, b: float = B) -> str:
    """ANSI-SQL BM25 over the `documents` view, runnable by DuckDB.

    Same tokenizer spec (analysis.duckdb_tokens_expr — parity-tested), same
    formula as scoring.bm25_topk; used by __spark_entry__.oracle_sql().
    """
    from collections import Counter

    qterms = Counter(tokenize_py(query))
    if not qterms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    qvals = ", ".join(f"('{t}', {float(c)})" for t, c in sorted(qterms.items()))
    toks = duckdb_tokens_expr("text")
    return f"""
WITH tokd AS (
  SELECT doc_id, {toks} AS toks FROM documents
),
lens AS (
  SELECT doc_id, len(toks)::DOUBLE AS dl FROM tokd
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tokd)
  GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
q(term, qtf) AS (VALUES {qvals}),
scored AS (
  SELECT tf.doc_id,
         sum(q.qtf
             * ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl))) AS score
  FROM tf
  JOIN q USING (term)
  JOIN df USING (term)
  JOIN lens l ON tf.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, {round_to}) AS score
FROM scored
ORDER BY scored.score DESC, doc_id ASC
LIMIT {k}
"""
