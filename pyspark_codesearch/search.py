"""Reference-parity search service — the paper/chunk doc model.

Re-expresses the reference's declared query semantics as ONE DataFrame
plan per request (the reference hand-builds ES JSON DSL, es_indexer.py
:241-397, and post-processes in python, es_search_service.py:103-233):

- multi_match best_fields with per-field boosts (SC1): per-field BM25 on
  per-field statistics, best_fields = MAX over boosted field scores
  (tie_breaker 0), times the clause boost
- bool should-sum + minimum_should_match=1 (SC4): clause scores add;
  rows matching zero clauses are ABSENT (null-preserving columns +
  coalesce-sum, never zero-filled)
- optional cosine clause (SC3): unit vectors => cosine = dot, +1.0 shift
- grouped best-chunk aggregation (A1) replicating ES terms-agg bucket
  semantics exactly: top ``size`` buckets by (doc_count desc, key asc),
  THEN re-sorted by max score (python list.sort is stable in the
  reference, so ties keep bucket order) — SURVEY §7 hard parts
- post-filters author/date/validity AFTER the group-prune (rank parity
  with the reference's over-fetch heuristic), truncation, min-max score
  normalization rounded to 6 (SC6), offset pagination (T4)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analysis import tokenize_py, tokens_col
from .indexing import B, K1
from .scoring import bm25_score_col

SERVICE_FIELDS = {"title": 5.0, "abstract": 3.0, "chunk_text": 0.5}  # es_search_service.py:580-596
INDEXER_FIELDS = {"title": 3.0, "abstract": 2.0, "chunk_text": 1.0}  # es_indexer.py:267-268
BM25_CLAUSE_BOOST = 0.3  # es_indexer.py:276-284


@dataclass
class FieldIndex:
    postings: DataFrame  # (id, term, tf)
    n_docs: int
    avgdl: float
    term_stats: DataFrame  # (term, df)


@dataclass
class MultiFieldIndex:
    """Per-field BM25 indexes over one document table keyed by a string id.

    Per-field statistics follow Lucene: N_f and avgdl_f are computed over
    docs that produced >=1 token for the field.
    """

    spark: SparkSession
    fields: dict[str, FieldIndex] = field(default_factory=dict)

    @classmethod
    def build(cls, docs: DataFrame, id_col: str, field_names: list[str]) -> "MultiFieldIndex":
        idx = cls(docs.sparkSession)
        for f_name in field_names:
            if f_name not in docs.columns:
                continue
            toks = docs.select(
                F.col(id_col).alias("id"), tokens_col(f_name).alias("toks")
            ).filter(F.size("toks") > 0).cache()
            stats_row = toks.agg(
                F.count(F.lit(1)).alias("n"), F.avg(F.size("toks")).alias("avgdl")
            ).collect()[0]
            n_docs = int(stats_row["n"])
            if n_docs == 0:
                continue
            postings = (
                toks.select("id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
                .groupBy("id", "term", "dl")
                .agg(F.count(F.lit(1)).cast("double").alias("tf"))
            ).cache()
            term_stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
            idx.fields[f_name] = FieldIndex(
                postings, n_docs, float(stats_row["avgdl"]), term_stats
            )
        return idx

    def best_fields_scores(
        self,
        query: str,
        boosts: dict[str, float],
        *,
        k1: float = K1,
        b: float = B,
    ) -> DataFrame:
        """(id, score) for docs matching >=1 query term in >=1 field.

        best_fields semantics: score = max over fields of
        boost_f * BM25_f(doc, query) — ES multi_match type=best_fields
        with tie_breaker 0 (es_indexer.py:276-284).
        """
        from collections import Counter

        qterms = Counter(tokenize_py(query))
        per_field = []
        for f_name, fi in self.fields.items():
            if f_name not in boosts or not qterms:
                continue
            qdf = self.spark.createDataFrame(
                [(t, float(c)) for t, c in qterms.items()], "term string, qtf double"
            )
            scored = (
                fi.postings.join(F.broadcast(qdf), "term")
                .join(F.broadcast(qdf.join(fi.term_stats, "term").select("term", "df")), "term")
                .withColumn(
                    "partial",
                    F.col("qtf")
                    * bm25_score_col(
                        F.col("tf"), F.col("df").cast("double"),
                        F.col("dl").cast("double"), fi.n_docs, fi.avgdl, k1, b,
                    ),
                )
                .groupBy("id")
                .agg((F.sum("partial") * F.lit(boosts[f_name])).alias("fscore"))
            )
            per_field.append(scored)
        if not per_field:
            return self.spark.createDataFrame([], "id string, score double")
        u = per_field[0]
        for d in per_field[1:]:
            u = u.unionByName(d)
        return u.groupBy("id").agg(F.max("fscore").alias("score"))


def cosine_clause(
    docs: DataFrame, id_col: str, vec_cols_boosts: dict[str, float], query_vec: list[float]
) -> DataFrame:
    """script_score cosine clause: sum_f boost_f * (cos(qv, v_f) + 1.0).

    Vectors are unit-norm (fake_embedder / reference bge_embedder
    :104-106) so cosine == dot; computed JVM-side via zip_with+aggregate
    (no python). Matches ALL docs (ES match_all, es_indexer.py:288-357).
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    total = None
    for vc, boost in vec_cols_boosts.items():
        dot = F.aggregate(
            F.zip_with(F.col(vc), qv, lambda a, b_: a * b_),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        clause = F.lit(boost) * (dot + F.lit(1.0))
        total = clause if total is None else total + clause
    return docs.select(F.col(id_col).alias("id"), total.alias("score"))


def sum_should_clauses(clauses: list[DataFrame]) -> DataFrame:
    """bool should: scores SUM; minimum_should_match=1 — a doc absent from
    every clause stays absent (outer-union + coalesce-sum, never a zero
    fill for non-matching docs)."""
    out = None
    for c in clauses:
        out = c if out is None else (
            out.withColumnRenamed("score", "s1")
            .join(c.withColumnRenamed("score", "s2"), "id", "outer")
            .select(
                "id",
                (F.coalesce(F.col("s1"), F.lit(0.0)) + F.coalesce(F.col("s2"), F.lit(0.0))).alias("score"),
            )
        )
    return out


def group_best_chunk(
    chunk_hits: DataFrame, chunks: DataFrame, size: int
) -> DataFrame:
    """ES terms-agg on paper_id with max(_score) + top_hits(1) (A1).

    Exact replication of the observable semantics of es_indexer.py
    :376-397 + :405-438: only the top ``size`` buckets by
    (doc_count desc, paper_id asc) survive; survivors are then ordered by
    (max_score desc, doc_count desc, paper_id asc) — the python stable
    re-sort.
    """
    hits = chunk_hits.join(
        chunks.select(F.col("doc_id").alias("id"), "paper_id", "chunk_index", "chunk_text"),
        "id",
    )
    w_best = Window.partitionBy("paper_id").orderBy(F.desc("score"), F.asc("id"))
    per_paper = (
        hits.withColumn("rn", F.row_number().over(w_best))
        .groupBy("paper_id")
        .agg(
            F.count(F.lit(1)).alias("matching_chunks"),
            F.max("score").alias("score"),
            F.max(F.when(F.col("rn") == 1, F.col("chunk_text"))).alias("best_chunk"),
            F.max(F.when(F.col("rn") == 1, F.col("id"))).alias("best_chunk_id"),
        )
    )
    # bucket survival: doc_count desc, key asc, LIMIT size
    survivors = per_paper.orderBy(
        F.desc("matching_chunks"), F.asc("paper_id")
    ).limit(size)
    # stable re-sort by score (ties keep bucket order)
    return survivors.orderBy(
        F.desc("score"), F.desc("matching_chunks"), F.asc("paper_id")
    )


def minmax_normalize(df: DataFrame, score_col: str = "score") -> DataFrame:
    """SC6: over the final result list, (s-min)/(max-min) rounded to 6;
    degenerate all-equal case -> 1.0 (es_search_service.py:534-578)."""
    w = Window.partitionBy()
    mn, mx = F.min(score_col).over(w), F.max(score_col).over(w)
    return df.withColumn(
        score_col,
        F.when(mx == mn, F.lit(1.0)).otherwise(
            F.round((F.col(score_col) - mn) / (mx - mn), 6)
        ),
    )


@dataclass
class SearchService:
    """End-to-end reference-parity search over papers+chunks tables."""

    spark: SparkSession
    papers: DataFrame
    chunks: DataFrame
    chunk_index: MultiFieldIndex = None
    paper_index: MultiFieldIndex = None

    def __post_init__(self):
        if self.chunk_index is None:
            self.chunk_index = MultiFieldIndex.build(
                self.chunks, "doc_id", ["title", "chunk_text"]
            )
        if self.paper_index is None:
            self.paper_index = MultiFieldIndex.build(
                self.papers, "paper_id", ["title", "abstract"]
            )

    def search(
        self,
        query: str,
        max_results: int = 10,
        *,
        mode: str = "fulltext",          # fulltext | hybrid | semantic
        fields: dict[str, float] | None = None,
        author: str | None = None,
        date_from: str | None = None,
        date_to: str | None = None,
        normalize: bool = True,
        query_vec: list[float] | None = None,
    ) -> DataFrame:
        """Flagship chunk-mode search (es_search_service.py:103-233)."""
        fields = fields or SERVICE_FIELDS
        size = max_results * 2  # reference over-fetch, :153
        clauses: list[DataFrame] = []
        if mode in ("fulltext", "hybrid"):
            bm25 = self.chunk_index.best_fields_scores(query, fields)
            boost = BM25_CLAUSE_BOOST if mode == "hybrid" else 1.0
            clauses.append(bm25.withColumn("score", F.col("score") * F.lit(boost)))
        if mode in ("hybrid", "semantic"):
            if query_vec is None:
                from .fake_embedder import embed_py

                query_vec = embed_py(query)
            if "chunk_embedding" in self.chunks.columns:
                clauses.append(
                    cosine_clause(self.chunks, "doc_id", {"chunk_embedding": 1.0}, query_vec)
                )
        hits = sum_should_clauses(clauses)
        grouped = group_best_chunk(hits, self.chunks, size)
        meta_cols = [
            c
            for c in ("title", "authors", "abstract", "publish_date", "categories")
            if c in self.papers.columns
        ]
        enriched = grouped.join(
            F.broadcast(self.papers.select("paper_id", *meta_cols)),
            "paper_id",
            "left",
        )
        # post-filters (P7-P9) AFTER group-prune: rank parity with reference
        if author:
            if "authors" not in meta_cols:
                return enriched.limit(0)
            enriched = enriched.filter(
                F.lower(F.array_join("authors", " ")).contains(author.lower())
            )
        if date_from:
            enriched = enriched.filter(F.col("publish_date") >= date_from)
        if date_to:
            enriched = enriched.filter(F.col("publish_date") <= date_to)
        enriched = enriched.filter(
            F.col("paper_id").isNotNull() & (F.col("title") != "")  # P9 validity
        )
        out = enriched.orderBy(
            F.desc("score"), F.desc("matching_chunks"), F.asc("paper_id")
        ).limit(max_results)
        if normalize:
            out = minmax_normalize(out)
        return out

    def search_papers(self, query: str, max_results: int = 10,
                      fields: dict[str, float] | None = None) -> DataFrame:
        """Paper-doc search: every bucket has doc_count==1, so ES bucket
        survival is PAPER-ID-ORDERED (key asc) before the score re-sort —
        counterintuitive but observable reference semantics (SURVEY §2.4 A1,
        §7); covered by a dedicated test."""
        fields = fields or {k: v for k, v in SERVICE_FIELDS.items() if k != "chunk_text"}
        size = max_results * 2
        scores = self.paper_index.best_fields_scores(query, fields)
        survivors = scores.orderBy(F.asc("id")).limit(size)
        return (
            survivors.withColumnRenamed("id", "paper_id")
            .orderBy(F.desc("score"), F.asc("paper_id"))
            .limit(max_results)
        )

    def find_similar_papers(
        self, paper_id: str, max_results: int = 10, normalize: bool = True
    ) -> DataFrame:
        """Semantic similar-papers (D2 exclude-self; es_search_service.py
        :416-476): embed the reference paper's ``title + ' ' + abstract``,
        semantic-only chunk search over-fetched by +5, drop the reference
        paper itself, truncate to max_results, min-max normalize."""
        ref = (
            self.papers.filter(F.col("paper_id") == paper_id)
            .select("title", "abstract")
            .collect()
        )
        if not ref:
            return self.search("", max_results, mode="semantic").limit(0)
        from .fake_embedder import embed_py

        query_vec = embed_py(f"{ref[0]['title']} {ref[0]['abstract']}")
        out = self.search(
            "", max_results + 5, mode="semantic", normalize=False, query_vec=query_vec
        )
        out = (
            out.filter(F.col("paper_id") != paper_id)
            .orderBy(F.desc("score"), F.desc("matching_chunks"), F.asc("paper_id"))
            .limit(max_results)
        )
        return minmax_normalize(out) if normalize else out

    def get_chunks_for_papers(
        self,
        paper_ids: list[str],
        query: str | None = None,
        max_chunks_per_paper: int = 5,
    ) -> DataFrame:
        """Per-paper chunk top-k (es_search_service.py:339-414): with a
        query, each paper's chunks rank by the single-field chunk_text
        BM25 match (non-matching chunks tie at 0 -> chunk_index order,
        the observable ES bool must+should semantics); without a query,
        plain chunk_index ascending. One windowed plan for ALL papers —
        the reference loops one ES request per paper."""
        sel = self.chunks.filter(F.col("paper_id").isin(list(paper_ids)))
        if query:
            scores = self.chunk_index.best_fields_scores(
                query, {"chunk_text": 1.0}
            ).withColumnRenamed("id", "doc_id")
            sel = sel.join(scores, "doc_id", "left").fillna({"score": 0.0})
            w = Window.partitionBy("paper_id").orderBy(
                F.desc("score"), F.asc("chunk_index")
            )
        else:
            sel = sel.withColumn("score", F.lit(0.0))
            w = Window.partitionBy("paper_id").orderBy(F.asc("chunk_index"))
        return (
            sel.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_chunks_per_paper)
            .select("paper_id", "doc_id", "chunk_index", "chunk_text", "score", "_rn")
            .orderBy("paper_id", "_rn")
            .drop("_rn")
        )

    def get_paper_details(self, paper_id: str) -> DataFrame:
        """Detail stitch (J2/F16): chunk_index-ordered space-join of chunk
        texts + paper metadata preferred over chunk copies
        (es_search_service.py:241-337)."""
        stitched = (
            self.chunks.filter(F.col("paper_id") == paper_id)
            .groupBy("paper_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_index", "chunk_text"))
                        ),
                        lambda s: s["chunk_text"],
                    ),
                    " ",
                ).alias("full_text"),
                F.count(F.lit(1)).alias("n_chunks"),
            )
        )
        return self.papers.filter(F.col("paper_id") == paper_id).join(
            stitched, "paper_id", "left"
        )

    def get_index_stats(self) -> dict:
        """Aggregate index statistics (es_search_service.py:478-530):
        paper/chunk counts, HLL unique-paper cardinality from chunks (A3,
        the fallback when paper docs are absent), and the category
        distribution — the ES terms agg over the categories KEYWORD ARRAY
        (A4: one paper with 2 categories counts in 2 buckets), bucket
        order (doc_count desc, key asc), size 100."""
        total_papers = self.papers.count()
        total_chunks = self.chunks.count()
        unique_from_chunks = int(
            self.chunks.agg(F.approx_count_distinct("paper_id").alias("u")).collect()[0]["u"]
        )
        cats = (
            self.papers.select(F.explode("categories").alias("cat"))
            .groupBy("cat")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("cat"))
            .limit(100)
            .collect()
        )
        out = {
            "total_papers": total_papers if total_papers else unique_from_chunks,
            "total_chunks": total_chunks,
            "category_distribution": {r["cat"]: r["cnt"] for r in cats},
        }
        if out["total_papers"] > 0:
            out["avg_chunks_per_paper"] = round(total_chunks / out["total_papers"], 2)
        return out

    def paginate(self, df: DataFrame, offset: int, limit: int) -> DataFrame:
        """T4 offset pagination over an ordered result."""
        w = Window.partitionBy().orderBy(F.desc("score"), F.asc("paper_id"))
        return (
            df.withColumn("_rank", F.row_number().over(w))
            .filter((F.col("_rank") > offset) & (F.col("_rank") <= offset + limit))
            .drop("_rank")
        )
