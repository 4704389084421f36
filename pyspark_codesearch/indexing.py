"""Inverted-index build: tokens -> postings -> compressed block-max segments.

Spark-first design (vs the reference, which delegates all of this to Lucene
inside Elasticsearch — declared by the ES mapping, es_indexer.py:78-143):

  docs(doc_id, tokens, doc_len)
    -> postings(term, doc_id, tf)                 [explode + groupBy]
    -> term_stats(term, df)                       [groupBy, broadcastable]
    -> corpus_stats(n_docs, avgdl)                [2 scalars]
    -> segments(term, salt, block_id, ...)        [salted repartition +
                                                   sortWithinPartitions +
                                                   applyInPandas encoder]

Salting: ``salt = doc_id // salt_range`` (a doc-id RANGE bucket, not a random
salt) so a hot Zipfian term ("return", "data") is split across many shuffle
partitions — defeating build-time skew — while each (term, salt) segment
still holds a contiguous, sorted doc-id run. Query-time merge is therefore a
concatenation in salt order, never a re-sort. AQE skew-join stays on as a
backstop (session.py).

Blocks of 128 postings carry ``block_max_tf`` and ``block_max_impact``
(max of tf/(tf + k1(1-b+b*dl/avgdl))) — the block-max WAND upper bound is
``idf * block_max_impact`` (wand.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codecs import delta_encode, varbyte_encode

BLOCK_SIZE = 128
K1 = 1.2
B = 0.75

SEGMENT_SCHEMA = (
    "term string, salt int, block_id int, n_docs int, first_doc long, "
    "last_doc long, doc_ids_enc binary, tfs_enc binary, "
    "block_max_tf int, block_max_impact double, df long"
)


class CorpusStats(NamedTuple):
    n_docs: int
    avgdl: float


def build_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, tokens) -> (term, doc_id, tf). One shuffle, map-side combined."""
    return (
        docs.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def build_term_stats(postings: DataFrame) -> DataFrame:
    """(term, df). Small relative to postings; broadcast at query time."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(docs: DataFrame) -> CorpusStats:
    row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return CorpusStats(int(row["n"]), float(row["avgdl"] or 0.0))


def build_segments(
    postings: DataFrame,
    doc_lens: DataFrame,
    stats: CorpusStats,
    *,
    salt_range: int = 1 << 20,
    shuffle_partitions: int | None = None,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Compressed block-max segments, salted by doc-id range.

    ``salt_range`` bounds the postings of one (term, salt) group, so even a
    term appearing in EVERY doc of a 10^12-file corpus yields groups of at
    most ``salt_range`` postings (~1M → a few MB decoded) — no single
    reducer ever sees a whole hot posting list.
    """
    avgdl = max(stats.avgdl, 1e-9)
    enriched = (
        postings.join(doc_lens.select("doc_id", "doc_len"), "doc_id")
        .withColumn("salt", (F.col("doc_id") / F.lit(salt_range)).cast("int"))
        .withColumn(
            "impact",
            F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(avgdl))),
        )
    )
    # df is global per term (across salts): window-free two-step — compute
    # once, broadcast-join back (term_stats is ~vocab-sized, and Spark will
    # shuffle-join if it outgrows the broadcast threshold; correct either way)
    term_stats = enriched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    enriched = enriched.join(term_stats, "term")

    parted = enriched.repartition(
        *( [shuffle_partitions] if shuffle_partitions else [] ), "term", "salt"
    ).sortWithinPartitions("term", "salt", "doc_id")

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        df_ = int(pdf["df"].iloc[0])
        ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        imp = pdf["impact"].to_numpy(np.float64)
        out = []
        for b0 in range(0, len(ids), BLOCK_SIZE):
            s = slice(b0, b0 + BLOCK_SIZE)
            bi, bt, bm = ids[s], tfs[s], imp[s]
            out.append(
                (
                    term, salt, b0 // BLOCK_SIZE, len(bi),
                    int(bi[0]), int(bi[-1]),
                    delta_encode(bi), varbyte_encode(bt),
                    int(bt.max()), float(bm.max()), df_,
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "term", "salt", "block_id", "n_docs", "first_doc", "last_doc",
                "doc_ids_enc", "tfs_enc", "block_max_tf", "block_max_impact", "df",
            ],
        )

    return parted.groupBy("term", "salt").applyInPandas(encode_group, SEGMENT_SCHEMA)


def write_index(
    docs: DataFrame,
    out_dir: str,
    *,
    salt_range: int = 1 << 20,
    k1: float = K1,
    b: float = B,
) -> CorpusStats:
    """Materialize the full index (postings segments + doc side tables).

    Segments parquet is sorted by term within files so parquet row-group
    min/max stats prune term lookups (the scan-level analogue of Lucene's
    term dictionary seek); at cluster scale you'd layer a term-hash bucket
    partitioning on top (bucketBy) for static pruning.
    """
    stats = corpus_stats(docs)
    doc_lens = docs.select("doc_id", "doc_len")
    postings = build_postings(docs)
    segs = build_segments(postings, doc_lens, stats, salt_range=salt_range, k1=k1, b=b)
    segs.sortWithinPartitions("term", "salt", "block_id").write.mode("overwrite").parquet(
        f"{out_dir}/segments"
    )
    docs.drop("tokens").write.mode("overwrite").parquet(f"{out_dir}/docs")
    doc_lens.write.mode("overwrite").parquet(f"{out_dir}/doc_lens")
    spark = docs.sparkSession
    spark.createDataFrame(
        [(stats.n_docs, stats.avgdl, k1, b)], "n_docs long, avgdl double, k1 double, b double"
    ).write.mode("overwrite").parquet(f"{out_dir}/stats")
    return stats
