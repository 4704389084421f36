"""Checkpoint/resume: killed build resumes, output identical (FIXTURES §8)."""

import os

import pytest

from pyspark_codesearch.codecs import delta_decode, varbyte_decode
from pyspark_codesearch.corpus import corpus_df, ingest
from pyspark_codesearch.lineage import (
    BuildInterrupted,
    build_index_resumable,
    load_segments,
    read_metrics,
    unit_done,
)

N_DOCS = 200


@pytest.fixture(scope="module")
def docs(spark):
    return ingest(corpus_df(spark, N_DOCS, seed=3, n_partitions=8)).cache()


def _decode_all(rows):
    out = {}
    for r in sorted(rows, key=lambda r: (r["term"], r["salt"], r["block_id"])):
        ids = delta_decode(r["doc_ids_enc"]).tolist()
        tfs = varbyte_decode(r["tfs_enc"]).tolist()
        out.setdefault(r["term"], []).extend(zip(ids, tfs))
    return out


def test_kill_and_resume_identical(spark, docs, tmp_path_factory):
    clean_dir = str(tmp_path_factory.mktemp("clean"))
    resumed_dir = str(tmp_path_factory.mktemp("resumed"))

    res_clean = build_index_resumable(docs, clean_dir, n_buckets=4)
    assert res_clean["executed_units"] == 3 + 4  # docs, quarantine, postings, 4 buckets

    # interrupted run: dies after 3 units (docs, quarantine, postings)
    with pytest.raises(BuildInterrupted):
        build_index_resumable(docs, resumed_dir, n_buckets=4, fail_after_units=3)
    assert unit_done(resumed_dir, "docs", _fp(resumed_dir))
    # resume: must execute ONLY the remaining units
    res2 = build_index_resumable(docs, resumed_dir, n_buckets=4)
    assert res2["executed_units"] == 4

    a = _decode_all(load_segments(spark, clean_dir).collect())
    b = _decode_all(load_segments(spark, resumed_dir).collect())
    assert a == b


def _fp(out_dir):
    import json

    with open(os.path.join(out_dir, "_lineage", "docs.json")) as f:
        return json.load(f)["input_fingerprint"]


def test_noop_on_rerun(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("noop"))
    build_index_resumable(docs, d, n_buckets=2)
    res = build_index_resumable(docs, d, n_buckets=2)
    assert res["executed_units"] == 0


def test_fingerprint_invalidation(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("inval"))
    docs_a = ingest(corpus_df(spark, 50, seed=1))
    docs_b = ingest(corpus_df(spark, 50, seed=2))
    build_index_resumable(docs_a, d, n_buckets=2)
    res = build_index_resumable(docs_b, d, n_buckets=2)
    assert res["executed_units"] == 5  # everything re-ran: input changed


def test_metrics_table(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("metrics"))
    build_index_resumable(docs, d, n_buckets=4)
    m = read_metrics(spark, d)
    rows = {r["unit"]: r for r in m.collect()}
    assert set(rows) == {"docs", "quarantine", "postings"} | {
        f"segments/bucket={b}" for b in range(4)
    }
    assert all(r["wall_ms"] > 0 for r in rows.values())
    assert rows["docs"]["rows"] == N_DOCS
    assert rows["quarantine"]["rows"] == 0  # clean fixture


def test_bucket_pruned_query_matches_full(spark, docs, tmp_path_factory):
    """Static term->bucket directory pruning: identical results to the
    full-segment scan, and the plan actually partition-prunes."""
    from pyspark_codesearch.indexing import CorpusStats
    from pyspark_codesearch.lineage import (
        buckets_for_terms,
        load_segments_for_terms,
        n_buckets_of,
    )
    from pyspark_codesearch.wand import wand_topk_batch

    d = str(tmp_path_factory.mktemp("prune"))
    build_index_resumable(docs, d, n_buckets=4, salt_range=64)
    st = spark.read.parquet(f"{d}/stats").collect()[0]
    stats = CorpusStats(int(st["n_docs"]), float(st["avgdl"]))
    doc_lens = spark.read.parquet(f"{d}/doc_lens")
    term_stats = spark.read.parquet(f"{d}/term_stats")
    qmap = {"a": "parse json string", "b": "uniqterm000011"}
    from pyspark_codesearch.analysis import tokenize_py

    terms = {t for q in qmap.values() for t in tokenize_py(q)}
    assert n_buckets_of(d) == 4
    bks = buckets_for_terms(spark, terms, 4)
    assert 0 < len(bks) <= 4
    pruned_segs = load_segments_for_terms(spark, d, terms)
    full = wand_topk_batch(
        load_segments(spark, d).drop("bucket"), doc_lens, term_stats, stats,
        qmap, 5, salt_range=64,
    ).collect()
    pruned = wand_topk_batch(
        pruned_segs, doc_lens, term_stats, stats, qmap, 5, salt_range=64
    ).collect()
    assert len(pruned) > 0
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))
    # bucket pruning visible in the scan's actual file set: the pruned
    # plan reads ONLY the matched buckets' (snapshot-resolved) dirs —
    # stronger than the old PartitionFilters string check
    import os as _os

    def dirs_of(df):
        return {
            _os.path.realpath(_os.path.dirname(p.removeprefix("file:")))
            for p in df.inputFiles()
        }

    want = {_os.path.realpath(f"{d}/segments/bucket={b}") for b in bks}
    got_dirs = dirs_of(pruned_segs)
    assert got_dirs and got_dirs <= want
    all_dirs = dirs_of(load_segments(spark, d))
    if len(bks) < 4:
        assert len(got_dirs) < len(all_dirs)


def test_quarantine_poison_rows(spark, docs, tmp_path_factory):
    """S8: poison rows divert to the quarantine table with reasons; the
    build completes on the valid rows (reference ingest_papers.py:513-526
    collects per-paper failures instead of aborting the run)."""
    from pyspark.sql import functions as F

    from pyspark_codesearch.lineage import split_quarantine

    poisoned = (
        docs.withColumn(
            "content",
            F.when(F.col("doc_id") == 3, F.lit(None).cast("string"))
            .when(F.col("doc_id") == 4, F.lit(""))
            .when(F.col("doc_id") == 6, F.concat(F.col("content"), F.lit("TAMPERED")))
            .otherwise(F.col("content")),
        )
        .withColumn(
            "doc_id",
            F.when(F.col("doc_id") == 5, F.lit(None).cast("long")).otherwise(F.col("doc_id")),
        )
    )
    valid, quarantined = split_quarantine(poisoned, expected_sha_col="sha256")
    reasons = {r["doc_id"]: r["reason"] for r in quarantined.collect()}
    assert reasons == {3: "empty_content", 4: "empty_content",
                       None: "null_doc_id", 6: "sha_mismatch"}
    assert valid.count() == N_DOCS - 4

    d = str(tmp_path_factory.mktemp("quar"))
    res = build_index_resumable(poisoned, d, n_buckets=2, expected_sha_col="sha256")
    assert res["executed_units"] == 5
    q = spark.read.parquet(f"{d}/quarantine")
    assert {r["reason"] for r in q.collect()} == {"empty_content", "null_doc_id", "sha_mismatch"}
    assert q.count() == 4
    written = spark.read.parquet(f"{d}/docs")
    assert written.count() == N_DOCS - 4
    assert written.filter(F.col("doc_id").isin(3, 4, 6)).count() == 0
    # resume semantics unchanged: second run is a no-op
    res2 = build_index_resumable(poisoned, d, n_buckets=2, expected_sha_col="sha256")
    assert res2["executed_units"] == 0
