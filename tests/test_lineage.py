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
    assert res_clean["executed_units"] == 2 + 4  # docs, postings, 4 buckets

    # interrupted run: dies after 3 units (docs, postings, 1 bucket)
    with pytest.raises(BuildInterrupted):
        build_index_resumable(docs, resumed_dir, n_buckets=4, fail_after_units=3)
    assert unit_done(resumed_dir, "docs", _fp(resumed_dir))
    # resume: must execute ONLY the remaining units
    res2 = build_index_resumable(docs, resumed_dir, n_buckets=4)
    assert res2["executed_units"] == 3

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
    assert res["executed_units"] == 4  # everything re-ran: input changed


def test_metrics_table(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("metrics"))
    build_index_resumable(docs, d, n_buckets=4)
    m = read_metrics(spark, d)
    rows = {r["unit"]: r for r in m.collect()}
    assert set(rows) == {"docs", "postings"} | {f"segments/bucket={b}" for b in range(4)}
    assert all(r["wall_ms"] > 0 for r in rows.values())
    assert rows["docs"]["rows"] == N_DOCS
