"""Concurrent-writer conflict detection on the index directory.

The parquet/manifest emulation mutates tables in place, so it admits ONE
writer per index: a live concurrent writer must be refused loudly
(ConcurrentWriteError), a dead one's lock must be broken so kill-resume
keeps working, and a clean python failure (BuildInterrupted) must release
the lock so the documented resume path stays a plain re-call."""

import json
import os
import subprocess

import pytest
from pyspark.sql import functions as F

from pyspark_codesearch.corpus import corpus_df, ingest, ingest_documents_df
from pyspark_codesearch.lineage import (
    BuildInterrupted,
    ConcurrentWriteError,
    build_index_resumable,
    delete_from_index,
    upsert_index,
    writer_lock,
)


def _dead_pid() -> int:
    p = subprocess.Popen(["true"])
    p.wait()  # reaped: os.kill(pid, 0) now raises ProcessLookupError
    return p.pid


def _plant_lock(out_dir: str, pid: int) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "_writer.lock")
    with open(path, "w") as f:
        json.dump({"pid": pid, "what": "test", "ts": 0.0}, f)
    return path


def _tiny_docs(spark):
    return ingest(corpus_df(spark, 20, seed=3)).cache()


def test_live_holder_refused_before_any_mutation(spark, tmp_path):
    # our own pid is definitionally alive; no index needs to exist because
    # the lock is taken before recovery/fingerprinting touches anything
    out = str(tmp_path / "ix")
    _plant_lock(out, os.getpid())
    delta = ingest_documents_df(
        spark.createDataFrame([(1, "conflict probe scan")], "doc_id long, text string")
    )
    with pytest.raises(ConcurrentWriteError, match="live pid"):
        upsert_index(spark, out, delta, salt_range=32)
    with pytest.raises(ConcurrentWriteError, match="live pid"):
        build_index_resumable(_tiny_docs(spark), out, n_buckets=2, salt_range=32)
    assert os.path.exists(os.path.join(out, "_writer.lock")), (
        "a refused writer must not release the holder's lock"
    )


def test_stale_lock_broken_then_released(spark, tmp_path):
    out = str(tmp_path / "ix")
    docs = _tiny_docs(spark)
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    _plant_lock(out, _dead_pid())  # simulates a SIGKILLed writer
    delete_from_index(spark, out, [1], salt_range=32)
    assert not os.path.exists(os.path.join(out, "_writer.lock"))
    remaining = spark.read.parquet(f"{out}/docs").filter(F.col("doc_id") == 1).count()
    assert remaining == 0


def test_torn_lock_treated_as_stale(spark, tmp_path):
    # a writer killed mid-write of the lock file itself leaves garbage
    out = str(tmp_path / "ix")
    docs = _tiny_docs(spark)
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "_writer.lock"), "w") as f:
        f.write('{"pid": 12')
    delete_from_index(spark, out, [2], salt_range=32)
    assert not os.path.exists(os.path.join(out, "_writer.lock"))


def test_injected_failure_releases_lock_and_resume_succeeds(spark, tmp_path):
    out = str(tmp_path / "ix")
    docs = _tiny_docs(spark)
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    delta = ingest_documents_df(
        spark.createDataFrame(
            [(900001, "upserted replacement scan merge")], "doc_id long, text string"
        )
    ).withColumn("lang", F.lit("python"))
    with pytest.raises(BuildInterrupted):
        upsert_index(spark, out, delta, salt_range=32, fail_after_units=1)
    assert not os.path.exists(os.path.join(out, "_writer.lock")), (
        "a clean python failure is not a crash: mutation stopped, so the "
        "lock must release and the resume path must not need a lock break"
    )
    res = upsert_index(spark, out, delta, salt_range=32)
    assert res["executed_units"] > 0
    assert not os.path.exists(os.path.join(out, "_writer.lock"))


def test_writer_lock_is_exclusive_within_a_process(tmp_path):
    out = str(tmp_path / "ix")
    with writer_lock(out, "outer"):
        with pytest.raises(ConcurrentWriteError):
            with writer_lock(out, "inner"):
                pass
    assert not os.path.exists(os.path.join(out, "_writer.lock"))
