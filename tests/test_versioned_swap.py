"""Reader-safe versioned directory swaps (VERDICT r6 Missing #1).

`_swap_dir` publishes each rewrite as a new version dir behind an
atomically-repointed symlink, retaining the previous generation for one
swap — so a reader racing repeated upsert swaps never observes ENOENT
(the old rename-pair protocol had a two-rename window) and a reader
whose scan already resolved the old target keeps reading real files.
Single-host analogue of Iceberg snapshot pinning (ARCHITECTURE §6)."""

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from pyspark_codesearch.corpus import corpus_df, ingest, ingest_documents_df
from pyspark_codesearch.lineage import (
    _recover_swap,
    _swap_dir,
    _versions_root,
    build_index_resumable,
    load_segments,
    read_table,
    upsert_index,
)


def _write_marker(gen):
    """write_fn factory: a dir with a content file naming its generation
    plus a trailing _COMPLETE sentinel written last."""

    def fn(p):
        os.makedirs(p)
        with open(os.path.join(p, "content"), "w") as f:
            f.write(str(gen))
        with open(os.path.join(p, "_COMPLETE"), "w") as f:
            f.write("ok")

    return fn


def test_swap_path_never_disappears(tmp_path):
    """A tight stat/read loop across 60 swaps never sees ENOENT or a
    version missing its completion sentinel."""
    path = str(tmp_path / "table")
    _swap_dir(path, _write_marker(0))
    errors = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                names = os.listdir(path)  # resolves the symlink
                if "_COMPLETE" not in names:
                    errors.append(f"incomplete version visible: {names}")
                    return
                with open(os.path.join(path, "content")) as f:
                    int(f.read())
            except OSError as e:  # ENOENT is exactly the closed window
                errors.append(repr(e))
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        for gen in range(1, 61):
            _swap_dir(path, _write_marker(gen))
    finally:
        stop.set()
        t.join()
    assert errors == []
    with open(os.path.join(path, "content")) as f:
        assert f.read() == "60"


def test_previous_generation_retained_one_swap(tmp_path):
    path = str(tmp_path / "table")
    _swap_dir(path, _write_marker(0))
    vroot = _versions_root(path)
    gen0 = os.path.realpath(path)
    _swap_dir(path, _write_marker(1))
    gen1 = os.path.realpath(path)
    # a reader mid-scan on gen0 still has real files under it
    assert os.path.exists(os.path.join(gen0, "content"))
    _swap_dir(path, _write_marker(2))
    # now gen0 is two swaps behind (out of contract) and collected
    assert not os.path.exists(gen0)
    assert os.path.exists(os.path.join(gen1, "content"))
    assert len(os.listdir(vroot)) == 2  # current + previous only


def test_legacy_real_dir_migrates(tmp_path):
    """A pre-versioning index (real dir at path) is migrated into the
    versioned layout on its first swap; content swaps normally after."""
    path = str(tmp_path / "table")
    os.makedirs(path)
    with open(os.path.join(path, "content"), "w") as f:
        f.write("legacy")
    _swap_dir(path, _write_marker(7))
    assert os.path.islink(path)
    with open(os.path.join(path, "content")) as f:
        assert f.read() == "7"
    # the legacy dir is the retained previous generation
    vroot = _versions_root(path)
    assert len(os.listdir(vroot)) == 2


def test_legacy_staging_recovery_still_works(tmp_path):
    """Old-protocol crash layout (path gone, .staging complete) is still
    finished by _recover_swap, and a stray .lnktmp is removed."""
    path = str(tmp_path / "table")
    os.makedirs(path + ".staging")
    with open(path + ".staging/content", "w") as f:
        f.write("staged")
    os.makedirs(_versions_root(path))
    lnktmp = os.path.join(_versions_root(path), ".lnktmp")
    os.symlink("nowhere", lnktmp)
    _recover_swap(path)
    assert os.path.isdir(path) and not os.path.islink(path)
    with open(os.path.join(path, "content")) as f:
        assert f.read() == "staged"
    assert not os.path.lexists(lnktmp)


def test_reader_loops_during_repeated_upsert_swaps(spark, tmp_path):
    """The VERDICT's done-test: a Spark reader looping over the index
    tables while upserts repeatedly swap them underneath never hits an
    unhandled error, and each observed snapshot is internally sane."""
    out = str(tmp_path / "idx")
    docs = ingest(corpus_df(spark, 120))
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)

    errors = []
    reads = {"n": 0}
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                n_docs = read_table(spark, out, "docs").count()
                n_lens = read_table(spark, out, "doc_lens").count()
                load_segments(spark, out).select("term").limit(5).collect()
                assert n_docs > 0 and n_lens > 0
                reads["n"] += 1
            except Exception as e:  # noqa: BLE001 - the test IS the net
                errors.append(repr(e))
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        for wave in range(3):
            rows = [
                (i, f"swapwave9{wave}{i:04d} merge sort replaced content")
                for i in (3, 4, 5)
            ]
            delta = ingest_documents_df(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).withColumn("lang", F.lit("python"))
            upsert_index(spark, out, delta, salt_range=32)
    finally:
        time.sleep(0.2)  # let the reader catch at least one post-swap read
        stop.set()
        t.join()
    assert errors == []
    assert reads["n"] >= 3  # the loop genuinely overlapped the swaps
