"""Incremental index upsert/delete: re-ingesting a modified doc replaces
its postings exactly once; the upserted index is rank-identical to a fresh
build over the merged corpus; untouched buckets are not rewritten."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pyspark_codesearch.corpus import corpus_df, ingest, ingest_documents_df
from pyspark_codesearch.analysis import tokenize_py
from pyspark_codesearch.indexing import CorpusStats
from pyspark_codesearch.lineage import (
    build_index_resumable,
    delete_from_index,
    impact_scale,
    load_segments,
    upsert_index,
)
from pyspark_codesearch.wand import wand_topk

N_DOCS = 200
SALT_RANGE = 64
N_BUCKETS = 4

MOD_IDS = [5, 6, 7]
NEW_IDS = [10_000, 10_001]
DEL_ID = 8


def _delta(spark):
    # marker digits start with 9 so they can never collide with the base
    # corpus's uniqterm digit tokens (generation indexes < 000200)
    rows = [
        (i, f"upserterm9{i:05d} merge sort replaced content scan") for i in MOD_IDS
    ] + [
        (i, f"insertterm9{i:05d} brand new appended doc parse json stream")
        for i in NEW_IDS
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    return ingest_documents_df(raw).withColumn("lang", F.lit("python"))


def _load(spark, out):
    segs = load_segments(spark, out)
    doc_lens = spark.read.parquet(f"{out}/doc_lens")
    term_stats = spark.read.parquet(f"{out}/term_stats")
    st = spark.read.parquet(f"{out}/stats").collect()[0]
    return segs, doc_lens, term_stats, CorpusStats(int(st["n_docs"]), float(st["avgdl"]))


def _wand(spark, out, q, k=10, scale=1.0, salt_range=SALT_RANGE):
    segs, doc_lens, term_stats, stats = _load(spark, out)
    return [
        (r["doc_id"], r["score"])
        for r in wand_topk(
            segs, doc_lens, term_stats, stats, q, k,
            salt_range=salt_range, impact_scale=scale,
        ).collect()
    ]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ix") / "base")
    docs = ingest(corpus_df(spark, N_DOCS, seed=7)).cache()
    build_index_resumable(docs, out, n_buckets=N_BUCKETS, salt_range=SALT_RANGE)
    # fresh reference index over the post-upsert corpus
    delta = _delta(spark)
    base_cols = [c for c in docs.columns]
    delta_aligned = delta.select(
        *[
            (delta[c] if c in delta.columns else F.lit(None).cast(dict(docs.dtypes)[c])).alias(c)
            for c in base_cols
        ]
    )
    merged = (
        docs.filter(~F.col("doc_id").isin(MOD_IDS + [DEL_ID]))
        .unionByName(delta_aligned.filter(F.col("doc_id").isin(MOD_IDS + NEW_IDS)))
    )
    fresh = str(tmp_path_factory.mktemp("ix") / "fresh")
    build_index_resumable(merged, fresh, n_buckets=N_BUCKETS, salt_range=SALT_RANGE)
    return {"out": out, "fresh": fresh, "docs": docs, "delta": delta}


def test_upsert_then_rank_identity(spark, built):
    out, fresh = built["out"], built["fresh"]
    # old unique term of a doc that will be modified — resolve BEFORE upsert
    old_doc5_text = (
        spark.read.parquet(f"{out}/docs").filter(F.col("doc_id") == 5).collect()[0]["content"]
    )
    # the corpus's per-doc unique marker "uniqtermNNNNNN" analyzes to
    # ("uniqterm", "NNNNNN"); the 6-digit token is the globally-unique one
    import re as _re

    old_uniq = _re.search(r"uniqterm(\d{6})", old_doc5_text).group(1)

    seg_manifests_before = _seg_manifests(out)
    res = upsert_index(
        spark, out, built["delta"], deleted_ids=[DEL_ID], salt_range=SALT_RANGE
    )
    assert res["affected_buckets"], "delta must touch at least one bucket"

    # untouched segment buckets keep their manifests byte-identical
    after = _seg_manifests(out)
    untouched = [b for b in range(N_BUCKETS) if b not in res["affected_buckets"]]
    for b in untouched:
        assert after[b] == seg_manifests_before[b], f"bucket {b} rewritten"

    st = spark.read.parquet(f"{out}/stats").collect()[0]
    scale = impact_scale(out, float(st["avgdl"]))
    assert scale >= 1.0

    queries = [
        "merge sort index",            # common terms, ranks shift with avgdl
        "upserterm 900005",            # modified doc's NEW unique marker
        "insertterm 910000",           # inserted doc
        old_uniq,                      # modified doc's OLD unique term -> gone
        "parse json stream scan",
    ]
    for q in queries:
        got = _wand(spark, out, q, scale=scale)
        want = _wand(spark, fresh, q)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, abs=1e-9), q
    # the old unique term matches nothing anywhere
    assert _wand(spark, out, old_uniq, scale=scale) == []


def test_postings_replaced_exactly_once(spark, built):
    out = built["out"]
    postings = spark.read.parquet(f"{out}/postings")
    # modified doc: postings == distinct terms of the NEW content only
    new_text = built["delta"].filter(F.col("doc_id") == 5).collect()[0]["content"]
    expect_terms = set(tokenize_py(new_text))
    got = postings.filter(F.col("doc_id") == 5).select("term").collect()
    got_terms = [r["term"] for r in got]
    assert sorted(got_terms) == sorted(set(got_terms)), "duplicated postings"
    assert set(got_terms) == expect_terms
    # deleted doc: no postings, no docs row, no doc_lens row
    assert postings.filter(F.col("doc_id") == DEL_ID).count() == 0
    assert spark.read.parquet(f"{out}/docs").filter(F.col("doc_id") == DEL_ID).count() == 0
    assert (
        spark.read.parquet(f"{out}/doc_lens").filter(F.col("doc_id") == DEL_ID).count() == 0
    )
    # inserted docs present
    assert spark.read.parquet(f"{out}/docs").filter(F.col("doc_id").isin(NEW_IDS)).count() == 2


def test_upsert_is_idempotent(spark, built):
    """Re-running the same upsert is a no-op (lineage fingerprint match)."""
    out = built["out"]
    res = upsert_index(
        spark, out, built["delta"], deleted_ids=[DEL_ID], salt_range=SALT_RANGE
    )
    assert res["executed_units"] == 0


def test_term_stats_consistent_after_upsert(spark, built):
    """df(term) in term_stats == true distinct-doc count from postings,
    for every term (incremental maintenance didn't drift)."""
    out = built["out"]
    postings = spark.read.parquet(f"{out}/postings")
    true_df = {
        r["term"]: r["n"]
        for r in postings.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    stored = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(f"{out}/term_stats").collect()
    }
    assert stored == true_df


def test_delete_only(spark, tmp_path):
    out = str(tmp_path / "delix")
    docs = ingest(corpus_df(spark, 60, seed=11))
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    import re as _re

    uniq = _re.search(
        r"uniqterm(\d{6})",
        spark.read.parquet(f"{out}/docs").filter(F.col("doc_id") == 3).collect()[0]["content"],
    ).group(1)
    assert _wand(spark, out, uniq, k=5) != []
    delete_from_index(spark, out, [3], salt_range=32)
    st = spark.read.parquet(f"{out}/stats").collect()[0]
    assert int(st["n_docs"]) == 59
    scale = impact_scale(out, float(st["avgdl"]))
    segs, doc_lens, term_stats, stats = _load(spark, out)
    got = wand_topk(
        segs, doc_lens, term_stats, stats, uniq, 5,
        salt_range=32, impact_scale=scale,
    ).collect()
    assert got == []


def _seg_manifests(out):
    md = os.path.join(out, "_lineage")
    res = {}
    for fn in os.listdir(md):
        if fn.startswith("segments__bucket=") and fn.endswith(".json"):
            b = int(fn.split("=")[1].split(".")[0])
            with open(os.path.join(md, fn)) as f:
                res[b] = json.load(f)
    return res


def test_upsert_crash_resume(spark, tmp_path):
    """A killed upsert resumes to the same result as an uninterrupted
    one: the upsert plan (affected terms/buckets) is manifest-committed
    BEFORE the docs swap, so the resume never needs the replaced old
    content; a crash between _swap_dir renames is also recovered."""
    from pyspark_codesearch.lineage import BuildInterrupted

    out = str(tmp_path / "cr")
    fresh = str(tmp_path / "cr_fresh")
    docs = ingest(corpus_df(spark, 80, seed=13)).cache()
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)

    delta = _delta(spark)
    # crash after (plan, docs) units — docs table already swapped, the
    # old content of the modified docs is GONE
    with pytest.raises(BuildInterrupted):
        upsert_index(spark, out, delta, deleted_ids=[2], salt_range=32,
                     fail_after_units=2)
    res = upsert_index(spark, out, delta, deleted_ids=[2], salt_range=32)
    assert res["executed_units"] > 0

    merged = (
        docs.filter(~F.col("doc_id").isin(MOD_IDS + [2]))
        .unionByName(
            _delta(spark).select(
                *[
                    (F.col(c) if c in _delta(spark).columns
                     else F.lit(None).cast(dict(docs.dtypes)[c])).alias(c)
                    for c in docs.columns
                ]
            )
        )
    )
    build_index_resumable(merged, fresh, n_buckets=2, salt_range=32)
    st = spark.read.parquet(f"{out}/stats").collect()[0]
    scale = impact_scale(out, float(st["avgdl"]))
    for q in ["merge sort scan", "upserterm 900005", "parse json stream"]:
        got = _wand(spark, out, q, scale=scale, salt_range=32)
        want = _wand(spark, fresh, q, salt_range=32)
        assert [d for d, _ in got] == [d for d, _ in want], q


def test_plan_is_parquet_sidetable(spark, built):
    """The upsert plan's term set lives in a fingerprint-keyed parquet
    side table, NOT in the manifest JSON (a re-ingest wave's vocabulary
    would OOM a driver-side list)."""
    out = built["out"]
    with open(os.path.join(out, "_lineage", "upsert_plan.json")) as f:
        plan = json.load(f)
    assert "affected_terms" not in plan, "terms must not be in the JSON manifest"
    assert plan["affected_buckets"], "bucket ids (bounded by n_buckets) stay in JSON"
    plan_df = spark.read.parquet(plan["plan_data"])
    assert set(plan_df.columns) == {"term", "bucket"}
    assert plan_df.count() == plan["rows"] > 0
    # every term the delta carries is in the plan
    delta_terms = {
        r["t"] for r in built["delta"].select(F.explode("tokens").alias("t")).collect()
    }
    stored = {r["term"] for r in plan_df.collect()}
    assert delta_terms <= stored


def test_upsert_delete_overlap_raises(spark, tmp_path):
    out = str(tmp_path / "ov")
    docs = ingest(corpus_df(spark, 40, seed=3))
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    delta = _delta(spark)  # carries MOD_IDS = [5, 6, 7]
    with pytest.raises(ValueError, match="BOTH delta_docs and deleted_ids"):
        upsert_index(spark, out, delta, deleted_ids=[5], salt_range=32)


def test_inprogress_upsert_refuses_different_delta(spark, tmp_path):
    """A crashed upsert must be resumed with the SAME delta; a different
    one is refused (its plan would silently orphan stale postings)."""
    from pyspark_codesearch.lineage import BuildInterrupted

    out = str(tmp_path / "ip")
    docs = ingest(corpus_df(spark, 60, seed=5)).cache()
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    delta = _delta(spark)
    with pytest.raises(BuildInterrupted):
        upsert_index(spark, out, delta, salt_range=32, fail_after_units=2)
    # different delta (a delete) while the upsert is interrupted -> refused
    with pytest.raises(RuntimeError, match="interrupted upsert"):
        delete_from_index(spark, out, [1], salt_range=32)
    # resuming the SAME delta completes
    res = upsert_index(spark, out, delta, salt_range=32)
    assert res["executed_units"] > 0
    # and once complete, a different delta is accepted again
    delete_from_index(spark, out, [1], salt_range=32)
    assert spark.read.parquet(f"{out}/docs").filter(F.col("doc_id") == 1).count() == 0


def test_deleted_ids_accepts_dataframe(spark, tmp_path):
    out = str(tmp_path / "dfdel")
    docs = ingest(corpus_df(spark, 40, seed=9))
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    dels = spark.createDataFrame([(2,), (3,)], "doc_id long")
    upsert_index(spark, out, None, deleted_ids=dels, salt_range=32)
    assert (
        spark.read.parquet(f"{out}/docs").filter(F.col("doc_id").isin([2, 3])).count() == 0
    )


def test_impact_scale_raises_without_built_avgdl(spark, tmp_path):
    out = str(tmp_path / "noavg")
    docs = ingest(corpus_df(spark, 30, seed=4))
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    # simulate an index built before built_avgdl existed
    p = os.path.join(out, "_lineage", "segments__bucket=0.json")
    with open(p) as f:
        m = json.load(f)
    m.pop("built_avgdl", None)
    with open(p, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="built_avgdl"):
        impact_scale(out, 10.0)


@pytest.mark.slow
def test_large_vocab_delta_no_driver_lists(spark, tmp_path):
    """A delta with a large distinct vocabulary completes with the plan
    on parquet (nothing vocab-sized crosses the driver). Sized to stay
    test-suite-friendly (~2.4e4 distinct terms); the shape is identical
    at 1e6+ — no code path depends on the count."""
    out = str(tmp_path / "bigv")
    docs = ingest(corpus_df(spark, 30, seed=21)).cache()
    build_index_resumable(docs, out, n_buckets=2, salt_range=64)
    # 60 docs x 400 unique tokens each, generated JVM-side
    raw = (
        spark.range(60)
        .select(
            (F.col("id") + 20_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(399)),
                    lambda i: F.concat(
                        F.lit("bigv"), ((F.col("id") * 1000) + i).cast("string")
                    ),
                ),
            ).alias("text"),
        )
    )
    delta = ingest_documents_df(raw).withColumn("lang", F.lit("python"))
    res = upsert_index(spark, out, delta, salt_range=64)
    assert res["affected_terms"] >= 60 * 400  # bigvN digits tokenize apart
    with open(os.path.join(out, "_lineage", "upsert_plan.json")) as f:
        plan = json.load(f)
    assert "affected_terms" not in plan
    # spot-check: an inserted doc's unique token is retrievable
    assert _wand(spark, out, "bigv 4017", k=3, salt_range=64) != []  # doc 20004


def test_term_dictionary_for_index_refreshes_after_upsert(spark, tmp_path):
    """invalidate() on a for_index dictionary re-reads the SWAPPED
    parquet dirs: post-upsert lookups see new df and new salts (a plain
    re-cache of the pinned file listing would throw or serve stale)."""
    from pyspark_codesearch.wand import TermDictionary

    out = str(tmp_path / "tdix")
    docs = ingest(corpus_df(spark, 40, seed=15)).cache()
    build_index_resumable(docs, out, n_buckets=2, salt_range=32)
    td = TermDictionary.for_index(spark, out)
    dfs0, _ = td.lookup(["merge", "upserterm"])
    assert "merge" in dfs0 and "upserterm" not in dfs0

    upsert_index(spark, out, _delta(spark), salt_range=32)
    td.invalidate()
    dfs1, salts1 = td.lookup(["merge", "upserterm"])
    # the delta's brand-new term is now visible with its true df (3 mods
    # + 2 inserts carry 'upserterm'/'insertterm' markers -> df >= 3)
    assert dfs1.get("upserterm", 0) >= 3
    assert salts1["upserterm"], "new term's salts must be visible"
    # and a mutated common term's df reflects the post-upsert postings
    true_df = (
        spark.read.parquet(f"{out}/postings")
        .filter(F.col("term") == "merge").count()
    )
    assert dfs1["merge"] == true_df
