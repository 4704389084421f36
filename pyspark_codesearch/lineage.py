"""Checkpoint-resumable index build with per-unit lineage + metrics.

The reference's resumability is ad-hoc (resume-from-paper-id loop,
ingest_papers.py:491-497; skip-if-exists, full_pipeline.py:88-89;
deterministic ids => idempotent upsert, es_indexer.py:176-179). Here it
is structural (SURVEY §2.10 / §7 step 8):

  stage docs      canonical docs parquet          (one unit)
  stage postings  postings parquet, bucketed by   (one unit)
                  pmod(hash(term), n_buckets)
  stage segments  per-bucket compressed segments  (n_buckets units)

Every unit commits (a) its parquet output, (b) a manifest JSON file
(atomic tmp+rename) carrying an input fingerprint, and (c) a row in the
_metrics parquet (unit, rows, wall_ms, fingerprint). Restart skips any
unit whose manifest exists with a matching fingerprint — a killed build
resumes where it stopped and produces output identical to an
uninterrupted run (pinned by tests/test_lineage.py).

Term-hash bucketing doubles as the static pruning story at scale: a
query's terms map to buckets, so query-time scans touch only those
bucket directories (partition pruning), the DataFrame analogue of a term
dictionary seek.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexing import build_segments, corpus_stats

N_BUCKETS = 8


class BuildInterrupted(RuntimeError):
    pass


def split_quarantine(docs: DataFrame, expected_sha_col: str | None = None):
    """S8 sink-failure quarantine (reference ingest_papers.py:513-526
    collects per-paper failures into a failed list; SURVEY §2.1 S8
    prescribes a per-partition error quarantine table).

    Returns (valid, quarantined) where quarantined carries a ``reason``:
    null doc_id, null/empty content, or (when ``expected_sha_col`` is
    given) a content-sha mismatch — the north rule's per-row sha256
    invariant enforced at ingest. Pure column expressions: the split is
    two filters over one scan, no shuffle, no driver round-trip."""
    reason = F.when(F.col("doc_id").isNull(), F.lit("null_doc_id")).when(
        F.col("content").isNull() | (F.length("content") == 0), F.lit("empty_content")
    )
    if expected_sha_col is not None and expected_sha_col in docs.columns:
        reason = reason.when(
            F.col(expected_sha_col) != F.sha2(F.col("content"), 256),
            F.lit("sha_mismatch"),
        )
    flagged = docs.withColumn("_qreason", reason)
    valid = flagged.filter(F.col("_qreason").isNull()).drop("_qreason")
    quarantined = flagged.filter(F.col("_qreason").isNotNull()).withColumnRenamed(
        "_qreason", "reason"
    )
    return valid, quarantined


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def _manifest_path(out_dir: str, unit: str) -> str:
    return os.path.join(_manifest_dir(out_dir), f"{unit.replace('/', '__')}.json")


def unit_done(out_dir: str, unit: str, fingerprint: str) -> bool:
    p = _manifest_path(out_dir, unit)
    if not os.path.exists(p):
        return False
    with open(p) as f:
        return json.load(f).get("input_fingerprint") == fingerprint


def commit_unit(out_dir: str, unit: str, fingerprint: str, rows: int, wall_ms: float) -> None:
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    rec = {
        "unit": unit,
        "input_fingerprint": fingerprint,
        "rows": rows,
        "wall_ms": round(wall_ms, 1),
    }
    tmp = _manifest_path(out_dir, unit) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, _manifest_path(out_dir, unit))  # atomic commit


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    recs = []
    mdir = _manifest_dir(out_dir)
    for fn in sorted(os.listdir(mdir)):
        if fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                recs.append(json.load(f))
    return spark.createDataFrame(
        recs, "unit string, input_fingerprint string, rows long, wall_ms double"
    )


def build_index_resumable(
    docs: DataFrame,
    out_dir: str,
    *,
    n_buckets: int = N_BUCKETS,
    salt_range: int = 1 << 20,
    fail_after_units: int | None = None,
    expected_sha_col: str | None = None,
) -> dict:
    """Build the full index under out_dir, unit by unit, skipping
    already-committed units. ``fail_after_units`` injects a crash after N
    newly-executed units (tests only).

    Poison rows (null id / empty content / sha mismatch when
    ``expected_sha_col`` is set) are diverted to ``{out_dir}/quarantine``
    with a reason column (S8); the build completes on the valid rows and
    the quarantine row count is a lineage unit like any other.

    Fingerprints: docs stage fingerprints the (deterministic) input via
    count + sha256-xor of content hashes; downstream stages fingerprint
    their upstream manifest — a change in input invalidates everything.
    """
    spark = docs.sparkSession
    executed = {"n": 0}
    docs, quarantined = split_quarantine(docs, expected_sha_col)

    def maybe_fail():
        if fail_after_units is not None and executed["n"] >= fail_after_units:
            raise BuildInterrupted(f"injected failure after {executed['n']} units")

    def run_unit(unit: str, fingerprint: str, fn):
        if unit_done(out_dir, unit, fingerprint):
            return False
        maybe_fail()
        t0 = time.perf_counter()
        rows = fn()
        commit_unit(out_dir, unit, fingerprint, rows, (time.perf_counter() - t0) * 1000)
        executed["n"] += 1
        return True

    # ---- stage 1: canonical docs
    fp_row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sha2(F.concat_ws("", F.sort_array(F.collect_list("sha256"))), 256).alias("fp"),
    ).collect()[0]
    docs_fp = f"{fp_row['n']}:{fp_row['fp']}"

    def do_docs():
        docs.drop("tokens").write.mode("overwrite").parquet(f"{out_dir}/docs")
        return int(fp_row["n"])

    run_unit("docs", docs_fp, do_docs)

    # ---- stage 1b: quarantine table (S8) — poison rows + reason
    def do_quarantine():
        q = quarantined.drop("tokens")
        q.write.mode("overwrite").parquet(f"{out_dir}/quarantine")
        return q.count()

    run_unit("quarantine", docs_fp, do_quarantine)

    # ---- stage 2: bucketed postings (+ doc_lens + stats side tables)
    def do_postings():
        from .indexing import build_postings_with_dl, build_term_stats

        postings = build_postings_with_dl(docs).withColumn(
            "bucket", F.pmod(F.hash("term"), F.lit(n_buckets))
        )
        (
            postings.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{out_dir}/postings")
        )
        build_term_stats(spark.read.parquet(f"{out_dir}/postings")).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/term_stats")
        docs.select("doc_id", "doc_len").write.mode("overwrite").parquet(
            f"{out_dir}/doc_lens"
        )
        st = corpus_stats(docs)
        spark.createDataFrame(
            [(st.n_docs, st.avgdl)], "n_docs long, avgdl double"
        ).write.mode("overwrite").parquet(f"{out_dir}/stats")
        return spark.read.parquet(f"{out_dir}/postings").count()

    run_unit("postings", docs_fp, do_postings)

    # ---- stage 3: per-bucket segments
    st_row = spark.read.parquet(f"{out_dir}/stats").collect()[0]
    from .indexing import CorpusStats

    stats = CorpusStats(int(st_row["n_docs"]), float(st_row["avgdl"]))
    for b in range(n_buckets):
        unit = f"segments/bucket={b}"
        fp = f"{docs_fp}:bucket={b}"

        def do_bucket(b=b):
            part = spark.read.parquet(f"{out_dir}/postings").filter(
                F.col("bucket") == b
            ).drop("bucket")
            segs = build_segments(part, stats, salt_range=salt_range)
            segs.write.mode("overwrite").parquet(f"{out_dir}/segments/bucket={b}")
            return spark.read.parquet(f"{out_dir}/segments/bucket={b}").count()

        run_unit(unit, fp, do_bucket)

    return {
        "out_dir": out_dir,
        "executed_units": executed["n"],
        "n_buckets": n_buckets,
        "stats": stats,
    }


def load_segments(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", f"{out_dir}/segments").parquet(
        f"{out_dir}/segments/bucket=*"
    )


def n_buckets_of(out_dir: str) -> int:
    return len(
        [d for d in os.listdir(f"{out_dir}/segments") if d.startswith("bucket=")]
    )


def buckets_for_terms(spark: SparkSession, terms, n_buckets: int) -> list[int]:
    """Static term->bucket pruning (the directory-level term-dictionary
    seek): which bucket partitions can possibly hold these terms. Uses
    the SAME pmod(hash(term), n) expression as the build, evaluated on a
    tiny literal frame, so the mapping cannot drift from the writer."""
    if not terms:
        return []
    rows = (
        spark.createDataFrame([(t,) for t in sorted(set(terms))], "term string")
        .select(F.pmod(F.hash("term"), F.lit(n_buckets)).alias("b"))
        .distinct()
        .collect()
    )
    return sorted(int(r["b"]) for r in rows)


def load_segments_for_terms(spark: SparkSession, out_dir: str, terms) -> DataFrame:
    """Segments scan pruned to the bucket DIRECTORIES the query's terms
    hash into — Catalyst turns the `bucket IN (...)` filter on the
    partition column into partition pruning (untouched bucket dirs are
    never listed or read), then the term IN-filter prunes row groups
    inside the surviving files."""
    segs = load_segments(spark, out_dir)
    buckets = buckets_for_terms(spark, terms, n_buckets_of(out_dir))
    return segs.filter(F.col("bucket").isin(buckets)).drop("bucket")
