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

import fcntl
import json
import os
import time
from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexing import build_segments, corpus_stats

N_BUCKETS = 8


class BuildInterrupted(RuntimeError):
    pass


class ConcurrentWriteError(RuntimeError):
    """Another LIVE writer holds this index directory's writer lock."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


@_contextmanager
def writer_lock(out_dir: str, what: str = "write"):
    """Single-writer mutual exclusion for one index directory.

    The parquet/manifest emulation mutates tables IN PLACE (staged
    per-bucket swaps), so unlike Iceberg — where racing writers stage
    independent snapshots and only a metadata-pointer compare-and-swap
    picks the winner, the loser retrying harmlessly — a second LIVE
    writer here would corrupt shared state (e.g. _recover_swap "fixing"
    another writer's in-flight staged rename). The honest single-host
    analogue of the metastore CAS is this lock on
    ``{out_dir}/_writer.lock``.

    Arbitration is a kernel ``flock(LOCK_EX | LOCK_NB)`` on the lock
    file, NOT existence of the file: the kernel picks exactly one winner
    among any number of racers and releases the lock automatically when
    the holder dies, so there is no unlink-based "stale break" step and
    therefore no window in which one racer's delayed unlink can delete
    another racer's freshly acquired live lock (the TOCTOU the previous
    O_EXCL+unlink protocol had). After flock succeeds we verify the path
    still names the locked inode (a releasing writer unlinks the file
    while still holding the lock; a lock acquired on that orphaned inode
    is not the lock) and retry the open on mismatch.

    The lock file's JSON payload (pid, what, ts) is a secondary CLAIM,
    kept for diagnostics and for pre-flock crash files: a pre-existing
    payload naming a LIVE pid is honored even if unflocked (refuse; pid
    reuse then fails in the SAFE direction — spurious refusal, never
    corruption), while a dead/garbled payload is simply overwritten —
    crash RECOVERY stays the manifest layer's job (_recover_swap,
    _check_no_inprogress_upsert, unit fingerprints run after acquisition
    exactly as before, so kill-and-resume semantics are unchanged).

    - live holder (flocked, or live-pid claim) -> ConcurrentWriteError;
    - dead holder -> kernel already released (or the claim pid is dead):
      acquisition proceeds;
    - released in a ``finally`` (a clean python exception is not a
      crash: mutation has stopped, manifests make resumption safe); the
      file is unlinked BEFORE the flock drops so no later flock on the
      same inode can pass the path-verify.

    Declared limits (ARCHITECTURE §6): flock + pid liveness are
    host-local — right for local[*] and one driver per index, while a
    multi-driver deployment is exactly where the real catalog's CAS
    takes over. flock also conflicts across file descriptors within one
    process, so nested writer_lock on the same dir refuses (wanted).
    """
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "_writer.lock")

    def refuse(detail: str):
        raise ConcurrentWriteError(
            f"{out_dir} is being written by {detail}: the in-place emulation "
            "admits ONE writer per index — retry after it finishes (a real "
            "catalog would resolve this race with a metadata compare-and-swap "
            "instead)"
        )

    fd = None
    try:
        while True:
            fd = os.open(path, os.O_CREAT | os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                holder = _read_claim(fd)  # best-effort, for the message
                os.close(fd)
                fd = None
                refuse(
                    f"a live flock holder (pid {holder.get('pid', '?')}, "
                    f"{holder.get('what', '?')} since {holder.get('ts', '?')})"
                )
            try:
                same_inode = os.stat(path).st_ino == os.fstat(fd).st_ino
            except FileNotFoundError:
                same_inode = False
            if same_inode:
                break
            os.close(fd)  # locked an orphaned inode mid-release: retry
            fd = None
        holder = _read_claim(fd)
        pid = holder.get("pid")
        try:
            pid = int(pid) if pid is not None else None
        except (TypeError, ValueError):
            pid = None  # malformed claim: stale, overwrite
        if pid is not None and pid <= 0:
            pid = None  # kill(0|-pgid, 0) probes groups, not a process
        if pid is not None and _pid_alive(pid):
            # unflocked file claiming a live pid (planted, or pid reuse):
            # honor the claim — refusal is safe, corruption is not. Do
            # NOT unlink: the claim is not ours to break.
            refuse(f"live pid {pid} ({holder.get('what', '?')} since "
                   f"{holder.get('ts', '?')}, claim file without flock)")
        os.ftruncate(fd, 0)
        # rewind: _read_claim left the offset at EOF, and writing there
        # after the truncate would NUL-prefix the payload — later
        # _read_claim calls would parse {} and degrade the live-pid
        # refusal diagnostics to 'pid ?' (lock safety itself is flock's)
        os.lseek(fd, 0, os.SEEK_SET)
        os.write(fd, json.dumps(
            {"pid": os.getpid(), "what": what, "ts": time.time()}
        ).encode())
        try:
            yield
        finally:
            try:
                os.unlink(path)  # before the flock drops (see docstring)
            except FileNotFoundError:
                pass
    finally:
        if fd is not None:
            os.close(fd)  # drops the flock


def _read_claim(fd: int) -> dict:
    """Best-effort parse of a lock file's JSON claim via an open fd."""
    try:
        os.lseek(fd, 0, os.SEEK_SET)
        raw = os.read(fd, 4096)
        holder = json.loads(raw.decode("utf-8", "replace"))
        return holder if isinstance(holder, dict) else {}
    except (OSError, ValueError):
        return {}


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


def commit_unit(
    out_dir: str,
    unit: str,
    fingerprint: str,
    rows: int,
    wall_ms: float,
    extra: dict | None = None,
) -> None:
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    rec = {
        "unit": unit,
        "input_fingerprint": fingerprint,
        "rows": rows,
        "wall_ms": round(wall_ms, 1),
    }
    if extra:
        rec.update(extra)
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
                r = json.load(f)
            recs.append(
                {k: r.get(k) for k in ("unit", "input_fingerprint", "rows", "wall_ms")}
            )
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
    """Public entry: :func:`_build_index_resumable_unlocked` under the
    index :func:`writer_lock` (a live concurrent writer — another build
    or an upsert on the same out_dir — raises ConcurrentWriteError
    instead of corrupting in-place state)."""
    with writer_lock(out_dir, "build"):
        return _build_index_resumable_unlocked(
            docs,
            out_dir,
            n_buckets=n_buckets,
            salt_range=salt_range,
            fail_after_units=fail_after_units,
            expected_sha_col=expected_sha_col,
        )


def _build_index_resumable_unlocked(
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

    def run_unit(unit: str, fingerprint: str, fn, extra: dict | None = None):
        if unit_done(out_dir, unit, fingerprint):
            return False
        maybe_fail()
        t0 = time.perf_counter()
        rows = fn()
        commit_unit(
            out_dir, unit, fingerprint, rows, (time.perf_counter() - t0) * 1000, extra
        )
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

        # cluster_by_doc=False: the rows are re-partitioned by term
        # bucket on the next line, so the doc_id exchange would be dead
        postings = build_postings_with_dl(docs, cluster_by_doc=False).withColumn(
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

        # built_avgdl: the avgdl baked into this bucket's block_max_impact
        # values — after an upsert shifts corpus avgdl, impact_scale()
        # derives a sound pruning bound from it (see upsert_index)
        run_unit(unit, fp, do_bucket, extra={"built_avgdl": stats.avgdl, "salt_range": salt_range})

    return {
        "out_dir": out_dir,
        "executed_units": executed["n"],
        "n_buckets": n_buckets,
        "stats": stats,
    }


# --------------------------------------------------------------- upsert/delete
#
# Incremental re-ingest on a built index (the Iceberg MERGE/DELETE story,
# reference analogue: idempotent upsert via deterministic _ids,
# es_indexer.py:176-179, and delete-by-id, es_indexer.py:442-472):
# a changed doc's postings are REPLACED exactly once, new docs insert,
# deleted ids disappear — and only the term-hash buckets its (old + new)
# terms touch are rewritten; untouched bucket partitions keep their files
# and manifests. On a real lakehouse every _swap_dir below is one Iceberg
# copy-on-write snapshot commit.


def _versions_root(path: str) -> str:
    """Sibling dot-dir holding a swapped path's version directories.
    The leading dot keeps it out of Hadoop's file listing (hidden-path
    filter) and out of every `bucket=*` glob / partition discovery."""
    parent, name = os.path.split(path.rstrip("/"))
    return os.path.join(parent, f".{name}.versions")


def _next_version(vroot: str) -> str:
    taken = [
        int(d[1:]) for d in os.listdir(vroot) if d.startswith("v") and d[1:].isdigit()
    ]
    return f"v{(max(taken) + 1) if taken else 1:09d}"


def _repoint(path: str, vdir: str) -> None:
    """Atomically point `path` (a symlink) at version dir `vdir`.
    rename() over an existing symlink is atomic, so a reader resolving
    `path` ALWAYS sees a complete version — old or new, never ENOENT.
    The staging symlink lives INSIDE the hidden versions root: a name
    next to `path` (e.g. `bucket=3.lnktmp`) would transiently match
    `bucket=*` globs and corrupt partition discovery for racing readers."""
    target = os.path.relpath(vdir, os.path.dirname(path) or ".")
    tmp = os.path.join(_versions_root(path), ".lnktmp")
    try:
        os.unlink(tmp)
    except FileNotFoundError:
        pass
    os.symlink(target, tmp)
    os.rename(tmp, path)


def _swap_dir(path: str, write_fn) -> None:
    """Publish a rewritten table directory with reader-safe versioning.

    `path` is a SYMLINK into `.{name}.versions/vNNN`; a swap writes the
    new version dir completely, then atomically repoints the symlink
    (one rename — the path never disappears, closing the ENOENT window
    the old rename-pair had; VERDICT r6 Missing #1). The PREVIOUS
    version dir is retained for exactly one more swap so a reader whose
    scan already resolved the old target keeps reading real files —
    the single-host analogue of Iceberg readers pinning the prior
    snapshot, with expiry depth 1 (ARCHITECTURE §6). Readers more than
    one swap behind are out of contract, as with expired snapshots.

    Crash windows: a crash during write_fn leaves an unreferenced
    version dir (the unit manifest is uncommitted, so the unit reruns
    and retention collects the orphan); a crash around _repoint leaves
    at worst a .lnktmp (cleaned here). Legacy `.staging`/`.old` layouts
    from the old rename-pair protocol are still recovered, and a legacy
    REAL directory at `path` is migrated into the versioned layout on
    its first swap (one rename — the only remaining, one-time window)."""
    import shutil

    _recover_swap(path)
    vroot = _versions_root(path)
    os.makedirs(vroot, exist_ok=True)
    if os.path.lexists(path) and not os.path.islink(path):
        # one-time migration of a legacy real dir into the versioned layout
        mig = os.path.join(vroot, _next_version(vroot))
        os.rename(path, mig)
        _repoint(path, mig)
    prev = os.path.realpath(path) if os.path.islink(path) else None
    vdir = os.path.join(vroot, _next_version(vroot))
    write_fn(vdir)
    _repoint(path, vdir)
    keep = {os.path.basename(vdir)}
    if prev is not None and os.path.dirname(prev) == os.path.realpath(vroot):
        keep.add(os.path.basename(prev))  # in-flight readers' generation
    for d in os.listdir(vroot):
        if d.startswith("v") and d not in keep:
            shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)


def _recover_swap(path: str) -> None:
    """Clean up whatever a crashed swap left behind: a legacy mid-rename
    kill (path gone, `.staging` written) is completed; a leftover `.old`
    or `.lnktmp` is removable. Versioned-layout crashes need no repair —
    the symlink always names a complete version; orphaned version dirs
    are collected by the next successful swap's retention pass."""
    import shutil

    tmp, old = path + ".staging", path + ".old"
    if not os.path.exists(path) and os.path.exists(tmp):
        os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    try:
        os.unlink(os.path.join(_versions_root(path), ".lnktmp"))
    except FileNotFoundError:
        pass


def impact_scale(out_dir: str, current_avgdl: float) -> float:
    """Sound block-max pruning bound after upserts shifted corpus avgdl.

    Stored block_max_impact values were computed with each bucket's
    built_avgdl. For the true impact under avgdl_now:
    tf/(tf+c_now) <= tf/(tf+c_built) * (c_built/c_now) and
    c_built/c_now <= avgdl_now/avgdl_built, so scaling every stored bound
    by max(1, avgdl_now/avgdl_built) keeps MaxScore pruning lossless
    (scores themselves are always computed exactly from current lens).

    Raises ValueError when a segments manifest lacks built_avgdl (an
    index built before that field existed): silently returning 1.0 there
    would make MaxScore pruning UNSOUND after an avgdl-increasing upsert
    — rebuild the bucket (or the index) to restore the invariant."""
    scale = 1.0
    mdir = _manifest_dir(out_dir)
    for fn in os.listdir(mdir):
        if fn.startswith("segments__") and fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                built = json.load(f).get("built_avgdl")
            if not built:
                raise ValueError(
                    f"segments manifest {fn} lacks built_avgdl — cannot derive "
                    "a sound MaxScore bound; rebuild this bucket before "
                    "relying on impact-scaled pruning"
                )
            scale = max(scale, float(current_avgdl) / float(built))
    return scale


def upsert_index(
    spark: SparkSession,
    out_dir: str,
    delta_docs: DataFrame | None = None,
    *,
    deleted_ids: list[int] | DataFrame | None = None,
    salt_range: int = 1 << 20,
    fail_after_units: int | None = None,
) -> dict:
    """Public entry: :func:`_upsert_index_unlocked` under the index
    :func:`writer_lock`. The lock is taken BEFORE swap recovery runs —
    _recover_swap must never "repair" a staged rename that a live
    concurrent writer is mid-way through."""
    with writer_lock(out_dir, "upsert"):
        return _upsert_index_unlocked(
            spark,
            out_dir,
            delta_docs,
            deleted_ids=deleted_ids,
            salt_range=salt_range,
            fail_after_units=fail_after_units,
        )


def _upsert_index_unlocked(
    spark: SparkSession,
    out_dir: str,
    delta_docs: DataFrame | None = None,
    *,
    deleted_ids: list[int] | DataFrame | None = None,
    salt_range: int = 1 << 20,
    fail_after_units: int | None = None,
) -> dict:
    """Apply a keyed upsert (+ deletes) to a built index, incrementally.

    ``delta_docs`` must be in the canonical ingested shape (doc_id,
    content, sha256, tokens, doc_len, ...) with doc_ids equal to the base
    rows they replace (new ids = inserts). Steps, each lineage-committed
    under the delta fingerprint so a killed upsert resumes idempotently:

    1. docs/doc_lens/stats: base MERGE delta MINUS deletes (keyed window).
    2. affected terms = tokens of the OLD versions (re-derived from the
       stored docs — a semi-join against the delta ids) UNION the delta's
       tokens; persisted as a PARQUET plan side table (never a driver
       list — a 1% re-ingest wave of a 10^12-doc corpus has ~1e6+ distinct
       terms); affected buckets = their term-hash buckets (bounded by
       n_buckets, so those DO live in the manifest JSON).
    3. per affected postings bucket: drop rows of upserted/deleted doc_ids,
       append the delta's postings — one staged swap per bucket.
    4. term_stats: untouched terms keep their rows; affected terms get df
       recomputed from the rewritten buckets only (joins against the plan
       table, not literal lists).
    5. per affected segments bucket: rebuild from the new postings with
       CURRENT stats; manifests record built_avgdl for impact_scale().

    Guards:
    - a doc_id present in BOTH delta_docs and deleted_ids raises
      ValueError (applying both is ambiguous, and silently doing so would
      leave ghost postings whose doc has no doc_lens row);
    - an INTERRUPTED prior upsert with a different fingerprint raises
      RuntimeError: its docs table may already be swapped while postings
      are stale, and a different delta would silently orphan the
      interrupted delta's stale postings forever — resume the prior
      upsert (same delta) to completion first.

    ``deleted_ids`` accepts a python list (typical delete sets) or a
    single-column DataFrame of doc_ids (scale path — never collected).
    Query-side note: driver-resident state (TermDictionary, cached lens)
    snapshots the pre-upsert index; invalidate()/rebuild it afterwards.
    """
    from .indexing import build_postings_with_dl
    from .operators.merge import merge_upsert

    # recover any swap a previous run crashed in the middle of BEFORE
    # touching the tables (a mid-rename kill leaves only .staging behind)
    for t in ("docs", "doc_lens", "stats", "term_stats"):
        _recover_swap(os.path.join(out_dir, t))
    # derive bucket paths from .staging/.old names too: a mid-swap kill
    # can leave ONLY bucket=N.staging on disk
    seen = set()
    for d in list(os.listdir(f"{out_dir}/postings")):
        name = d.removesuffix(".staging").removesuffix(".old").removesuffix(".lnktmp")
        if name.startswith("bucket=") and name not in seen:
            seen.add(name)
            _recover_swap(os.path.join(out_dir, "postings", name))
    n_buckets = len(
        [
            d
            for d in os.listdir(f"{out_dir}/postings")
            if d.startswith("bucket=")
            and not d.endswith((".staging", ".old", ".lnktmp"))
        ]
    )
    base_docs = spark.read.parquet(f"{out_dir}/docs")

    if deleted_ids is None:
        dels_df = None
    elif isinstance(deleted_ids, DataFrame):
        dels_df = deleted_ids.toDF("doc_id").select(F.col("doc_id").cast("long"))
    else:
        dels_df = (
            spark.createDataFrame([(int(i),) for i in deleted_ids], "doc_id long")
            if deleted_ids
            else None
        )

    if delta_docs is None:
        delta_plain = None
    else:
        # align to the stored docs schema; columns the delta doesn't carry
        # (e.g. repo/path metadata on a content-only re-ingest) become NULL
        base_types = dict(base_docs.dtypes)
        d = delta_docs.drop("tokens")
        delta_plain = d.select(
            *[
                (F.col(c) if c in d.columns else F.lit(None).cast(base_types[c])).alias(c)
                for c in base_docs.columns
            ]
        )

    # delta fingerprint: content of the upsert, not of the base. All
    # components are order-independent aggregates (counts + decimal sums
    # of per-row hashes) so no id or sha list ever materializes on the
    # driver — ANSI-safe: xxhash64 sums are cast to decimal(38,0) first.
    def _fp_agg(df: DataFrame, *hash_cols: str) -> list:
        # ONE xxhash64 over all the columns together per row, then summed:
        # the fingerprint commits to the (doc_id, sha256) PAIRING —
        # independent per-column sums would collide for two deltas with
        # equal column multisets but swapped content, and a crash-resume
        # would then skip committed units for the wrong delta
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*hash_cols).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return [str(x) for x in r]

    import hashlib as _hl

    parts: dict = {}
    if delta_docs is not None:
        parts["delta"] = _fp_agg(delta_docs, "doc_id", "sha256")
        n_delta = int(parts["delta"][0])
    else:
        n_delta = 0
    if dels_df is not None:
        parts["dels"] = _fp_agg(dels_df, "doc_id")
        n_dels = int(parts["dels"][0])
    else:
        n_dels = 0
    if n_delta == 0 and n_dels == 0:
        return {"out_dir": out_dir, "affected_buckets": [], "executed_units": 0}
    delta_fp = _hl.sha256(json.dumps(parts, sort_keys=True).encode()).hexdigest()[:16]

    # refuse to start a DIFFERENT upsert while a prior one is interrupted
    _check_no_inprogress_upsert(out_dir, delta_fp)

    # upsert+delete of the same id in one call is ambiguous — and applying
    # both would re-append the deleted doc's postings after its doc_lens
    # row is gone (ghost postings that corrupt scoring). Refuse loudly.
    if delta_plain is not None and dels_df is not None:
        overlap = (
            delta_plain.select("doc_id")
            .join(F.broadcast(dels_df), "doc_id", "left_semi")
            .limit(1)
            .count()
        )
        if overlap:
            raise ValueError(
                "doc_ids appear in BOTH delta_docs and deleted_ids — split the "
                "call (delete first, then upsert) to make the intent explicit"
            )

    # affected ids side table (delta keys ∪ deletes) — broadcast into the
    # per-bucket anti-joins; realistic deltas (1e4-1e6 ids) broadcast fine
    # and Catalyst plan size stays O(1), unlike isin(...) literal lists
    id_frames = [f.select("doc_id") for f in (delta_plain, dels_df) if f is not None]
    ids_all = id_frames[0] if len(id_frames) == 1 else id_frames[0].union(id_frames[1])
    ids_df = F.broadcast(ids_all.distinct())

    executed = {"n": 0}

    def run_unit(unit, fn, extra=None):
        if unit_done(out_dir, unit, delta_fp):
            return False
        if fail_after_units is not None and executed["n"] >= fail_after_units:
            raise BuildInterrupted(f"injected failure after {executed['n']} units")
        t0 = time.perf_counter()
        rows = fn()
        commit_unit(out_dir, unit, delta_fp, rows, (time.perf_counter() - t0) * 1000, extra)
        executed["n"] += 1
        return True

    # ---- affected terms: old versions' tokens + delta's tokens.
    # Committed as the FIRST unit: a crash after the docs swap loses the
    # old versions' content, so a resumed upsert must read the plan from
    # durable storage, not recompute it from the (already-replaced) docs.
    # The terms themselves are a PARQUET side table keyed by the delta
    # fingerprint (a re-ingest wave's distinct vocabulary would OOM a
    # driver-side JSON list); the manifest JSON carries only the
    # fingerprint, the term count, and the (<= n_buckets) bucket ids.
    plan_data = _plan_dir(out_dir, delta_fp)
    if unit_done(out_dir, "upsert_plan", delta_fp):
        with open(_manifest_path(out_dir, "upsert_plan")) as f:
            plan = json.load(f)
        affected_buckets = plan["affected_buckets"]
        n_terms = int(plan["rows"])
    else:
        from .analysis import tokens_col

        old_terms = (
            base_docs.join(ids_df, "doc_id", "left_semi")
            .select(F.explode(tokens_col("content")).alias("term"))
        )
        frames = [old_terms]
        if delta_docs is not None:
            frames.append(delta_docs.select(F.explode("tokens").alias("term")))
        terms_plan = (
            frames[0] if len(frames) == 1 else frames[0].union(frames[1])
        ).distinct().withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
        # prior upserts completed (checked above) — their plan data is dead
        import shutil as _sh

        for d in os.listdir(_manifest_dir(out_dir)) if os.path.isdir(_manifest_dir(out_dir)) else []:
            if d.startswith("upsert_plan_data_") and d != os.path.basename(plan_data):
                _sh.rmtree(os.path.join(_manifest_dir(out_dir), d), ignore_errors=True)
        # plan data lands BEFORE its manifest commits: a crash mid-write
        # leaves an uncommitted unit and the (still-unswapped) docs table
        # lets the resume recompute the plan from scratch
        t0 = time.perf_counter()
        terms_plan.write.mode("overwrite").parquet(plan_data)
        terms_plan = spark.read.parquet(plan_data)
        affected_buckets = sorted(
            int(r["bucket"]) for r in terms_plan.select("bucket").distinct().collect()
        )
        n_terms = terms_plan.count()
        commit_unit(
            out_dir, "upsert_plan", delta_fp, n_terms,
            (time.perf_counter() - t0) * 1000,
            extra={"affected_buckets": affected_buckets, "plan_data": plan_data},
        )
        executed["n"] += 1

    # ---- stage 1: docs table (merge + delete), then doc_lens + stats
    def do_docs():
        merged = base_docs
        if delta_plain is not None:
            merged = merge_upsert(base_docs, delta_plain, key="doc_id").drop("src")
        if dels_df is not None:
            merged = merged.join(F.broadcast(dels_df), "doc_id", "left_anti")
        merged = merged.cache()
        n = merged.count()
        _swap_dir(f"{out_dir}/docs", lambda p: merged.write.parquet(p))
        new_docs = spark.read.parquet(f"{out_dir}/docs")
        _swap_dir(
            f"{out_dir}/doc_lens",
            lambda p: new_docs.select("doc_id", "doc_len").write.parquet(p),
        )
        st = new_docs.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
        ).collect()[0]
        _swap_dir(
            f"{out_dir}/stats",
            lambda p: spark.createDataFrame(
                [(int(st["n"]), float(st["avgdl"] or 0.0))], "n_docs long, avgdl double"
            ).write.parquet(p),
        )
        merged.unpersist()
        return n

    run_unit("upsert_docs", do_docs)

    # ---- stage 2: affected postings buckets
    delta_postings = None
    if delta_docs is not None:
        delta_postings = build_postings_with_dl(
            delta_docs, cluster_by_doc=False
        ).withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))

    for b in affected_buckets:

        def do_bucket(b=b):
            path = f"{out_dir}/postings/bucket={b}"
            keep = spark.read.parquet(path).join(ids_df, "doc_id", "left_anti")
            part = keep
            if delta_postings is not None:
                part = keep.unionByName(
                    delta_postings.filter(F.col("bucket") == b).drop("bucket")
                )
            part = part.cache()
            n = part.count()
            _swap_dir(path, lambda p: part.write.parquet(p))
            part.unpersist()
            return n

        run_unit(f"upsert_postings/bucket={b}", do_bucket)

    # ---- stage 3: term_stats (incremental: only affected terms recount).
    # The plan table joins in distributed; broadcast only while it is
    # small enough that shipping beats shuffling (AQE handles the rest).
    terms_plan_df = spark.read.parquet(plan_data).select("term")
    terms_df = (
        F.broadcast(terms_plan_df) if n_terms <= 2_000_000 else terms_plan_df
    )

    def do_term_stats():
        kept = spark.read.parquet(f"{out_dir}/term_stats").join(
            terms_df, "term", "left_anti"
        )
        touched = (
            spark.read.option("basePath", f"{out_dir}/postings")
            .parquet(*[f"{out_dir}/postings/bucket={b}" for b in affected_buckets])
            .join(terms_df, "term", "left_semi")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        merged = kept.unionByName(touched).cache()
        n = merged.count()
        _swap_dir(f"{out_dir}/term_stats", lambda p: merged.write.parquet(p))
        merged.unpersist()
        return n

    run_unit("upsert_term_stats", do_term_stats)

    # ---- stage 4: affected segments buckets (with CURRENT stats)
    st_row = spark.read.parquet(f"{out_dir}/stats").collect()[0]
    from .indexing import CorpusStats

    stats = CorpusStats(int(st_row["n_docs"]), float(st_row["avgdl"]))
    for b in affected_buckets:

        def do_seg(b=b):
            part = spark.read.parquet(f"{out_dir}/postings/bucket={b}")
            segs = build_segments(part, stats, salt_range=salt_range)
            # versioned swap, NOT mode("overwrite"): overwrite deletes the
            # live dir before writing — a racing reader would see ENOENT
            # or a partial bucket
            _swap_dir(f"{out_dir}/segments/bucket={b}", lambda p: segs.write.parquet(p))
            return spark.read.parquet(f"{out_dir}/segments/bucket={b}").count()

        # unit name matches the build's so impact_scale() sees ONE manifest
        # per bucket carrying the avgdl its impacts were computed with
        run_unit(
            f"segments/bucket={b}",
            do_seg,
            extra={"built_avgdl": stats.avgdl, "salt_range": salt_range},
        )

    return {
        "out_dir": out_dir,
        "affected_buckets": affected_buckets,
        "affected_terms": n_terms,
        "executed_units": executed["n"],
        "stats": stats,
    }


def _plan_dir(out_dir: str, delta_fp: str) -> str:
    return os.path.join(_manifest_dir(out_dir), f"upsert_plan_data_{delta_fp}")


def _upsert_terminal_unit(plan: dict) -> str:
    buckets = plan.get("affected_buckets") or []
    return f"segments/bucket={buckets[-1]}" if buckets else "upsert_term_stats"


def _check_no_inprogress_upsert(out_dir: str, delta_fp: str) -> None:
    """Refuse a different-fingerprint upsert while a prior one is
    interrupted: its docs table may already be swapped while postings are
    stale, and starting a different delta would silently discard the
    interrupted plan — the replaced docs' stale postings would then
    survive forever with no error. Resume the prior delta to completion
    (same delta_docs/deleted_ids => same fingerprint) first."""
    p = _manifest_path(out_dir, "upsert_plan")
    if not os.path.exists(p):
        return
    with open(p) as f:
        plan = json.load(f)
    prior_fp = plan.get("input_fingerprint")
    if prior_fp == delta_fp:
        return
    if not unit_done(out_dir, _upsert_terminal_unit(plan), prior_fp):
        raise RuntimeError(
            f"an interrupted upsert (fingerprint {prior_fp}) is in progress on "
            f"{out_dir}; resume it to completion with the SAME delta before "
            f"applying a different one (got fingerprint {delta_fp})"
        )


def delete_from_index(
    spark: SparkSession, out_dir: str, ids: list[int], *, salt_range: int = 1 << 20
) -> dict:
    """DELETE FROM the index by doc id — the delta-less half of
    :func:`upsert_index` (docs, postings, term_stats, segments all drop
    the rows; only the buckets holding the deleted docs' terms rewrite)."""
    return upsert_index(spark, out_dir, None, deleted_ids=ids, salt_range=salt_range)


def _resolve_snapshot(path: str) -> str:
    """Pin the version directory behind a swapped path.

    Spark's file listing records paths THROUGH a symlink, and executors
    re-resolve it per file — so a scan planned against `{dir}/docs` would
    chase a concurrent upsert's repoint mid-read and miss the old
    generation's files. realpath() at plan time pins the scan to the
    immutable version dir instead; `_swap_dir` retains that generation
    for one further swap, so the scan completes — the single-host
    analogue of an Iceberg reader pinning the prior snapshot (expiry
    depth 1). A legacy un-versioned real dir resolves to itself."""
    return os.path.realpath(path)


def read_table(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    """Snapshot-pinned read of one index table (docs, doc_lens, stats,
    term_stats, postings/bucket=N, ...) — see :func:`_resolve_snapshot`."""
    return spark.read.parquet(_resolve_snapshot(os.path.join(out_dir, name)))


def segment_bucket_ids(out_dir: str) -> list[int]:
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(f"{out_dir}/segments")
        if d.startswith("bucket=") and not d.endswith((".staging", ".old", ".lnktmp"))
    )


def load_segments(
    spark: SparkSession, out_dir: str, buckets: list[int] | None = None
) -> DataFrame:
    """Union of snapshot-pinned per-bucket scans, `bucket` column attached.

    Per-bucket reads (instead of one `bucket=*` glob) are what make the
    snapshot pinning work: each bucket dir resolves to ITS version dir at
    plan time. Bucket pruning becomes explicit path selection via
    ``buckets`` — same files skipped as Catalyst's partition pruning on
    the old glob layout, decided one level earlier."""
    segs = None
    for b in segment_bucket_ids(out_dir) if buckets is None else sorted(buckets):
        df = read_table(spark, out_dir, f"segments/bucket={b}").withColumn(
            "bucket", F.lit(b)
        )
        segs = df if segs is None else segs.unionByName(df)
    if segs is None:
        raise ValueError(f"no segment buckets under {out_dir}/segments")
    return segs


def n_buckets_of(out_dir: str) -> int:
    return len(segment_bucket_ids(out_dir))


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
    hash into — the scan is built from only those buckets' (snapshot-
    pinned) dirs, so untouched bucket dirs are never listed or read; the
    term IN-filter then prunes row groups inside the surviving files."""
    all_buckets = segment_bucket_ids(out_dir)
    buckets = buckets_for_terms(spark, terms, len(all_buckets))
    if not buckets:  # no terms: empty frame with the segments schema
        return load_segments(spark, out_dir, buckets=all_buckets[:1]).filter(
            F.lit(False)
        ).drop("bucket")
    return load_segments(spark, out_dir, buckets=buckets).drop("bucket")
