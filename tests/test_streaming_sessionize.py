"""Stateful streaming sessionization: cross-micro-batch state, closed
sessions match the batch sessionizer's rule (gap > 30 min, cents sums)."""

import pandas as pd
import pytest

from pyspark_codesearch.streaming.sessionize import sessionize_stream

MIN_US = 60 * 1_000_000


def _ev(user, minute, value, eid):
    ts = (pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=minute)).to_pydatetime()
    return (eid, user, ts, value)


BATCH1 = [
    _ev(1, 0, 10.0, 0),
    _ev(1, 5, 2.5, 1),
    _ev(1, 50, 1.0, 2),    # gap 45 min -> closes session 0 (2 events, 12.50)
    _ev(2, 0, 7.0, 3),
]
BATCH2 = [
    _ev(1, 55, 4.0, 4),    # continues user 1 session 1 ACROSS the restart
    _ev(2, 90, 3.0, 5),    # gap 90 min -> closes user 2 session 0 (1 event, 7.00)
    _ev(1, 200, 1.0, 6),   # closes user 1 session 1 (events at 50,55 -> 5.00)
]


def _expected_closed():
    """Pure-python oracle: sessions closed by a later event."""
    return {
        (1, 0): (2, 12.5),   # events 0,1
        (2, 0): (1, 7.0),    # event 3
        (1, 1): (2, 5.0),    # events 2,4
    }


@pytest.mark.parametrize("chunks", [[BATCH1 + BATCH2], [BATCH1, BATCH2]])
def test_streaming_sessions_match_batch_rule(spark, tmp_path, chunks):
    """One drain or two (state survives the checkpoint restart between
    AvailableNow drains) — the closed-session set is identical."""
    src = tmp_path / "events_in"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    schema = "event_id long, user_id long, ts timestamp, value double"
    sink = str(tmp_path / "sessions_out")
    for chunk in chunks:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = sessionize_stream(stream, gap_minutes=30)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    collected = [tuple(r) for r in spark.read.parquet(sink).collect()]
    got = {
        (u, sid): (n, val)
        for (u, sid, n, val, _start, _end) in collected
    }
    assert got == _expected_closed()
    # start/end stamps are the session's first/last event times
    by_key = {(r[0], r[1]): r for r in collected}
    start, end = by_key[(1, 0)][4], by_key[(1, 0)][5]
    assert end - start == 5 * MIN_US


def test_streaming_sessionize_is_append_incremental(spark, tmp_path):
    """The second drain emits ONLY newly-closed sessions (no re-emission
    of sessions closed in drain 1) — append-mode correctness."""
    src = tmp_path / "ev"
    ckpt = str(tmp_path / "ck")
    src.mkdir()
    schema = "event_id long, user_id long, ts timestamp, value double"

    sink = str(tmp_path / "out")
    seen: set = set()

    def drain(i):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = [tuple(r) for r in spark.read.parquet(sink).collect()]
        fresh = [r for r in rows if r not in seen]
        seen.update(rows)
        return fresh

    spark.createDataFrame(BATCH1, schema).coalesce(1).write.mode("append").parquet(str(src))
    first = drain(0)
    assert {(r[0], r[1]) for r in first} == {(1, 0)}
    spark.createDataFrame(BATCH2, schema).coalesce(1).write.mode("append").parquet(str(src))
    second = drain(1)
    assert {(r[0], r[1]) for r in second} == {(2, 0), (1, 1)}
