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


# ---------------------------------------------------------------- event time
EV_BATCH1 = [
    _ev(1, 0, 10.0, 0), _ev(1, 5, 2.5, 1), _ev(2, 0, 7.0, 2),
]
EV_BATCH2 = [
    _ev(1, 50, 1.0, 3),    # closes u1 s0 in-fn (gap 45)
    _ev(2, 90, 3.0, 4),    # closes u2 s0 in-fn
    _ev(1, 200, 1.0, 5),   # closes u1 s1 in-fn; watermark -> 190
    _ev(3, 210, 5.0, 6),   # watermark -> 200: u2 s1 timer (90+30=120) fires
]
EV_BATCH3 = [
    _ev(1, 100, 99.0, 7),  # LATE: older than watermark 200 -> dropped
    _ev(9, 1000, 1.0, 8),  # watermark -> 990: u1 s2 (230), u3 s0 (240) fire
]
EV_BATCH4 = [
    _ev(9, 2000, 1.0, 9),  # closes u9 s0 in-fn; u9 s1 stays open
]

EV_EXPECTED = {
    (1, 0): (2, 12.5), (1, 1): (1, 1.0), (1, 2): (1, 1.0),
    (2, 0): (1, 7.0), (2, 1): (1, 3.0),
    (3, 0): (1, 5.0),
    (9, 0): (1, 1.0),
}


def test_event_time_sessionize_with_late_drop(spark, tmp_path):
    """Watermark-driven close: idle sessions close when STREAM time (not
    the wall clock) passes last_event + gap; a late event older than the
    watermark is dropped and cannot reopen a closed session."""
    from pyspark_codesearch.streaming.sessionize import sessionize_stream_event_time

    src = tmp_path / "ev_in"
    ckpt = str(tmp_path / "ev_ck")
    sink = str(tmp_path / "ev_out")
    src.mkdir()
    schema = "event_id long, user_id long, ts timestamp, value double"

    for chunk in [EV_BATCH1, EV_BATCH2, EV_BATCH3, EV_BATCH4]:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = sessionize_stream_event_time(stream, gap_minutes=30, watermark="10 minutes")
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
    got = {(u, sid): (n, val) for (u, sid, n, val, _s, _e) in collected}
    assert got == EV_EXPECTED


def test_event_time_stream_matches_batch_rule(spark, tmp_path):
    """Parity: the stream's closed sessions == the batch gap rule
    (operators/relational.sessionize_df) over the NON-LATE events, for
    every session the watermark has closed (per-user ordered session
    lists compare; stream sids start at 0, batch at 1)."""
    from pyspark_codesearch.operators.relational import sessionize_df
    from pyspark_codesearch.streaming.sessionize import sessionize_stream_event_time

    src = tmp_path / "par_in"
    ckpt = str(tmp_path / "par_ck")
    sink = str(tmp_path / "par_out")
    src.mkdir()
    schema = "event_id long, user_id long, ts timestamp, value double"

    for chunk in [EV_BATCH1, EV_BATCH2, EV_BATCH3, EV_BATCH4]:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            sessionize_stream_event_time(stream, gap_minutes=30, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    stream_rows = [tuple(r) for r in spark.read.parquet(sink).collect()]
    per_user_stream: dict = {}
    for u, sid, n, val, _s, _e in stream_rows:
        per_user_stream.setdefault(u, {})[sid] = (n, val)

    # batch side: same fixture minus the dropped late event
    kept = [e for e in EV_BATCH1 + EV_BATCH2 + EV_BATCH3 + EV_BATCH4 if e[0] != 7]
    batch = sessionize_df(spark.createDataFrame(kept, schema), gap_minutes=30)
    per_user_batch: dict = {}
    for r in batch.collect():
        per_user_batch.setdefault(r["user_id"], []).append(
            (r["n_events"], r["session_value"])
        )
    for u, sessions in per_user_stream.items():
        ordered = [sessions[sid] for sid in sorted(sessions)]
        # the stream emits the CLOSED prefix of the batch's session list
        assert ordered == per_user_batch[u][: len(ordered)], u
        assert len(ordered) >= len(per_user_batch[u]) - 1  # at most the open tail


def test_event_time_out_of_order_across_batches(spark, tmp_path):
    """An event that arrives in a LATER micro-batch with an EARLIER
    (non-late) timestamp slots into the correct position: pending events
    buffer in state until the watermark passes them, so the gap rule
    runs in global event-time order exactly like the batch sort."""
    from pyspark_codesearch.operators.relational import sessionize_df
    from pyspark_codesearch.streaming.sessionize import sessionize_stream_event_time

    src = tmp_path / "ooo_in"
    ckpt = str(tmp_path / "ooo_ck")
    sink = str(tmp_path / "ooo_out")
    src.mkdir()
    schema = "event_id long, user_id long, ts timestamp, value double"

    # u1: 100' arrives first; 95' arrives one batch LATER (watermark is
    # only 90' then — not late). In arrival order the naive gap rule
    # would move `last` backward; in event-time order 95' and 100' are
    # one session, later split from 200'.
    batches = [
        [_ev(1, 100, 1.0, 0)],
        [_ev(1, 95, 2.0, 1)],
        [_ev(1, 200, 4.0, 2)],           # wm -> 190: finalizes 95+100
        [_ev(9, 1000, 0.5, 3)],          # wm -> 990: closes everything of u1
        [_ev(9, 2000, 0.5, 4)],          # closes u9's first session
    ]
    for chunk in batches:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        q = (
            sessionize_stream_event_time(
                spark.readStream.schema(schema).parquet(str(src)),
                gap_minutes=30, watermark="10 minutes",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows = [tuple(r) for r in spark.read.parquet(sink).collect()]
    got = {(u, s): (nn, v, st, en) for (u, s, nn, v, st, en) in rows}
    base = int(pd.Timestamp("2024-01-01").value // 1000)  # _ev's epoch base, us
    m = lambda mins: base + mins * MIN_US  # noqa: E731
    assert got[(1, 0)] == (2, 3.0, m(95), m(100)), got  # 95'+100' ONE session
    assert got[(1, 1)] == (1, 4.0, m(200), m(200))
    assert got[(9, 0)] == (1, 0.5, m(1000), m(1000))
    # and the batch rule over the same events agrees per user
    batch = sessionize_df(
        spark.createDataFrame([e for c in batches for e in c], schema), gap_minutes=30
    ).collect()
    per_user = {}
    for r in batch:
        per_user.setdefault(r["user_id"], []).append((r["n_events"], r["session_value"]))
    stream_u1 = [got[(1, s)][:2] for s in sorted(s for (u, s) in got if u == 1)]
    assert stream_u1 == per_user[1][: len(stream_u1)]


def test_event_time_idle_state_removal(spark, tmp_path):
    """remove_idle_state + session_id_from_start: fully-idle users leave
    the state store (numRowsTotal shrinks to just the live user), session
    ids become start timestamps and stay unique across state loss, and a
    returning user's sessions emit exactly once."""
    from pyspark_codesearch.streaming.sessionize import sessionize_stream_event_time

    with pytest.raises(ValueError):
        sessionize_stream_event_time(
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .parquet(str(tmp_path)),
            remove_idle_state=True,
        )

    def run(remove_idle, tag):
        src = tmp_path / f"in_{tag}"
        ckpt = str(tmp_path / f"ck_{tag}")
        sink = str(tmp_path / f"out_{tag}")
        src.mkdir()
        schema = "event_id long, user_id long, ts timestamp, value double"
        stages = [
            [_ev(1, 0, 10.0, 0), _ev(1, 5, 2.5, 1), _ev(2, 0, 7.0, 2)],
            [_ev(99, 120, 0.0, 3)],            # advances wm to 110'
            [_ev(99, 130, 0.0, 4)],            # batch runs AT wm 110' -> u1/u2 close + idle
            [_ev(1, 200, 4.0, 5), _ev(1, 205, 1.0, 6), _ev(99, 400, 0.0, 7)],
            [_ev(99, 410, 0.0, 8)],            # batch at wm 390' -> u1 second session closes
        ]
        last_state_rows = None
        for chunk in stages:
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            stream = spark.readStream.schema(schema).parquet(str(src))
            q = (
                sessionize_stream_event_time(
                    stream, gap_minutes=30, watermark="10 minutes",
                    remove_idle_state=remove_idle,
                    session_id_from_start=True,
                )
                .writeStream.format("parquet")
                .option("path", sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            for p in reversed(q.recentProgress):
                ops = p.get("stateOperators") or []
                if ops:
                    last_state_rows = ops[0]["numRowsTotal"]
                    break
        rows = [tuple(r) for r in spark.read.parquet(sink).collect()]
        return rows, last_state_rows

    rows, state_rows = run(True, "rm")
    base_us = int(pd.Timestamp("2024-01-01").value // 1000)
    mine = sorted((u, sid, n, v) for u, sid, n, v, _s, _e in rows if u in (1, 2))
    assert mine == [
        (1, base_us, 2, 12.5),                    # session_id == start_us
        (1, base_us + 200 * MIN_US, 2, 5.0),      # post-removal return: new unique id
        (2, base_us, 1, 7.0),
    ]
    # no duplicate (user, session_id) keys anywhere
    keys = [(u, sid) for u, sid, *_ in rows]
    assert len(keys) == len(set(keys))
    # state store holds only the still-live user (99)
    assert state_rows == 1, state_rows

    rows_keep, state_rows_keep = run(False, "keep")
    assert sorted((u, sid, n, v) for u, sid, n, v, _s, _e in rows_keep if u in (1, 2)) == mine
    assert state_rows_keep == 3, state_rows_keep   # u1 + u2 sentinels retained
