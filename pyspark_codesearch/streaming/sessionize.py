"""Stateful streaming sessionization via applyInPandasWithState.

The streaming counterpart of operators/relational.sessionize_events
(same gap rule, same integer-cents value sums): per-user state carries
the open session across micro-batches; a session CLOSES (and is emitted,
append-mode) when a later event arrives more than ``gap_minutes`` after
the previous one, or when the processing-time timeout fires for an idle
user. This is the custom-stateful-operator shape Structured Streaming
cannot express with windowed aggs (session windows keyed on dynamic
gaps + custom accumulators).

Scale notes: state is per user_id — one small fixed-size row each —
sharded by the stream's groupBy hash; a skewed user costs one task, not
a shuffle storm. Timestamps are integer epoch MICROSECONDS end-to-end
(the repo's timestamp-math convention); money sums are integer cents.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = (
    "user_id long, session_id long, n_events long, session_value double, "
    "start_us long, end_us long"
)
SESSION_STATE = "session_id long, start_us long, last_us long, n_events long, cents long"


def _close(user_id, sid, start, last, n, cents) -> dict:
    return {
        "user_id": user_id,
        "session_id": sid,
        "n_events": n,
        "session_value": cents / 100.0,
        "start_us": start,
        "end_us": last,
    }


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """events(user_id, ts timestamp, value double) stream -> CLOSED
    sessions (append mode). ``idle_timeout_ms`` also closes sessions for
    users with no events for that long of processing time (None = only a
    newer event closes a session)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                sid, start, last, n, cents = state.get
                # keep the session COUNTER (a removed state would restart
                # session_id at 0 and re-emit already-used (user, sid)
                # keys); the empty-session sentinel (start=None, n=0) is
                # one tiny row per idle user and never re-emits
                state.update((sid + 1, None, None, 0, 0))
                if n > 0:
                    yield pd.DataFrame([_close(user_id, sid, start, last, n, cents)])
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic replay: order by event time, then event id if present
        sort_cols = ["ts_us"] + (["event_id"] if "event_id" in batch.columns else [])
        batch = batch.sort_values(sort_cols)
        if state.exists:
            sid, start, last, n, cents = state.get
        else:
            sid, start, last, n, cents = 0, None, None, 0, 0
        out: list[dict] = []
        for ts_us, c in zip(batch["ts_us"].astype("int64"), batch["cents"].astype("int64")):
            ts_us, c = int(ts_us), int(c)
            if last is not None and ts_us - last > gap_us:
                out.append(_close(user_id, sid, start, last, n, cents))
                sid, start, n, cents = sid + 1, ts_us, 0, 0
            if start is None:
                start = ts_us
            last, n, cents = ts_us, n + 1, cents + c
        state.update((sid, start, last, n, cents))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if out:
            yield pd.DataFrame(out)

    prepped = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        *([F.col("event_id")] if "event_id" in events.columns else []),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_OUTPUT, SESSION_STATE, "append", timeout
    )


def sessionize_stream_event_time(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time sessionization: sessions close deterministically on
    STREAM time, matching the batch gap rule (operators/relational.
    sessionize_df) on the same non-late events.

    Two close paths, both driven by event time:
    - a later event from the same user more than ``gap_minutes`` after
      the previous one (same as :func:`sessionize_stream`);
    - the event-time WATERMARK passing last_event + gap
      (GroupStateTimeout.EventTimeTimeout) — an idle user's open session
      closes once the stream's time, not the wall clock, moves past the
      gap. Replayed/backfilled history closes sessions identically.

    Late data: rows older than the current watermark are dropped (the
    engine filters them before the stateful operator; the scorer also
    drops them defensively), so a straggler cannot reopen or corrupt an
    already-closed session. The batch rule applied to the surviving
    events yields the same sessions — pinned by the parity test.

    Scale notes: identical state shape to :func:`sessionize_stream` (one
    fixed-size row per user); timers are per-key timestamps managed by
    the state store, so a watermark advance touches only keys whose
    timeout passed.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            sid, start, last, n, cents = state.get
            # keep the session COUNTER (see sessionize_stream): the
            # sentinel registers no new timer, so it costs one tiny row
            # per idle user and never re-emits a (user, session_id) key
            state.update((sid + 1, None, None, 0, 0))
            if n > 0:
                yield pd.DataFrame([_close(user_id, sid, start, last, n, cents)])
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        wm_us = state.getCurrentWatermarkMs() * 1000
        # defensive late-drop (the engine already filters rows older than
        # the watermark ahead of stateful operators; keeping the filter
        # here makes the semantics independent of that implementation
        # detail)
        batch = batch[batch["ts_us"].astype("int64") >= wm_us]
        if batch.empty:
            return
        sort_cols = ["ts_us"] + (["event_id"] if "event_id" in batch.columns else [])
        batch = batch.sort_values(sort_cols)
        if state.exists:
            sid, start, last, n, cents = state.get
        else:
            sid, start, last, n, cents = 0, None, None, 0, 0
        out: list[dict] = []
        for ts_us, c in zip(batch["ts_us"].astype("int64"), batch["cents"].astype("int64")):
            ts_us, c = int(ts_us), int(c)
            if last is not None and ts_us - last > gap_us:
                out.append(_close(user_id, sid, start, last, n, cents))
                sid, start, n, cents = sid + 1, ts_us, 0, 0
            if start is None:
                start = ts_us
            last, n, cents = ts_us, n + 1, cents + c
        state.update((sid, start, last, n, cents))
        # the session closes when the watermark passes last + gap; a
        # timer must be strictly ahead of the current watermark (replayed
        # events near the watermark would otherwise register in the past)
        state.setTimeoutTimestamp(max(last // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(out)

    prepped = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            "ts",  # event-time column rides along for watermark eviction
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            *([F.col("event_id")] if "event_id" in events.columns else []),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_OUTPUT, SESSION_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )
