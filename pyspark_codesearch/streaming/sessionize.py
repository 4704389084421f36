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


SESSION_STATE_ET = SESSION_STATE + ", pend_ts array<long>, pend_cents array<long>"


def sessionize_stream_event_time(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    remove_idle_state: bool = False,
    session_id_from_start: bool = False,
) -> DataFrame:
    """Event-time sessionization: sessions close deterministically on
    STREAM time, matching the batch gap rule (operators/relational.
    sessionize_df) on the same non-late events — INCLUDING events that
    arrive out of order across micro-batches.

    Correctness model: an event with ``ts >= watermark`` may still be
    PRECEDED by a future arrival (anything with ts' in [watermark, ts)),
    so committing it to a session immediately would lock in a wrong
    order. Events therefore buffer in per-user state as *pending* until
    the watermark passes them; only then are they FINALIZED — fed
    through the gap rule in global event-time order, exactly like the
    batch sort. An open session closes when the watermark passes
    last_finalized + gap (no finalized, pending, or future event can
    extend it: future arrivals all have ts >= watermark > last + gap).

    Rows older than the watermark at arrival are dropped (engine filter
    + a defensive in-scorer filter): a straggler cannot reopen a closed
    session. Timers re-register on EVERY invocation (Spark clears a
    group's timeout each time the function runs) at
    min(open_close_time, first_pending + gap), clamped above the current
    watermark; early fires are harmless (the state re-registers).

    Scale notes: per-user state = one fixed-size row + the pending
    buffer, which holds ONLY events inside the watermark horizon
    (bounded by delay x per-user event rate); timers are per-key
    timestamps in the state store, so a watermark advance touches only
    keys whose timeout passed.

    Idle-state cleanup: by default a user whose sessions all closed
    keeps a tiny sentinel row forever — the session COUNTER must
    survive or a returning user would restart at session_id 0 and
    re-emit used (user, session_id) keys. Over 10^9-user populations
    that residual is real state-store weight. ``remove_idle_state=True``
    REMOVES fully-idle state (no open session, no pending) the moment
    it goes idle; removal is only id-safe when ids cannot collide
    across state loss, so it requires ``session_id_from_start=True``:
    session_id becomes the session's start timestamp (epoch us) —
    unique per user because a user's sessions are disjoint in event
    time, and a post-removal return necessarily starts at
    ts >= watermark > every prior session's start.
    """
    if remove_idle_state and not session_id_from_start:
        raise ValueError(
            "remove_idle_state requires session_id_from_start=True: "
            "removing counter-based state would re-emit used session ids "
            "when the user returns"
        )
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_ms = max(state.getCurrentWatermarkMs(), 0)
        wm_us = wm_ms * 1000
        if state.exists:
            sid, start, last, n, cents, pend_ts, pend_cents = state.get
            pend = list(zip(pend_ts or [], pend_cents or []))
        else:
            sid, start, last, n, cents, pend = 0, None, None, 0, 0, []
        if not state.hasTimedOut:
            for batch in pdfs:
                if batch.empty:
                    continue
                ts_arr = batch["ts_us"].astype("int64")
                c_arr = batch["cents"].astype("int64")
                for ts_us, c in zip(ts_arr, c_arr):
                    if int(ts_us) >= wm_us:  # defensive late-drop
                        pend.append((int(ts_us), int(c)))
        pend.sort()
        finalized = [(t, c) for t, c in pend if t < wm_us]
        pend = [(t, c) for t, c in pend if t >= wm_us]
        out: list[dict] = []

        def emit(sid_, start_, last_, n_, cents_):
            out.append(_close(
                user_id, start_ if session_id_from_start else sid_,
                start_, last_, n_, cents_,
            ))

        for ts_us, c in finalized:
            if last is not None and ts_us - last > gap_us:
                emit(sid, start, last, n, cents)
                sid, start, n, cents = sid + 1, ts_us, 0, 0
            if start is None:
                start = ts_us
            last, n, cents = ts_us, n + 1, cents + c
        if n > 0 and wm_us > last + gap_us:
            emit(sid, start, last, n, cents)
            sid, start, last, n, cents = sid + 1, None, None, 0, 0
        if remove_idle_state and n == 0 and not pend:
            # fully idle: nothing this state protects except the counter,
            # and start-derived ids make the counter disposable — drop the
            # row now; a returning user recreates state from scratch
            state.remove()
            if out:
                yield pd.DataFrame(out)
            return
        state.update(
            (sid, start, last, n, cents,
             [t for t, _ in pend], [c for _, c in pend])
        )
        cands = []
        if n > 0:
            cands.append(last // 1000 + gap_ms)
        if pend:
            cands.append(pend[0][0] // 1000 + gap_ms)
        if cands:
            state.setTimeoutTimestamp(max(min(cands), wm_ms + 1))
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
        fn, SESSION_OUTPUT, SESSION_STATE_ET, "append", GroupStateTimeout.EventTimeTimeout
    )
