"""Custom stateful streaming operator (STR-07): encounter state machine.

The provisioned system tracks encounter lifecycle (admit → …
→ discharge) through the aktin operational schema's import/state
bookkeeping (aktin_init.sql, reference src/docker/database/Dockerfile:33).
Streaming analogue: per-key state via applyInPandasWithState — open a
visit on the first event, count activity, close on 'purchase'
(stand-in for the discharge trigger), optionally time out idle visits.

The idle timeout is opt-in: with ProcessingTimeTimeout an availableNow
replay cannot terminate until every pending timeout fires, so bounded
replays (tests, backfills) run with NoTimeout and continuous production
queries pass `idle_timeout_ms`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, opened string, closed boolean"
OUTPUT_SCHEMA = ("user_id long, n_events long, opened string, "
                 "closed boolean")


def make_tracker(idle_timeout_ms: int | None):
    def track(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, opened, _ = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": user_id, "n_events": n,
                                 "opened": opened, "closed": True}])
            return
        n, opened, closed = state.get if state.exists else (0, None, False)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            if opened is None and len(pdf):
                opened = str(pdf["ts"].iloc[0])
            n += len(pdf)
            if (pdf["event_type"] == "purchase").any():
                closed = True
        if closed:
            if state.exists:
                state.remove()
            yield pd.DataFrame([{"user_id": user_id, "n_events": n,
                                 "opened": opened, "closed": True}])
        else:
            state.update((n, opened, False))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
            yield pd.DataFrame([{"user_id": user_id, "n_events": n,
                                 "opened": opened, "closed": False}])
    return track


def encounter_state_machine(events: DataFrame,
                            idle_timeout_ms: int | None = None) -> DataFrame:
    """events (streaming) → per-user visit state transitions."""
    timeout = (GroupStateTimeout.NoTimeout if idle_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                make_tracker(idle_timeout_ms), OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", timeout))


def encounter_state_machine_tws(events: DataFrame) -> DataFrame:
    """Same state machine on the Spark 4 `transformWithStateInPandas`
    API (successor to applyInPandasWithState): typed ValueState, a
    StatefulProcessor lifecycle, and per-key Arrow batches.

    Requires `google.protobuf` at runtime (the state-server protocol);
    the test suite skips when it is absent from the environment."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)
    from pyspark.sql.types import (BooleanType, LongType, StringType,
                                   StructField, StructType)

    state_schema = StructType([
        StructField("n_events", LongType()),
        StructField("opened", StringType()),
        StructField("closed", BooleanType()),
    ])

    class EncounterProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._visit = handle.getValueState("visit", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            n, opened, closed = (self._visit.get() if self._visit.exists()
                                 else (0, None, False))
            for pdf in rows:
                pdf = pdf.sort_values("ts")
                if opened is None and len(pdf):
                    opened = str(pdf["ts"].iloc[0])
                n += len(pdf)
                if (pdf["event_type"] == "purchase").any():
                    closed = True
            if closed:
                self._visit.clear()
            else:
                self._visit.update((n, opened, False))
            yield pd.DataFrame([{"user_id": user_id, "n_events": n,
                                 "opened": opened, "closed": closed}])

        def close(self) -> None:
            pass

    return (events.groupBy("user_id")
            .transformWithStateInPandas(
                EncounterProcessor(), OUTPUT_SCHEMA, "Update", "None"))


# ------------------------------------------- event-time session tracker

#: str_04's session gap, shared with the streaming-native str_13
SESSION_GAP_MS = 30 * 60 * 1000

SESS_STATE_SCHEMA = "start_us long, last_us long, n long"
SESS_OUTPUT_SCHEMA = "user_id long, start_us long, n_events long"


def session_tracker(key, pdfs, state: GroupState):
    """Gap-based sessionizer with REAL event-time timeouts (STR-13):
    a session closes inline when a later event of the same user opens
    the next one (ts ≥ last + gap — str_04's exact boundary), or by
    EventTimeTimeout once the watermark passes last + gap.  Sessions
    still inside the gap horizon at stream end never emit — the same
    stated-not-papered-over contract as str_12's outer join, encoded
    in the oracle's WHERE.

    The timeout timestamp is clamped one past the current watermark:
    semantically free (a timer at ≤ watermark would fire immediately
    anyway) and required by the state API, which rejects timestamps
    not beyond the watermark."""
    (user_id,) = key
    if state.hasTimedOut:
        s, l, n = state.get
        state.remove()
        yield pd.DataFrame([{"user_id": user_id, "start_us": s,
                             "n_events": n}])
        return
    s, l, n = state.get if state.exists else (None, None, 0)
    gap_us = SESSION_GAP_MS * 1000
    closed = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            us = ts.value // 1000          # pandas ns -> epoch us
            if s is None:
                s, l, n = us, us, 1
            elif us >= l + gap_us:
                closed.append((s, n))
                s, l, n = us, us, 1
            elif us + gap_us <= s:
                # a late event a FULL gap before the current session's
                # start can never belong to it (str_04's boundary run
                # backwards); emit it as its own closed session rather
                # than silently bridging a silence ≥ gap.  (If it
                # could merge with even-earlier events, those sessions
                # were closed in earlier batches — the bounded-state
                # trade-off, stated not papered over.)
                closed.append((us, 1))
            else:
                # A late-but-within-watermark event from a later
                # micro-batch can arrive with us < l; absorbing it must
                # never move the session's last-event time BACKWARDS
                # (that would shrink the timeout horizon below events
                # already absorbed).  An in-gap event BEFORE the start
                # legitimately extends the session backwards (batch
                # gaps-and-islands would fuse them too).
                s, l, n = min(s, us), max(l, us), n + 1
    if s is not None:
        state.update((s, l, n))
        state.setTimeoutTimestamp(
            max(l // 1000 + SESSION_GAP_MS,
                state.getCurrentWatermarkMs() + 1))
    if closed:
        yield pd.DataFrame([{"user_id": user_id, "start_us": cs,
                             "n_events": cn} for cs, cn in closed])
