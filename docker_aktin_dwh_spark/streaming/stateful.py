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
    # Gaps-and-islands over EVERYTHING in hand — the live session (as
    # the interval [s, l] carrying its count) plus every event of this
    # micro-batch — so mutually-in-gap late events merge with each
    # other and with a backwards-extended live session exactly as
    # batch gaps-and-islands would (ADVICE r7: the old per-event fold
    # emitted two pre-start events within a gap of each other as two
    # single-event sessions even though both were in hand).  Merge
    # boundary is str_04's exact rule: islands fuse iff the next start
    # is STRICTLY inside last + gap.  The only remaining divergence
    # from the batch form is cross-batch: a late event whose true
    # session was already closed and emitted in an EARLIER batch opens
    # a fresh island here — the bounded-state trade-off, stated not
    # papered over (the oracle's WHERE encodes emission, and events
    # beyond the watermark never reach the tracker).
    items = [(s, l, n)] if s is not None else []
    for pdf in pdfs:
        items.extend((ts.value // 1000, ts.value // 1000, 1)
                     for ts in pdf["ts"])    # pandas ns -> epoch us
    items.sort()
    merged = []
    for st, la, cnt in items:
        if merged and st < merged[-1][1] + gap_us:
            ps, pl, pn = merged[-1]
            merged[-1] = (ps, max(pl, la), pn + cnt)
        else:
            merged.append((st, la, cnt))
    closed = [(cs, cn) for cs, _, cn in merged[:-1]]
    s, l, n = merged[-1] if merged else (None, None, 0)
    if s is not None:
        state.update((s, l, n))
        state.setTimeoutTimestamp(
            max(l // 1000 + SESSION_GAP_MS,
                state.getCurrentWatermarkMs() + 1))
    if closed:
        yield pd.DataFrame([{"user_id": user_id, "start_us": cs,
                             "n_events": cn} for cs, cn in closed])
