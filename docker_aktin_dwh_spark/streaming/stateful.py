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
