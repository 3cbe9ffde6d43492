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
