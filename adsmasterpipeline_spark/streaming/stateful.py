"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState`` (SURVEY §2.10; the streaming analogue of the
batch lag+cumsum sessionizer in queries/pipeline.py).

State per user: (session_id, last_seen_us, n_events). An event more
than ``gap`` after ``last_seen`` opens a new session. Works on a
streaming DataFrame; the batch path below drives it with the memory
sink for tests (format("memory") + processAllAvailable).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, event_id long, session_id long, "
                 "event_in_session long")
STATE_SCHEMA = "session_id long, last_seen_us long, n_events long"

GAP_US = 30 * 60 * 1_000_000


def sessionize_with_state(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        session_id, last_seen_us, n_events = state.get
    else:
        session_id, last_seen_us, n_events = 0, None, 0

    for pdf in pdfs:
        pdf = pdf.sort_values(["tus", "event_id"])
        out_rows = []
        for event_id, tus in zip(pdf["event_id"], pdf["tus"]):
            if last_seen_us is None or tus - last_seen_us > GAP_US:
                session_id += 1
                n_events = 0
            n_events += 1
            last_seen_us = tus
            out_rows.append((user_id, event_id, session_id, n_events))
        yield pd.DataFrame(out_rows, columns=[
            "user_id", "event_id", "session_id", "event_in_session"])

    state.update((session_id, last_seen_us, n_events))


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with (user_id, event_id, tus).
    Returns the per-event session assignment, state kept per user."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                sessionize_with_state,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
