"""Custom arbitrary-stateful streaming operator: event-time
sessionization via ``applyInPandasWithState`` — the PySpark analogue of
the reference's keyed CoProcessFunction state + timers
(`TPCHQuery3_StreamProcessor.java:183-265` holds per-key ValueState and
acts on registered timers; here the engine's GroupState + event-time
timeout provide the same primitives through the public API).

Spark's built-in ``session_window`` covers plain gap sessionization
(used by `suite_relational.sessionize_events` and its streaming test);
this operator exists for the semantics the built-in CANNOT express —
per-session custom accumulators and explicit state-machine control —
and demonstrates the `applyInPandasWithState` surface (SURVEY §2.9/2.10:
keyed state + timers done Spark-natively).

Semantics (deterministic for in-order micro-batches):
* events are grouped per user; a session breaks when consecutive events
  (by event time, ties by event_id) are more than `gap` apart;
* sessions closed WITHIN a batch are emitted immediately; the trailing
  open session is held in GroupState with an event-time timeout at
  ``last_event + gap``;
* when the watermark passes the timeout, the engine calls back with
  ``state.hasTimedOut`` and the open session is emitted and dropped.

State per key is one fixed-width tuple (start, last, n, sum) — bounded
by the number of concurrently-open sessions, evicted by timeout: the
always-on form. Arrow-batched pandas transfer, no row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
# Timestamps kept as epoch-micros longs inside state (fixed-width,
# timezone-free).
STATE_SCHEMA = "start long, last long, n long, sum_value double"


def sessionize_with_state(
    events: DataFrame, gap_minutes: int = 30, delay: str = "1 hour"
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) — one
    row per CLOSED session of the event stream. `events` must carry
    (user_id, ts, event_id, value); ts becomes the watermark column."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(start_us: int, last_us: int, n: int, total: float) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )

        if state.hasTimedOut:
            # Timer fired: the watermark passed last_event + gap with no
            # newer data — the open session is complete.
            start, last, n, total = state.get
            state.remove()
            yield emit(start, last, n, total)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows["_us"] = rows["ts"].astype("int64") // 1_000
        rows = rows.sort_values(["_us", "event_id"], kind="mergesort")

        open_session = state.get if state.exists else None
        for us, val in zip(rows["_us"].to_numpy(), rows["value"].to_numpy()):
            us, val = int(us), float(val)
            if open_session is None:
                open_session = (us, us, 1, val)
            else:
                start, last, n, total = open_session
                if us - last > gap_us:
                    yield emit(start, last, n, total)
                    open_session = (us, us, 1, val)
                else:
                    open_session = (start, us, n + 1, total + val)

        start, last, n, total = open_session
        state.update((start, last, n, total))
        # Event-time timer: fire once the watermark passes the gap. A
        # straggler key whose last event already trails the watermark
        # closes at the next watermark tick (wm + 1 ms).
        timeout_ms = last // 1_000 + gap_minutes * 60 * 1_000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))

    return (
        events.select("user_id", "ts", "event_id", "value")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
