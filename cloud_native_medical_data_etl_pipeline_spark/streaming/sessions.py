"""Streaming gap-based sessionization: the custom stateful operator.

Batch form lives in `operators/sessions.py` (two window passes); this
is the Structured Streaming analog built on applyInPandasWithState —
per-user state carries the open session (start, last-seen, count)
across micro-batches, Arrow-batched so the Python hop is vectorized.

Emission contract (append mode):
  * a session CLOSED by an in-batch gap is emitted in that batch;
  * the still-open session per user lives in the state store and is
    emitted when the event-time timeout fires (watermark passes
    last_seen + gap) — or never, if the stream ends first (the batch
    operator is the source of truth for complete corpora).

State size at scale: one (long, long, long) per active user, evicted
by timeout — bounded by concurrently-active users, not stream length.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_us long, last_us long, n long"

_US = 1_000_000


def _sessionize_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_us, end_us, n)

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0

        if state.hasTimedOut:
            if n > 0:
                closed.append((start_us, last_us, n))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(v.value // 1000) for v in pd.to_datetime(pdf["ts"])
                )
            ts_us.sort()
            for t in ts_us:
                if n == 0:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us = t
                    n += 1
            if n > 0:
                state.update((start_us, last_us, n))
                state.setTimeoutTimestamp((last_us + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """events must carry (user_id, ts [timestamp]); returns the closed
    sessions stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
