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
                # NULL ts rows are SKIPPED, not coerced: NaT.value is
                # int64-min, which would set a hugely negative timeout
                # (query failure) or overflow the closing Timestamp —
                # the same guard the z-score monitor applies
                ts_us.extend(
                    int(v.value // 1000)
                    for v in pd.to_datetime(pdf["ts"])
                    if v is not pd.NaT
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


_SENTINEL_USER = -1
def sessions_available_now(
    spark,
    path: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Drain the stateful sessionizer over the events table and return
    EVERY session — exactly equal to batch gap-sessionization, which is
    what makes the custom stateful operator oracle-checkable.

    The append-mode sessionizer only emits a trailing (still-open)
    session when the event-time timeout fires, i.e. when the watermark
    passes last_seen + gap — which never happens for the final sessions
    of a finite stream. The drain therefore unions the event stream
    with a one-row SENTINEL stream whose event time lies beyond every
    possible timeout (max event ts + gap + watermark delay + margin):

      * batch 0 ingests all files from BOTH sources while the watermark
        is still at zero, so nothing is dropped as late and every
        in-batch-closed session is emitted;
      * after batch 0 the watermark jumps to sentinel - delay, which
        exceeds last_seen + gap for every real user, so the engine's
        final no-data micro-batch fires every timeout and the remaining
        open sessions are emitted;
      * the sentinel's own session times out at sentinel + gap, which
        the watermark never reaches — it stays in the (discarded) state
        store, and its user id is filtered anyway.

    Putting the sentinel in a separate unioned source (rather than
    relying on file ordering within one source) makes the schedule
    deterministic: a lone sentinel file processed FIRST would advance
    the watermark and drop every real event as late.

    Returns (user_id, start_us, end_us, n_events) with exact integer
    microsecond bounds.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cloud_native_medical_data_etl_pipeline_spark.sources.events_io import (
        read_events,
        stream_events,
    )

    # sentinel event time: beyond every possible session timeout.
    # read_events normalizes either physical ts encoding to timestamp,
    # so all sentinel math is in microseconds regardless of encoding.
    ev_batch = read_events(spark, path)
    ts_type = ev_batch.schema["ts"].dataType  # Timestamp or TimestampNTZ
    max_us = ev_batch.agg(F.unix_micros(F.max("ts").cast("timestamp"))).collect()[0][0]
    if max_us is None:
        # empty table (or every ts NULL): nothing can sessionize — an
        # unguarded sentinel computation would TypeError on None + int
        return spark.createDataFrame(
            [], "user_id long, start_us long, end_us long, n_events long"
        )
    wm_us = _parse_duration_us(watermark)
    # 48h margin: dwarfs any session-timezone offset a Timestamp<->NTZ
    # cast could introduce (the sentinel only needs to exceed every
    # timeout; its exact value is filtered out of the result anyway)
    sentinel_us = max_us + gap_minutes * 60 * _US + wm_us + 48 * 3600 * _US

    sentinel_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
        ]
    )
    sentinel_dir = tempfile.mkdtemp(prefix="session_sentinel_")
    spark.createDataFrame(
        [(_SENTINEL_USER, sentinel_us)], "user_id long, ts_us long"
    ).select(
        "user_id", F.timestamp_micros("ts_us").cast(ts_type).alias("ts")
    ).coalesce(1).write.mode("overwrite").parquet(sentinel_dir)

    from ._drain import drain_to_memory

    stream = stream_events(spark, path, columns=["user_id", "ts"]).unionByName(
        spark.readStream.schema(sentinel_schema).parquet(sentinel_dir)
    )
    sink = drain_to_memory(
        streaming_sessionize(stream, gap_minutes, watermark),
        "sessions_sink",
        "append",
    )
    shutil.rmtree(sentinel_dir, ignore_errors=True)
    return (
        sink
        .where(F.col("user_id") != _SENTINEL_USER)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events",
        )
    )


def _parse_duration_us(spec: str) -> int:
    """Spark interval grammar subset -> microseconds: the unit
    aliases ``withWatermark`` itself accepts for time-scale units
    ('1 week' / '2 days' / '2 hours' / '30 min' / '10 secs' / ...),
    case-insensitive.  Unknown units raise a named ValueError instead
    of a bare KeyError."""
    n, unit = spec.split()
    mults = {
        "week": 7 * 86400,
        "day": 86400,
        "hour": 3600,
        "minute": 60,
        "min": 60,
        "second": 1,
        "sec": 1,
    }
    key = unit.lower().rstrip("s")
    if key not in mults:
        raise ValueError(f"unsupported watermark unit {unit!r} in {spec!r}")
    return int(n) * mults[key] * _US
