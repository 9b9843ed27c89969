"""Streaming per-key anomaly flags: the stateful running-statistics
analog of the batch bucket-aligned z-score (operators/stats.py
rolling_zscore_flags).  The batch form judges rows against a trailing
time window; this one judges each arriving event against its key's
running Welford statistics at arrival time — the always-on monitor
shape, with O(1) state per key.

State per key is exactly (count, mean, M2): Welford's online update
is numerically stable (no catastrophic sum-of-squares cancellation)
and mergeable only sequentially — which is fine here, because the
state store serializes each key's updates across micro-batches by
construction.  State volume is bounded by |keys| (event types,
endpoints, tenants), never by stream length, so no timeout/eviction
is needed; keys with drifting baselines should use the batch
trailing-window form instead (this one's baseline is all-history).

Determinism: within a batch, events apply in (ts, event_id) order, so
a drain over a finite input emits exactly the same flags as a
sequential replay of the sorted stream — asserted against a pure
Python replay in tests.
"""

from __future__ import annotations

import math
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_id long, event_type string, z double"
STATE_SCHEMA = "n long, mean double, m2 double"


def _monitor_fn(z_thresh: float, min_points: int, round_dp: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0

        rows = []
        for pdf in pdfs:
            for v, i, x in zip(
                pd.to_datetime(pdf["ts"]), pdf["event_id"], pdf["value"]
            ):
                # rows without an orderable identity are SKIPPED, not
                # coerced: NaT.value is int64-min, which would silently
                # sort a null-ts event first and make the flags depend
                # on batch partitioning; a NaN event_id would crash
                # int().  (The lake sink quarantines such rows; a
                # monitor just ignores them.)
                if pd.isna(v) or pd.isna(i) or pd.isna(x):
                    continue
                rows.append((int(v.value // 1000), int(i), float(x)))
        rows.sort(key=lambda r: (r[0], r[1]))

        flagged_ids, flagged_z = [], []
        for _ts_us, event_id, x in rows:
            if n >= min_points:
                var = m2 / (n - 1) if n > 1 else 0.0
                sd = math.sqrt(var) if var > 0 else 0.0
                if sd > 0:
                    z = round((x - mean) / sd, round_dp)
                    if abs(z) > z_thresh:
                        flagged_ids.append(event_id)
                        flagged_z.append(z)
            # Welford update AFTER judging (an event never inflates
            # the baseline it is judged against — the q85 principle)
            n += 1
            d = x - mean
            mean += d / n
            m2 += d * (x - mean)

        state.update((n, mean, m2))
        if flagged_ids:
            yield pd.DataFrame(
                {
                    "event_id": flagged_ids,
                    "event_type": [event_type] * len(flagged_ids),
                    "z": flagged_z,
                }
            )

    return fn


def streaming_zscore_flags(
    events: DataFrame,
    z_thresh: float = 3.0,
    min_points: int = 30,
    round_dp: int = 4,
) -> DataFrame:
    """events must carry (event_id, ts, event_type, value); returns
    the stream of flagged anomalies."""
    return events.groupBy("event_type").applyInPandasWithState(
        _monitor_fn(z_thresh, min_points, round_dp),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def zscore_flags_available_now(
    spark,
    path: str,
    z_thresh: float = 3.0,
    min_points: int = 30,
) -> DataFrame:
    """Drain the monitor over a finite events table and return every
    flag.  No watermark/timeout machinery: the monitor has no expiring
    state, so a plain availableNow drain into a memory sink suffices
    (single-batch drains equal a sequential replay of the
    (ts, event_id)-sorted stream — the testable contract)."""
    from cloud_native_medical_data_etl_pipeline_spark.sources.events_io import (
        stream_events,
    )

    from ._drain import drain_to_memory

    flags = streaming_zscore_flags(
        stream_events(spark, path), z_thresh=z_thresh, min_points=min_points
    )
    return drain_to_memory(flags, "anomaly_sink", "append")
