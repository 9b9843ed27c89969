"""Gap-based sessionization over event streams, batch form.

Not in the reference (SURVEY.md §2.10: it has no streaming/stateful
operators); this is the standard event-analytics primitive a
training-data pipeline needs for user-trajectory construction. The
streaming analog is applyInPandasWithState; the batch form below is
two window passes over one (user, ts) shuffle:

  pass 1: lag(ts) -> gap flag (1 where a new session starts)
  pass 2: running sum of flags -> session ordinal per user

Both passes share the same partitioning+ordering, so Catalyst plans a
single Exchange + single Sort — sessionizing 100 TB of events costs
one shuffle of the key/ts/payload columns, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-user session ordinal: a new session starts when the
    gap since the previous event exceeds ``gap_minutes``. Returns the
    input columns plus ``session_id`` (1-based per user)."""
    # under-parallel inputs (a single-file scan at bench scale) would
    # otherwise run both window passes AND the downstream per-session
    # aggregate on the few AQE-coalesced post-shuffle tasks; the
    # pinned keyed exchange replaces the window's ENSURE_REQUIREMENTS
    # exchange (hash(user) satisfies its clustering and the
    # (user, session) aggregate's), is AQE-exempt, and no-ops at real
    # scale / on unit-test frames — see repartition_key_for_cpu
    # (r17 interleaved A/B at sf0.1: 0.62-0.73 -> 0.53-0.64 s)
    from .dedup import repartition_key_for_cpu

    df = repartition_key_for_cpu(df, [F.col(user_col)])
    order = [F.col(ts_col).asc(), F.col(order_tiebreak).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000).cast("long")
    prev = F.lag(F.col(ts_col)).over(w)
    starts = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(starts).over(wsum))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session summary: event count, start/end, duration seconds.
    One shuffle for sessionize (window) + one for the group-by; the
    group-by keys are a superset of the window partition key, so AQE
    can reuse locality where supported."""
    s = sessionize(df, user_col, ts_col, order_tiebreak, gap_minutes)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
    )
