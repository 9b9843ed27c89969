"""Behavioral analytics over event streams: ordered funnel conversion
and cohort retention — the two workhorse queries of product/event
warehouses, included here because a training-data pipeline's telemetry
(crawl → filter → dedup → pack) is itself a funnel over document IDs.

Scale notes (100 TB design point): both operators reduce the event
stream to ONE user-keyed shuffle before any further work. Funnel state
per user is one sorted timestamp array PER STEP, bounded by that
user's funnel-step events (filter the scan to the step types first —
predicate pushed to the source); the step-chaining scan is pure array
expressions, no UDFs. Cohort retention pre-aggregates activity to
(user, week) grain map-side-combinable before the join, so the join
input is |users| × |active weeks|, not |events|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step i+1 when they have
    an event of ``steps[i+1]`` STRICTLY AFTER the time at which they
    reached step i (step 1 = the user's earliest steps[0] event; the
    canonical first-touch chain, greedy-earliest at each step — greedy
    is optimal for "did they convert": picking any later qualifying
    event can only shrink the remaining suffix).

    Returns one row per step: (step_idx, step, users) with users =
    how many users reached that step; step_idx is 1-based.

    Timestamps compare as exact epoch-microsecond integers (the q62
    lesson: engine timestamp units drift, int64 µs does not).
    """
    if not steps:
        raise ValueError("funnel_counts: empty step list")
    us = F.col(user_col)
    # unix_micros rejects TIMESTAMP_NTZ (raw parquet reads produce it);
    # the cast is a no-op on TIMESTAMP and pins NTZ wall-clock to the
    # session zone — ordering (all this operator compares) is
    # preserved either way
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    # one user-keyed shuffle: per step, the user's sorted event times.
    # The pre-filter keeps only funnel-relevant events, so per-user
    # state is bounded by funnel activity, not total activity.
    filtered = events.where(F.col(type_col).isin(steps)).select(
        us.alias("u"), F.col(type_col).alias("t"), ts_us.alias("e")
    )
    arrays = filtered.groupBy("u").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("t") == s, F.col("e")))
            ).alias(f"__a{i}")
            for i, s in enumerate(steps)
        ]
    )

    # chain scan: t0 = min(step0 times); t_{i} = first step_i time
    # strictly after t_{i-1}. array_min of a filtered sorted array is
    # null-safe: empty -> null, and any comparison with null -> null,
    # so a broken chain stays broken.
    def _after(prev: Column):
        # closure factory: a default-arg lambda would present as
        # two-parameter and PySpark would bind (element, index) —
        # the repo-wide higher-order-function gotcha
        return lambda x: x > prev

    reach: list[Column] = [F.array_min("__a0")]
    for i in range(1, len(steps)):
        reach.append(F.array_min(F.filter(f"__a{i}", _after(reach[i - 1]))))
    reached = arrays.select(
        *[reach[i].alias(f"__t{i}") for i in range(len(steps))]
    )
    counts = reached.agg(
        *[
            F.count(f"__t{i}").alias(f"__c{i}")
            for i in range(len(steps))
        ]
    )
    # unpivot the one-row aggregate into (step_idx, step, users): a
    # single-row stack, no shuffle
    pairs = ", ".join(
        f"{i + 1}, '{s}', __c{i}" for i, s in enumerate(steps)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {pairs}) as (step_idx, step, users)"
    ).select(
        F.col("step_idx").cast("int").alias("step_idx"),
        "step",
        F.col("users").cast("long").alias("users"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: cohort = the Monday-start week of the
    user's FIRST event; for every (cohort_week, week_offset) count the
    distinct cohort users active in that week. week_offset 0 is the
    cohort week itself (so its count is the cohort size).

    Returns (cohort_week date, week_offset int, active_users long).

    Scale shape: activity reduces to distinct (user, week) rows in one
    user+week-keyed aggregate (map-side combinable); the user's cohort
    week is a min-aggregate on the SAME rows (one shuffle produces
    both via a window); the final count groups vocabulary-sized
    (cohort, offset) keys. No joins at all — the window over (user)
    replaces the classic first-touch join-back.
    """
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    uw = (
        events.select(F.col(user_col).alias("u"), week.alias("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("__n"))
        .drop("__n")
    )
    from pyspark.sql import Window

    cw = F.min("w").over(Window.partitionBy("u"))
    offs = (F.datediff(F.col("w"), F.col("__cw")) / 7).cast("int")
    out = (
        uw.withColumn("__cw", cw)
        .select(
            F.col("__cw").alias("cohort_week"),
            offs.alias("week_offset"),
            "u",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("active_users"))
    )
    if max_weeks is not None:
        out = out.where(F.col("week_offset") <= max_weeks)
    return out
