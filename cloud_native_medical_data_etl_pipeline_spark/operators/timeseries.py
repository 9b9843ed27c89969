"""Time-series densification: regular-grid resampling with gap fill.

Aggregating events into time buckets leaves silent holes where no
events fell — downstream charting/forecasting needs an explicit zero
row per empty bucket. ``resample_fill`` builds the dense grid with
``sequence()`` (one row per (group, bucket), generated JVM-side, no
driver loop) and left-joins the sparse aggregate onto it.

Scale shape: the grid is |groups| x |buckets| narrow rows — generated,
not shuffled from data — and the join is an equi-join on
(group, bucket) that AQE broadcasts whenever the sparse aggregate side
is small (it is: it's already aggregated). The dense output is the
contract; if |groups| x |buckets| itself is huge, the caller's grid is
the problem, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_fill(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    step: str = "1 hour",
    agg_col: str = "value",
) -> DataFrame:
    """Bucket ``df`` to ``step``-wide windows per group, then fill
    every empty bucket in [min(bucket), max(bucket)] (per the GLOBAL
    span, so all groups share one grid) with n=0, total=0.0.

    Returns (group_col, bucket, n, total) sorted-friendly columns.
    """
    bucket = F.date_trunc(
        {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}[step],
        F.col(ts_col),
    )
    sparse = (
        df.select(F.col(group_col), bucket.alias("bucket"), F.col(agg_col))
        .groupBy(group_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(agg_col), 4).alias("total"),
        )
    )
    span = sparse.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    groups = sparse.select(group_col).distinct()
    grid = (
        groups.crossJoin(span)  # |groups| x 1 — trivially broadcast
        .select(
            group_col,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
            ).alias("bucket"),
        )
    )
    return (
        grid.join(sparse, [group_col, "bucket"], "left")
        .select(
            group_col,
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )
