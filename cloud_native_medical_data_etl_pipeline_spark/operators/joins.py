"""Temporal join operators Spark lacks as built-ins.

The reference has no as-of semantics (SURVEY.md §2.3: J1 containment is
its only non-equi join), but any event/feature pipeline at scale needs
"latest right-side row at or before each left-side timestamp". Spark
has no ASOF JOIN; the naive range-join (l JOIN r ON key AND r.ts <=
l.ts, then argmax) explodes to O(|l| x |r|) pairs per key before the
window prunes them.

`asof_join` instead unions both sides and takes ONE window pass:
sort-within-key by (ts, side), carry the last non-null right payload
forward, keep left rows. Cost is a single shuffle of |l|+|r| rows on
the key — the same shuffle an equi-join would pay, with no pair
blowup, no skew amplification, and AQE-splittable partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_keep: list[str] | None = None,
    right_payload: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key (inclusive
    match, like pandas merge_asof / DuckDB ASOF JOIN); no match ->
    null payload columns.

    Left columns to carry through are listed in ``left_keep`` (they
    ride the union as typed nulls on right rows — keep the projection
    narrow on wide frames). Right rows tied on (key, ts) resolve
    deterministically to the greatest payload tuple (struct ordering),
    so pass a unique leading payload column (an id) for stable output.
    """
    left_keep = left_keep or [c for c in left.columns if c not in (on, left_ts)]
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload_struct = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in right_payload],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_keep],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *left_keep,
    )
    # side 0 sorts before side 1 at equal ts -> inclusive (>=) match;
    # __p in last order-by position breaks right-side ts ties by max
    # payload tuple.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l).withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    )
    return unioned.where(F.col("__side") == 1).select(
        F.col("__k").alias(on),
        F.col("__t").alias(left_ts),
        *left_keep,
        F.col("__match.__ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
