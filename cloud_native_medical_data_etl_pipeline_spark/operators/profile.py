"""Approximate one-pass table profiling: the 100 TB answer to
"what's in this column?".

Exact distinct counts and exact percentiles need a shuffle per column
(or a global sort); the sketch versions — HyperLogLog++ for distincts,
a mergeable quantile sketch (GK-style) for percentiles — are Spark
built-ins that aggregate map-side into constant-size state, so an
arbitrary-width profile of an arbitrary-size table is ONE scan with
one tiny final merge. relativeSD / accuracy knobs trade sketch size
for error; defaults hold sketches to a few KB per column.

Numbers are estimates (documented error bounds: ~2.3% for HLL at the
default relativeSD 0.05 we tighten to 0.02; rank error 1/accuracy for
percentiles) — profiling and monitoring use, not accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.DoubleType,
    T.FloatType,
    T.DecimalType,
)


def approx_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    relative_sd: float = 0.02,
    quantile_accuracy: int = 1000,
) -> DataFrame:
    """One-row-per-column profile: (column, n_rows, n_nulls,
    approx_distinct, p25, p50, p75, min, max) — numeric sketch fields
    are null for non-numeric columns.

    Single aggregation pass regardless of column count; every sketch is
    mergeable, so the plan is map-side partial aggregation + one
    exchange of constant-size state.
    """
    cols = cols or [f.name for f in df.schema.fields]
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    # HLL++ cannot hash MapType values — emit a null estimate for those
    # columns instead of failing the whole profile
    def _hashable(dtype: T.DataType) -> bool:
        return not isinstance(dtype, T.MapType)

    for c in cols:
        dtype = df.schema[c].dataType
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        if _hashable(dtype):
            aggs.append(
                F.approx_count_distinct(c, rsd=relative_sd).alias(f"__dist_{c}")
            )
        else:
            aggs.append(
                F.lit(None).cast("long").alias(f"__dist_{c}")
            )
        if isinstance(dtype, _NUMERIC):
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"),
                    F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                    quantile_accuracy,
                ).alias(f"__q_{c}")
            )
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))

    row = df.agg(*aggs)

    # pivot the single wide row into one row per column, all within the
    # same plan (no collect): a stack() over the computed aggregates
    parts = []
    for c in cols:
        dtype = df.schema[c].dataType
        if isinstance(dtype, _NUMERIC):
            q = f"`__q_{c}`"
            p25, p50, p75 = f"{q}[0]", f"{q}[1]", f"{q}[2]"
            mn, mx = f"`__min_{c}`", f"`__max_{c}`"
        else:
            p25 = p50 = p75 = mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"named_struct('column', '{c}', 'n_rows', __n, "
            f"'n_nulls', `__nulls_{c}`, 'approx_distinct', `__dist_{c}`, "
            f"'p25', {p25}, 'p50', {p50}, 'p75', {p75}, "
            f"'min', {mn}, 'max', {mx})"
        )
    return row.selectExpr(f"inline(array({', '.join(parts)}))")
