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
    T.ByteType,
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
    # `is not None`: an explicitly-passed empty list means "profile
    # nothing", not "profile every column of a possibly-wide table"
    cols = cols if cols is not None else [f.name for f in df.schema.fields]
    if not cols:
        return df.sparkSession.createDataFrame(
            [],
            "column string, n_rows long, n_nulls long, "
            "approx_distinct long, p25 double, p50 double, p75 double, "
            "min double, max double",
        )
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    # HLL++ cannot hash MapType values — emit a null estimate for those
    # columns instead of failing the whole profile
    def _hashable(dtype: T.DataType) -> bool:
        return not isinstance(dtype, T.MapType)

    from ._common import col_ref as _ref  # the ONE escape definition

    # aggregate aliases are INDEX-based: user column names never enter
    # an alias or a SQL string, so quotes/backticks/dots in names
    # cannot break the expression (they appear only as literal VALUES
    # in the output's `column` field)
    for i, c in enumerate(cols):
        dtype = df.schema[c].dataType
        aggs.append(
            F.sum(_ref(c).isNull().cast("long")).alias(f"__nulls_{i}")
        )
        if _hashable(dtype):
            aggs.append(
                F.approx_count_distinct(_ref(c), rsd=relative_sd).alias(
                    f"__dist_{i}"
                )
            )
        else:
            aggs.append(F.lit(None).cast("long").alias(f"__dist_{i}"))
        if isinstance(dtype, _NUMERIC):
            aggs.append(
                F.percentile_approx(
                    _ref(c).cast("double"),
                    F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                    quantile_accuracy,
                ).alias(f"__q_{i}")
            )
            aggs.append(F.min(_ref(c).cast("double")).alias(f"__min_{i}"))
            aggs.append(F.max(_ref(c).cast("double")).alias(f"__max_{i}"))

    row = df.agg(*aggs)

    # pivot the single wide row into one row per column, all within the
    # same plan (no collect): inline() over structs built with the
    # column API — never string-built SQL
    null_d = F.lit(None).cast("double")
    structs = []
    for i, c in enumerate(cols):
        dtype = df.schema[c].dataType
        if isinstance(dtype, _NUMERIC):
            q = F.col(f"__q_{i}")
            p25, p50, p75 = q.getItem(0), q.getItem(1), q.getItem(2)
            mn, mx = F.col(f"__min_{i}"), F.col(f"__max_{i}")
        else:
            p25 = p50 = p75 = mn = mx = null_d
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{i}").alias("n_nulls"),
                F.col(f"__dist_{i}").alias("approx_distinct"),
                p25.alias("p25"),
                p50.alias("p50"),
                p75.alias("p75"),
                mn.alias("min"),
                mx.alias("max"),
            )
        )
    return row.select(F.inline(F.array(*structs)))
