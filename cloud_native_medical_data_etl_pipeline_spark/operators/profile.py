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
    exchange of constant-size state.  This is the PRODUCTION DEFAULT
    profiler; ``profile_deterministic`` is the oracle/audit-grade
    variant (see SCALING.md "Profiling").
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


def _det_hash_str(ref, dtype):
    """Engine-portable string form of a value for md5 hashing: every
    branch is an expression DuckDB evaluates to the SAME text.
    Doubles go through the repo's 6dp-grain BIGINT trick (plain
    double->string formatting differs between engines); timestamps
    through unix micros."""
    if isinstance(dtype, T.StringType):
        return ref
    if isinstance(
        dtype,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.BooleanType),
    ):
        return ref.cast("string")
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        return (
            F.round(ref.cast("double") * 1e6).cast("long").cast("string")
        )
    if isinstance(dtype, T.DateType):
        return ref.cast("string")  # ISO yyyy-MM-dd in both engines
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(ref).cast("string")
    raise ValueError(
        f"profile_deterministic: no engine-portable hash form for {dtype}"
    )


def profile_deterministic(
    df: DataFrame,
    cols: list[str] | None = None,
    sample_key: str | None = None,
    sample_hex: str = "0123",
    p: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """The ORACLE-CHECKABLE profiler: same one-row-per-column shape as
    ``approx_profile``, every value deterministic and reproducible by
    an external SQL engine.

    * n_rows / n_nulls / min / max — exact, one aggregation pass.
    * hll_distinct — distinct-count ESTIMATE from the repo's md5-hex
      HyperLogLog registers (``operators/sketch.py``): same fixed
      2^p-register memory story as ``approx_count_distinct``, but the
      register states are pure md5/string expressions, so the
      estimate is a deterministic function of the data, not of
      Spark's internal hash.  Nulls are excluded (matching
      ``approx_count_distinct``); all-null columns report 0.0.
    * p25/p50/p75 — exact interpolated percentiles over a
      DETERMINISTIC row sample: rows whose ``md5(sample_key)`` first
      hex digit falls in ``sample_hex`` (default 4/16 = 25%).  Hash
      sampling keeps the quantile pass proportional to the sample at
      100 TB while staying bit-reproducible; pass ``sample_key=None``
      to rank the full table (exact quantiles, heavier shuffle).

    PRODUCTION DEFAULT IS ``approx_profile`` — this form is
    oracle/audit-grade only (see SCALING.md "Profiling").  The exact
    interpolated percentiles here imply a sample-sized SORT per
    numeric column; at 100 TB a 25% md5 sample is still 25 TB of
    shuffle, where ``approx_profile``'s GK/HLL++ sketches aggregate
    map-side into constant-size state.  Use this when an external
    engine must reproduce every byte (driver oracle q64, audits),
    ``approx_profile`` everywhere else.
    Plan shape: three bounded aggregates (exact pass; register
    aggregate capped at cols*2^p rows after map-side combine; sample
    percentile pass) joined on the tiny per-column frame.
    """
    from .sketch import hll_cardinality

    cols = cols if cols is not None else [f.name for f in df.schema.fields]
    if not cols:
        return df.sparkSession.createDataFrame(
            [],
            "column string, n_rows long, n_nulls long, "
            "hll_distinct double, p25 double, p50 double, p75 double, "
            "min double, max double",
        )
    from ._common import col_ref as _ref

    # ---- leg 1: exact one-pass (n_rows, n_nulls, min, max) ----
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        dtype = df.schema[c].dataType
        aggs.append(F.sum(_ref(c).isNull().cast("long")).alias(f"__nulls_{i}"))
        if isinstance(dtype, _NUMERIC):
            aggs.append(F.min(_ref(c).cast("double")).alias(f"__min_{i}"))
            aggs.append(F.max(_ref(c).cast("double")).alias(f"__max_{i}"))
    row = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    structs = []
    for i, c in enumerate(cols):
        numeric = isinstance(df.schema[c].dataType, _NUMERIC)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{i}").alias("n_nulls"),
                (F.col(f"__min_{i}") if numeric else null_d).alias("min"),
                (F.col(f"__max_{i}") if numeric else null_d).alias("max"),
            )
        )
    exact = row.select(F.inline(F.array(*structs)))

    # ---- leg 2: md5-HLL distinct estimate, one long frame ----
    long_vals = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        _det_hash_str(_ref(c), df.schema[c].dataType).alias(
                            "v"
                        ),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.v")
    hll = hll_cardinality(
        long_vals.where(F.col("v").isNotNull()), "v", "column", p=p
    )

    # ---- leg 3: exact percentiles over the deterministic sample ----
    numeric_cols = [
        c for c in cols if isinstance(df.schema[c].dataType, _NUMERIC)
    ]
    legs = exact.join(F.broadcast(hll), "column", "left")
    if numeric_cols:
        sampled = df
        if sample_key is not None:
            digit = F.substring(
                F.md5(_ref(sample_key).cast("string")), 1, 1
            )
            sampled = df.where(digit.isin(*list(sample_hex)))
        qaggs = []
        for i, c in enumerate(numeric_cols):
            qaggs.append(
                F.percentile(
                    _ref(c).cast("double"),
                    F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                ).alias(f"__q_{i}")
            )
        qrow = sampled.agg(*qaggs)
        qstructs = [
            F.struct(
                F.lit(c).alias("column"),
                F.round(F.col(f"__q_{i}").getItem(0), round_dp).alias("p25"),
                F.round(F.col(f"__q_{i}").getItem(1), round_dp).alias("p50"),
                F.round(F.col(f"__q_{i}").getItem(2), round_dp).alias("p75"),
            )
            for i, c in enumerate(numeric_cols)
        ]
        quant = qrow.select(F.inline(F.array(*qstructs)))
        legs = legs.join(F.broadcast(quant), "column", "left")
    else:
        legs = legs.select(
            "*", null_d.alias("p25"), null_d.alias("p50"), null_d.alias("p75")
        )
    return legs.select(
        "column",
        "n_rows",
        "n_nulls",
        F.coalesce(F.col("hll_est"), F.lit(0.0)).alias("hll_distinct"),
        "p25",
        "p50",
        "p75",
        "min",
        "max",
    )
