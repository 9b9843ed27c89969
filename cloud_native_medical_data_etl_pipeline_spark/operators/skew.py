"""Skew mitigation for hot join keys.

AQE's skew-join splitting (on in the session factory) handles most
runtime skew by subdividing oversized partitions; salting is the
explicit, planner-independent form for the pathological case AQE can't
split — ONE key carrying a large fraction of the rows, where even a
subdivided partition re-joins the same right-side rows repeatedly.

`salted_join` spreads the hot side across `salt_factor` sub-keys with
a deterministic row hash and replicates the other side once per salt:
shuffle parallelism on the hot key goes from 1 task to `salt_factor`
tasks at the cost of replicating the (smaller) side `salt_factor`
times. Aggregations generally do NOT need salting — Spark's partial
(map-side) aggregation already collapses hot-key rows before the
shuffle; salt only when the post-shuffle combine itself is the
bottleneck (e.g. collect_list on a hot key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_expr(skewed: DataFrame, salt_factor: int):
    """Salt for the skewed side: hash of every column plus the row's
    partition-local position.  The positional mixin
    (`monotonically_increasing_id` = partition index · 2^33 + offset)
    is what spreads FULLY-duplicate hot-key rows — a content-only hash
    would land identical rows in one bucket, recreating the straggler
    the salt exists to split.  Deterministic for a fixed input
    partitioning; the join result does not depend on which bucket a
    row lands in, so repartition-induced salt changes are benign.
    """
    return F.pmod(
        F.xxhash64(
            *[F.col(c) for c in skewed.columns],
            F.monotonically_increasing_id(),
        ),
        F.lit(salt_factor),
    ).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: `skewed` rows get a
    deterministic salt in [0, salt_factor); `other` is replicated once
    per salt value, so every (key, salt) pair finds its match. Result
    equals `skewed.join(other, on, how)` for how in
    {'inner', 'left', 'left_outer'}.

    The salt is a hash of ALL the skewed side's columns mixed with the
    row's position (`monotonically_increasing_id`), so a hot key whose
    rows are FULL duplicates (same key, same payload) still spreads
    across salt buckets instead of collapsing into one.  The result is
    salt-invariant — every (key, salt) pair sees the full replicated
    right side — so positional salting cannot change the join output,
    only how evenly it shuffles.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    left_s = skewed.withColumn("__salt", _salt_expr(skewed, salt_factor))
    right_s = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return left_s.join(right_s, keys + ["__salt"], how).drop("__salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Join-key skew diagnostics: the top-``top`` heaviest keys with
    their row share and skew factor (count / mean-count-per-key) —
    the number that predicts whether a shuffle on this key needs AQE
    skew splitting or a salted join BEFORE the job runs, not after it
    straggles.

    Returns ``(key_col, n, share, skew_factor)`` ordered by count
    descending (ties by key).  NULL keys are a row like any other —
    they hash to one partition too, and an unexpected NULL-heavy key
    column is the most common real-world skew bug.

    Scale shape: one map-side-combinable count aggregate (key-
    cardinality-sized result), a one-row global total broadcast back,
    and a TakeOrdered top-k — no global sort, no second scan.
    """
    from ._common import col_ref

    k = col_ref(key_col)
    counts = df.groupBy(k.alias("__k")).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").cast("double").alias("__N"),
        F.count(F.lit(1)).cast("double").alias("__D"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col("__k").alias(key_col),
            "n",
            F.round(F.col("n") / F.col("__N"), round_dp).alias("share"),
            F.round(F.col("n") * F.col("__D") / F.col("__N"), round_dp).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.col("n").desc(), k.asc_nulls_last())
        .limit(top)
    )
