"""Slowly-changing-dimension history building (SCD type 2) and
event-transition analysis — the two standard "what changed, and what
follows what" temporal shapes.

Both reduce to ONE hash-by-entity sort-by-time shuffle with streaming
window functions (lag/lead are O(1)-state rank functions), so they
scale like any windowed operator: partition memory is bounded by
rows-per-entity, and a hot entity is the only skew hazard (salt by
time range if one entity carries a partition-sized history).
Ordering ties on the timestamp are broken by a caller-supplied unique
id so the emitted intervals/transitions are deterministic and
engine-reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._common import col_ref as _ref


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an update log into SCD-2 validity intervals: one row
    per (entity, attribute-value RUN) with ``valid_from_us`` /
    ``valid_to_us`` epoch-microsecond bounds; the current (open) run
    has ``valid_to_us`` NULL.  Consecutive updates carrying the SAME
    value collapse into one interval (the definition of SCD-2 — a
    re-assertion of the current value is not a change).

    Two window passes over one shuffle: lag(attr) marks run starts,
    lead(ts) over the CHANGE rows closes each run at the next change.
    NULL attribute values are values (NULL -> NULL is not a change):
    the change test is null-safe negated equality.
    """
    k, ts, a, tb = (
        _ref(key_col), _ref(ts_col), _ref(attr_col), _ref(tiebreak_col)
    )
    order = [F.unix_micros(ts).asc(), tb.asc()]
    w = Window.partitionBy(k).orderBy(*order)
    changed = df.select(
        k.alias("__k"),
        F.unix_micros(ts).alias("__ts"),
        a.alias("__a"),
        tb.alias("__tb"),
        (~F.lag(a).over(w).eqNullSafe(a)).alias("__chg"),
        F.row_number().over(w).alias("__rn"),
    ).where((F.col("__rn") == 1) | F.col("__chg"))
    w2 = Window.partitionBy("__k").orderBy(
        F.col("__ts").asc(), F.col("__tb").asc()
    )
    return changed.select(
        F.col("__k").alias(key_col),
        F.col("__a").alias(attr_col),
        F.col("__ts").alias("valid_from_us"),
        F.lead("__ts").over(w2).alias("valid_to_us"),
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order transition counts: how often does ``state_col``
    value X immediately precede value Y within an entity's timeline?
    The Markov-chain / funnel-exploration primitive.  Returns
    ``(from_state, to_state, n)``; an entity's last event emits no
    transition.

    One shuffle (entity hash, time sort), lead() per row, then a
    map-side-combinable count aggregate over the tiny (|states|²)
    result space.

    A NULL state is a state: transitions to/from NULL are counted.
    "Last event" is detected by lead() over the (non-null) tiebreak
    column, NOT over the state — filtering on ``lead(state) IS NULL``
    would silently drop every transition INTO a null state.
    """
    k, ts, s, tb = (
        _ref(key_col), _ref(ts_col), _ref(state_col), _ref(tiebreak_col)
    )
    w = Window.partitionBy(k).orderBy(
        F.unix_micros(ts).asc(), tb.asc()
    )
    return (
        df.select(
            s.alias("from_state"),
            F.lead(s).over(w).alias("to_state"),
            F.lead(tb).over(w).alias("__nxt"),
        )
        .where(F.col("__nxt").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def top_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    steps: int = 3,
    top: int = 20,
) -> DataFrame:
    """Most common ``steps``-long state sequences across entity
    timelines — the path-exploration generalization of
    :func:`transition_counts` (which is ``steps=2``).  Returns
    ``(path, n)`` for the ``top`` most frequent paths, path rendered
    as ``s1>s2>s3`` (NULL states render as ``^``), ties broken by
    path string.

    Scale shape: the same single entity-hash time-sort shuffle;
    ``steps - 1`` lead() columns materialize each window position,
    every complete window emits one path row, and the count aggregate
    runs over the (bounded by |states|^steps) path space with a
    TakeOrdered top-k — no global sort.
    """
    if steps < 2:
        raise ValueError(
            f"top_paths: steps must be >= 2 (got {steps}); for "
            "single-state frequencies use a plain groupBy count"
        )
    k, ts, s, tb = (
        _ref(key_col), _ref(ts_col), _ref(state_col), _ref(tiebreak_col)
    )
    w = Window.partitionBy(k).orderBy(F.unix_micros(ts).asc(), tb.asc())
    cols = [F.coalesce(s.cast("string"), F.lit("^"))]
    guard = None
    for i in range(1, steps):
        cols.append(
            F.coalesce(F.lead(s, i).over(w).cast("string"), F.lit("^"))
        )
        g = F.lead(tb, i).over(w).isNotNull()  # real row, not frame edge
        guard = g if guard is None else (guard & g)
    return (
        df.select(
            F.concat_ws(">", *cols).alias("path"), guard.alias("__ok")
        )
        .where(F.col("__ok"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(top)
    )
