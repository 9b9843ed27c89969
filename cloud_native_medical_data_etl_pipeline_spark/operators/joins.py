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

from ._common import col_ref


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lo_s: float = 0.0,
    hi_s: float = 3600.0,
    right_payload: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Interval self/range join: pairs where both rows share the ``on``
    key and ``left_ts + lo_s < right_ts <= left_ts + hi_s``.

    The naive formulation (equi-join on key, range as a post-filter)
    shuffles fine but explodes O(k²) pairs inside every hot key before
    the filter runs. This version *blocks by time bin* first: right
    rows get ``floor(us / w)`` (w = window span); each left row probes
    only the two bins its interval ``(t+lo, t+hi]`` can touch. The join
    key becomes (key, bin), so a hot key's pairs are split across its
    time bins — the per-task blowup is bounded by events-per-key-per-
    window, not events-per-key. Arithmetic is in exact ``unix_micros``
    longs (a double epoch loses microseconds to cancellation).

    Emits left columns plus ``gap_us`` and the prefixed right payload.
    """
    lo_us = int(round(lo_s * 1_000_000))
    hi_us = int(round(hi_s * 1_000_000))
    w_us = hi_us - lo_us
    if w_us <= 0:
        raise ValueError("hi_s must exceed lo_s")
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    r = right.select(
        col_ref(on).alias("__k"),
        F.unix_micros(col_ref(right_ts)).alias("__rus"),
        col_ref(right_ts).alias(f"{prefix}{right_ts}"),
        *[col_ref(c).alias(f"{prefix}{c}") for c in right_payload],
    ).withColumn("__bin", F.floor(F.col("__rus") / F.lit(w_us)))
    l = left.withColumn("__lus", F.unix_micros(col_ref(left_ts))).withColumn(
        "__bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("__lus") + F.lit(lo_us)) / F.lit(w_us)),
                    F.floor((F.col("__lus") + F.lit(hi_us)) / F.lit(w_us)),
                )
            )
        ),
    )
    joined = l.join(
        r,
        (l[on] == r["__k"])
        & (l["__bin"] == r["__bin"])
        & (r["__rus"] > l["__lus"] + F.lit(lo_us))
        & (r["__rus"] <= l["__lus"] + F.lit(hi_us)),
    )
    return joined.withColumn(
        "gap_us", F.col("__rus") - F.col("__lus")
    ).drop("__k", "__bin", "__rus", "__lus")


def followup_stats(
    df: DataFrame,
    on: str,
    ts: str = "ts",
    lo_s: float = 0.0,
    hi_s: float = 3600.0,
    same_col: str | None = None,
) -> DataFrame:
    """Per-row follow-up aggregates over the interval self-join
    ``(row.ts + lo_s, row.ts + hi_s]`` within the ``on`` key — WITHOUT
    materializing the pairs.

    For aggregate-only consumers, :func:`binned_interval_join` does
    strictly unnecessary work: it explodes the left side to 2 probe
    bins, shuffles BOTH sides on (key, bin), materializes every
    qualifying pair as a row, and only then lets the caller's groupBy
    collapse them. When all the caller keeps is per-left-row counts
    and gap sums, those are computable from ONE shuffle of the input
    on the key with two prefix-frame window passes (guide §2.3/§2.4:
    fewer shuffles, fewer bytes — here the pair rows never exist):

      ``S(x) := agg over same-key rows with us <= row.us + x``

    is an ``unboundedPreceding .. x FOLLOWING`` RANGE frame, which
    Spark's WindowExec evaluates INCREMENTALLY (each row extends the
    running buffer — O(partition) total, unlike a both-ends-moving
    sliding frame which re-aggregates per row). The half-open interval
    is then an exact difference of two such frames:

      count  = C(hi) - C(lo)
      ts_sum = S(hi) - S(lo)          -> gap_sum = ts_sum - count*us

    All arithmetic is exact: counts are longs, timestamp sums are
    DECIMAL (epoch-microsecond prefix sums overflow int64 past ~5400
    rows per key; decimal(30) holds ~1e14 rows per key and, unlike
    ANSI-off long wraparound, stays a documented-exact representation
    under ANSI too).

    Returns ``df``'s surviving rows plus:
      * ``fu_count`` (long) — follow-ups in the interval;
      * ``fu_gap_sum_us`` (decimal) — exact sum of (follower.us -
        row.us) over them;
      * ``fu_same_count`` (long, when ``same_col`` is given) —
        follow-ups whose ``same_col`` equals this row's (SQL equality:
        a NULL ``same_col`` matches nothing, even another NULL — the
        window PARTITIONS nulls together, so the NULL group is forced
        to 0 explicitly).

    Rows with a NULL key or NULL ``ts`` are DROPPED: under the join
    form they can neither have follow-ups (NULL never equals the key /
    NULL ts fails every range comparison) nor be one, so they carry no
    information for any downstream aggregate of the pairs.

    Equivalence with ``binned_interval_join(df, df, on, lo_s, hi_s)``
    + per-left-row aggregation is pinned by
    tests/test_joins_sessions.py (nulls, ts ties, hot keys) and, for
    q37, by the DuckDB oracle at all three SFs.
    """
    lo_us = int(round(lo_s * 1_000_000))
    hi_us = int(round(hi_s * 1_000_000))
    if hi_us <= lo_us:
        raise ValueError("hi_s must exceed lo_s")
    # the outputs and the internal temporaries are written with
    # withColumn/select: a caller column with one of these names would
    # be silently overwritten (r16 ADVICE) — refuse loudly instead
    reserved = {"__us", "__ts_sum", "fu_count", "fu_gap_sum_us"} | (
        {"fu_same_count"} if same_col is not None else set()
    )
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"followup_stats reserves column names {clash}; rename them "
            "on the input frame first"
        )
    key = col_ref(on)
    pre = df.where(key.isNotNull() & col_ref(ts).isNotNull()).withColumn(
        "__us", F.unix_micros(col_ref(ts))
    )
    # under-parallel inputs (a single-file scan at bench scale) would
    # otherwise run the whole window chain on the few AQE-coalesced
    # post-shuffle tasks; the pinned keyed exchange satisfies both
    # window specs (hash(on) clusters (on) and (on, same_col)) and is
    # a no-op at real scale — see repartition_key_for_cpu
    from .dedup import repartition_key_for_cpu

    pre = repartition_key_for_cpu(pre, [key])
    dec_us = F.col("__us").cast("decimal(20,0)")

    def frames(*partition_cols):
        base = Window.partitionBy(
            *[col_ref(c) for c in partition_cols]
        ).orderBy("__us")
        return (
            base.rangeBetween(Window.unboundedPreceding, hi_us),
            base.rangeBetween(Window.unboundedPreceding, lo_us),
        )

    w_hi, w_lo = frames(on)
    one = F.count(F.lit(1))
    cols = [
        (one.over(w_hi) - one.over(w_lo)).alias("fu_count"),
        (F.sum(dec_us).over(w_hi) - F.sum(dec_us).over(w_lo)).alias("__ts_sum"),
    ]
    if same_col is not None:
        ws_hi, ws_lo = frames(on, same_col)
        cols.append(
            F.when(
                col_ref(same_col).isNotNull(),
                one.over(ws_hi) - one.over(ws_lo),
            )
            .otherwise(F.lit(0))
            .alias("fu_same_count")
        )
    return (
        pre.select("*", *cols)
        .withColumn(
            # decimal(18,0) for the count: 12 digits capped in-window
            # follower counts at 10^12 for no reason (r16 ADVICE) —
            # decimal(18)*decimal(20) -> decimal(38,0) still fits, and
            # the values are exact integers either way
            "fu_gap_sum_us",
            F.col("__ts_sum") - F.col("fu_count").cast("decimal(18,0)") * dec_us,
        )
        .drop("__us", "__ts_sum")
    )


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
    deterministically to the greatest payload tuple (struct ordering
    over the ORDERABLE payload columns; map-typed columns are carried
    but excluded from the tiebreak), so pass a unique leading payload
    column (an id) for stable output.  Right rows with NULL right_ts
    match nothing and are dropped.  NULL keys follow SQL equality
    (like the cited pandas/DuckDB forms): a NULL-key right row can
    match nothing and is dropped; a NULL-key left row is kept with a
    null payload.  (The window partitions on the key, which GROUPS
    nulls — without the right-side filter, NULL-key rows would
    NULL<=>NULL-match each other, a divergence a r16 probe caught.)
    """
    left_keep = left_keep or [c for c in left.columns if c not in (on, left_ts)]
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload_struct = F.struct(
        col_ref(right_ts).alias("__ts"),
        *[col_ref(c) for c in right_payload],
    )
    # a NULL right_ts satisfies no "<= left_ts" comparison — unfiltered,
    # NULLS-FIRST ordering would sort such rows before everything and
    # attach them as phantom matches to left rows with no real
    # predecessor; a NULL key satisfies no SQL equality, but the
    # window's partitionBy GROUPS nulls, so unfiltered NULL-key right
    # rows would match NULL-key left rows
    r = right.where(
        col_ref(right_ts).isNotNull() & col_ref(on).isNotNull()
    ).select(
        col_ref(on).alias("__k"),
        col_ref(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_keep],
    )
    l = left.select(
        col_ref(on).alias("__k"),
        col_ref(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[col_ref(c) for c in left_keep],
    )
    return _asof_tail(
        r.unionByName(l), on, left_ts, right_ts, left_keep, right_payload, prefix
    )


def _asof_tail(
    shaped: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    left_keep: list[str],
    right_payload: list[str],
    prefix: str,
) -> DataFrame:
    """Shared window pass + final projection over the union-shaped
    frame ``(__k, __t, __side, __p, *left_keep)`` — the tail of both
    :func:`asof_join` (two frames, unioned) and
    :func:`asof_join_same_source` (one frame, one scan)."""
    # side 0 sorts before side 1 at equal ts -> inclusive (>=) match;
    # right-side ts ties break by max payload tuple over the ORDERABLE
    # payload columns only (a MapType column in the payload — allowed
    # as a carried value — would make the sort unanalyzable; if every
    # payload column is unorderable the tie is engine-arbitrary,
    # documented in asof_join).
    from pyspark.sql import types as T

    def _orderable(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    p_types = {
        f.name: f.dataType for f in shaped.schema["__p"].dataType.fields
    }
    ord_cols = [c for c in right_payload if _orderable(p_types[c])]
    tie = (
        F.struct(*[F.col("__p").getField(c) for c in ord_cols])
        if ord_cols
        else F.lit(0)
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), tie.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = shaped.withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    )
    return matched.where(F.col("__side") == 1).select(
        F.col("__k").alias(on),
        F.col("__t").alias(left_ts),
        *[col_ref(c) for c in left_keep],
        F.col("__match").getField("__ts").alias(f"{prefix}{right_ts}"),
        *[
            F.col("__match").getField(c).alias(f"{prefix}{c}")
            for c in right_payload
        ],
    )


def asof_join_same_source(
    base: DataFrame,
    on: str,
    ts_col: str,
    left_pred,
    right_pred,
    left_keep: list[str],
    right_payload: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """:func:`asof_join` for the common case where BOTH sides are
    predicate-selections of ONE frame (clicks vs purchases of an
    events table): builds the union shape in a single conditional
    projection, so the source is scanned ONCE instead of once per
    side — at scale that halves the read volume of the attribution
    pattern; the window tail and its semantics (inclusive match,
    NULL-key/NULL-ts handling, tie-break) are shared verbatim with
    :func:`asof_join` via ``_asof_tail``.

    Requirements, checked by the caller not the engine: ``left_pred``
    and ``right_pred`` must be MUTUALLY EXCLUSIVE (a row satisfying
    both would need to appear on both sides, which a single
    conditional projection cannot emit — use :func:`asof_join`);
    both sides share ``ts_col`` as their timestamp, and ``left_keep``
    / ``right_payload`` name columns of ``base``. Rows where a
    predicate is NULL behave like ``DataFrame.where``: they join the
    side whose predicate is TRUE, or are dropped when neither is.
    Output columns match ``asof_join(base.where(left_pred),
    base.where(right_pred), ...)`` with the same names: the kept left
    columns unprefixed, the matched payload as ``{prefix}{col}``.
    """
    payload_struct = F.struct(
        col_ref(ts_col).alias("__ts"),
        *[col_ref(c) for c in right_payload],
    )
    # same NULL discipline as asof_join: right rows with NULL ts or
    # NULL key are dropped (would otherwise phantom-match through the
    # null-grouping window partition); left rows pass unfiltered
    right_ok = (
        right_pred & col_ref(ts_col).isNotNull() & col_ref(on).isNotNull()
    )
    # canonical two-valued side flag: a surviving row with a NULL
    # left_pred got in via right_ok and must take the right branch in
    # EVERY conditional below (a raw ~left_pred would be NULL there,
    # silently nulling the payload)
    is_left = F.coalesce(left_pred, F.lit(False))
    shaped = base.where(left_pred | right_ok).select(
        col_ref(on).alias("__k"),
        col_ref(ts_col).alias("__t"),
        F.when(is_left, F.lit(1)).otherwise(F.lit(0)).alias("__side"),
        F.when(~is_left, payload_struct).alias("__p"),
        *[F.when(is_left, col_ref(c)).alias(c) for c in left_keep],
    )
    return _asof_tail(
        shaped, on, ts_col, ts_col, left_keep, right_payload, prefix
    )


def range_lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Attach interval-dimension attributes to fact rows whose
    ``value_col`` falls in ``[lo, hi)`` — the tier/threshold/geo-range
    lookup.  The naive form is a non-equi theta-join (BroadcastNested
    LoopJoin: every fact row probes every interval); this one turns it
    into an EQUI-join: each dim interval explodes to the bins it
    covers (``floor(lo/w) .. floor(hi/w)``), the fact side computes
    its bin map-side, and the join key is the bin.  Each fact row then
    meets only the intervals overlapping its bin — O(1) for
    non-overlapping tiers — with the exact ``[lo, hi)`` check folded
    into the join condition.

    The exploded dim costs ~range/bin_width rows per interval: pick
    ``bin_width`` near the typical interval width so the dim stays
    broadcast-sized.  With ``how='left'`` unmatched fact rows survive
    with null dim columns (gap in the tier table), matching the SQL
    LEFT JOIN the oracle writes.
    """
    w = float(bin_width)
    binned_dim = dim.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(col_ref(lo_col) / w).cast("long"),
                F.floor(col_ref(hi_col) / w).cast("long"),
            )
        ),
    )
    v = col_ref(value_col)
    cond = (
        (F.floor(v / w).cast("long") == F.col("__bin"))
        & (v >= col_ref(lo_col))
        & (v < col_ref(hi_col))
    )
    return fact.join(F.broadcast(binned_dim), cond, how).drop("__bin")


def decay_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    on: str,
    conv_ts: str = "ts",
    touch_ts: str = "ts",
    horizon_s: float = 21_600.0,
    tau_s: float = 3_600.0,
    id_cols: list[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Exponential-decay attribution: each conversion's score is
    ``sum over same-key touches in (conv - horizon, conv]`` of
    ``exp(-age / tau)`` — the standard soft credit assignment between
    last-touch (tau -> 0) and linear (tau -> inf).

    Returns ``(*id_cols, on, n_touches, score)`` for conversions with
    at least one in-horizon touch (inner semantics — zero-touch
    conversions carry no credit row).

    Scale shape: pair generation reuses :func:`binned_interval_join`
    (time-bin-blocked equi-join, <= 2 probe bins per conversion, hot
    keys split across their timeline), the decay term is a map-side
    expression on the pair's exact microsecond gap, and the aggregate
    is map-side combinable.  The score is ROUNDED (libm exp may
    differ by an ulp across engines).
    """
    id_cols = id_cols or ["event_id"]
    pairs = binned_interval_join(
        conversions,
        touches,
        on=on,
        left_ts=conv_ts,
        right_ts=touch_ts,
        lo_s=-float(horizon_s),
        hi_s=0.0,
        right_payload=[],
    )
    tau_us = float(tau_s) * 1_000_000.0
    # gap_us = touch - conversion <= 0, so exp(gap/tau) = exp(-age/tau)
    decay = F.exp(F.col("gap_us") / F.lit(tau_us))
    return pairs.groupBy(*id_cols, on).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum(decay), round_dp).alias("score"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bin_span_us: int = 3_600_000_000,
    prefix: str = "r_",
) -> DataFrame:
    """Interval×interval overlap join: pairs where
    ``left_start <= right_end AND right_start <= left_end`` (closed
    intervals), optionally also matching an equality key ``on`` —
    the shape of "which sessions intersect which incident windows",
    span-conflict detection, and meeting-room problems. The *_start/
    *_end columns are epoch-microsecond longs (the q37 lesson: double
    epochs lose microseconds to cancellation).

    Scale shape: both sides explode to the time bins their interval
    covers (``sequence(floor(start/span), floor(end/span))``) and the
    join is an equi-join on (key, bin) with the overlap predicate as
    a post-condition — a hot key's pairs spread across its timeline
    exactly like `binned_interval_join`. A pair overlapping several
    shared bins would normally need a distinct pass; instead each
    pair is claimed ONLY in its canonical bin — the bin of
    ``greatest(left_start, right_start)``, which every genuinely
    overlapping pair's two intervals both cover — so there is no
    dedup shuffle at all. Replication per row is interval-length /
    bin_span: pick the span near the typical interval length.

    Emits left columns plus the prefixed right columns.
    """
    ls, le = F.col(left_start), F.col(left_end)
    span = F.lit(int(bin_span_us))
    lb = left.withColumn(
        "__bin", F.explode(F.sequence(F.floor(ls / span), F.floor(le / span)))
    )
    keep = [c for c in right.columns if on is None or c != on]
    r = right.select(
        *([F.col(on).alias("__k")] if on else []),
        *[F.col(c).alias(f"{prefix}{c}") for c in keep],
    )
    rs, re_ = F.col(f"{prefix}{right_start}"), F.col(f"{prefix}{right_end}")
    rb = r.withColumn(
        "__bin", F.explode(F.sequence(F.floor(rs / span), F.floor(re_ / span)))
    )
    cond = lb["__bin"] == rb["__bin"]
    if on:
        cond = cond & (lb[on] == rb["__k"])
    joined = lb.join(rb, cond)
    return (
        joined.where((ls <= re_) & (rs <= le))
        .where(lb["__bin"] == F.floor(F.greatest(ls, rs) / span))
        .drop("__bin", *(["__k"] if on else []))
    )
