"""Grouped percentile summaries with an explicit exact/approximate
switch.

The exact SQL ``percentile()`` aggregate buffers EVERY value of a
group in one aggregation buffer — at 100 TB a hot group concentrates
~N_group doubles in a single executor's memory, which is a per-group
memory bomb.  The default here is therefore ``approx``: Spark's
``percentile_approx`` (Greenwald-Khanna sketch) has bounded state per
group (O(accuracy)), merges map-side partials like any other
aggregate, and its error is a rank (not value) bound of
``1/accuracy``.  The exact form stays available for small groups and
for oracle rows that need bit-reproducible answers (DuckDB
``quantile_cont`` matches Spark's exact ``percentile`` interpolation,
but no SQL engine reproduces the sketch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._common import col_ref


def _alias(p: float) -> str:
    # 0.5 -> p50, 0.95 -> p95, 0.999 -> p99_9
    s = f"{p * 100:g}".replace(".", "_")
    return f"p{s}"


def group_percentiles(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    percentiles: Sequence[float] = (0.5, 0.95, 0.99),
    exact: bool = False,
    accuracy: int = 10_000,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group percentiles of ``value_col``.

    exact=False (default, the 100 TB path): one ``percentile_approx``
    sketch per group — bounded memory, partial-merge aggregation.
    exact=True: SQL ``percentile`` — buffers the whole group; use for
    small groups or oracle-reproducible output only.
    """
    # exact-name reference (shared col_ref): interpolating the raw
    # name into an F.expr SQL string breaks on dots/spaces/quotes —
    # or silently resolves to a different expression
    ref = col_ref(value_col)
    grp = col_ref(group_col)
    if exact:
        aggs = [
            F.round(F.percentile(ref, F.lit(float(p))), round_dp).alias(
                _alias(p)
            )
            for p in percentiles
        ]
        return df.groupBy(grp).agg(*aggs)

    sketch = F.percentile_approx(
        ref,
        F.array(*[F.lit(float(p)) for p in percentiles]),
        F.lit(int(accuracy)),
    ).alias("__pcts")
    out = df.groupBy(grp).agg(sketch)
    return out.select(
        grp,
        *[
            F.round(F.col("__pcts").getItem(i), round_dp).alias(_alias(p))
            for i, p in enumerate(percentiles)
        ],
    )


def rolling_zscore_flags(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket_seconds: int = 3_600,
    trailing_buckets: int = 24,
    z_thresh: float = 3.0,
    min_points: int = 30,
    round_dp: int = 4,
    id_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Time-local anomaly flags: a row is anomalous when its value is
    more than ``z_thresh`` sample standard deviations from the mean of
    its group over the TRAILING ``trailing_buckets`` time buckets
    (current bucket excluded).  The time-local complement to
    :func:`mad_outlier_summary` — MAD judges a value against the
    group's whole history; this judges it against what the group
    looked like *just before* it, which is what drift/incident
    detection wants.

    Returns ``(*id_cols, group_col, z)`` for flagged rows only, with
    ``z`` rounded to ``round_dp``.

    Scale shape — and why the window is BUCKET-aligned, not per-row:
    a per-row trailing window (``rangeBetween`` on the raw event
    time) looks natural, but Spark's sliding-frame aggregates have no
    retraction — each row RE-AGGREGATES its whole frame, so the
    window pass costs O(rows x frame occupancy): measured 9.2 s for
    100k events with ~700-row frames, and growing with the square of
    event density.  Bucketing instead reduces the corpus map-side to
    (group, bucket, count, sum, sum_sq) partials — ONE linear
    aggregation shuffle — runs the trailing frame over that
    bucket-count-sized frame (groups x buckets rows, trivially
    cheap at any corpus size), and broadcast-joins the per-bucket
    stats back to rows.  Mean/sd come from the merged partials
    (``sd^2 = (sum_sq - sum^2/n)/(n-1)``), the same algebra any
    engine can reproduce exactly.  Excluding the current bucket keeps
    a burst from inflating the baseline it is judged against (and
    makes the stats join-able without per-row leave-one-out).

    Rows whose trailing window holds fewer than ``min_points`` values
    or has zero variance are never flagged (warm-up guard).  Buckets
    are floor(epoch_us / bucket) so sub-second timestamps never
    collapse; the trailing frame is a RANGE frame over the bucket
    INDEX, so gaps (empty buckets) age out by time, not by row
    position.
    """

    v, g = col_ref(value_col), col_ref(group_col)
    bucket = F.floor(
        F.unix_micros(col_ref(ts_col)) / F.lit(bucket_seconds * 1_000_000)
    )

    partials = df.groupBy(g.alias("__g"), bucket.alias("__b")).agg(
        F.count(v).alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__ss"),
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__b")
        .rangeBetween(-trailing_buckets, -1)
    )
    n = F.sum("__n").over(w)
    s = F.sum("__s").over(w)
    ss = F.sum("__ss").over(w)
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1))
    stats = partials.select(
        F.col("__g"),
        F.col("__b"),
        n.alias("__tn"),
        mean.alias("__m"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("__sd"),
    ).where(F.col("__tn") >= min_points)

    z = F.round((v - F.col("__m")) / F.col("__sd"), round_dp)
    return (
        df.join(
            F.broadcast(stats),
            (g.eqNullSafe(F.col("__g"))) & (bucket == F.col("__b")),
        )
        .select(*[col_ref(c) for c in id_cols], g, z.alias("z"), F.col("__sd"))
        .where((F.col("__sd") > 0) & (F.abs(F.col("z")) > z_thresh))
        .drop("__sd")
    )


def mad_outlier_summary(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
    round_dp: int = 6,
) -> DataFrame:
    """Robust per-group outlier counts via median absolute deviation:
    an x is an outlier when ``|x - median| > k * MAD`` — the
    scale-robust replacement for mean/stddev z-scores (one wild value
    corrupts a mean; it barely moves a median), the standard numeric
    filter for training-data value columns.

    Returns (group_col, median, mad, n_outliers, n_total).

    Scale shape: two grouped EXACT percentile passes (median of x,
    then median of |x - median|) with the tiny per-group medians
    broadcast back between them, then one counting aggregate. Exact
    percentiles buffer a group's values in one aggregation buffer —
    the same per-group bound group_percentiles documents — so for hot
    groups at 100 TB swap the median calls for percentile_approx; the
    exact form is what gives the operator a bit-reproducible DuckDB
    oracle (quantile_cont matches Spark's percentile interpolation).

    NULL handling: NULL group keys form their own group (the joins
    back are null-safe, matching groupBy semantics); rows with a NULL
    value count toward ``n_total`` but can never be outliers; a group
    whose values are ALL NULL reports n_outliers = 0, not NULL.
    """

    v, g = col_ref(value_col), col_ref(group_col)
    # internal names are __-prefixed so an input frame that already
    # has a 'median'/'mad' column cannot make the joins ambiguous
    med = df.groupBy(g.alias("__mg")).agg(
        F.percentile(v, F.lit(0.5)).alias("__med")
    )
    with_med = df.join(F.broadcast(med), g.eqNullSafe(F.col("__mg")))
    dev = F.abs(v - F.col("__med"))
    mad = (
        with_med.select(F.col("__mg"), dev.alias("__dev"))
        .groupBy(F.col("__mg").alias("__ag"))
        .agg(F.percentile(F.col("__dev"), F.lit(0.5)).alias("__mad"))
    )
    flagged = with_med.join(
        F.broadcast(mad), F.col("__mg").eqNullSafe(F.col("__ag"))
    )
    return (
        flagged.groupBy(F.col("__mg").alias(group_col))
        .agg(
            F.round(F.first("__med"), round_dp).alias("median"),
            F.round(F.first("__mad"), round_dp).alias("mad"),
            F.sum(
                F.when(dev > F.lit(k) * F.col("__mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


def quantile_buckets(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 10,
    id_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Rank-normalize ``value_col`` within each group into
    ``n_buckets`` quantile buckets via ``percent_rank`` — the
    distribution-free feature transform (per-cohort score deciles,
    difficulty bands for curriculum sampling).  Unlike ``ntile``,
    percent_rank gives TIED values the same bucket, so the transform
    is a pure function of (group, value) — deterministic under any
    row order, which is what makes it engine-reproducible.

    Returns ``(*id_cols, group_col, bucket)``, bucket 0-based.

    Scale shape: one hash-by-group sort-by-value shuffle; percent_rank
    is a streaming rank function (O(1) state).  NULL values sort first
    under Spark AND DuckDB default ascending order and land in bucket
    0; filter them upstream if that is not the intent.
    """

    # NULLS FIRST explicitly: Spark's default asc puts NULLs first but
    # DuckDB >= 0.8 defaults to NULLS LAST — pinning the placement on
    # both sides keeps NULL values in bucket 0 in either engine
    w = Window.partitionBy(col_ref(group_col)).orderBy(
        col_ref(value_col).asc_nulls_first()
    )
    bucket = F.least(
        F.floor(F.percent_rank().over(w) * n_buckets), F.lit(n_buckets - 1)
    ).cast("long")
    return df.select(
        *[col_ref(c) for c in id_cols], col_ref(group_col), bucket.alias("bucket")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    round_dp: int = 6,
    exact: bool = True,
    accuracy: int = 10_000,
    id_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` into the group's
    ``[p_lower, p_upper]`` percentile band — the tail-taming
    normalization for reward/score columns where MAD flags outliers
    but training wants them BOUNDED, not dropped.

    Returns ``(*id_cols, group_col, clipped)`` with ``clipped``
    rounded; NULL values stay NULL (Spark's ``greatest``/``least``
    skip NULLs, which would otherwise silently clamp a NULL to the
    lower bound).

    Scale shape: one grouped percentile aggregate (G rows) broadcast
    back onto the corpus — clipping is then a pure map-side
    expression.  ``exact=True`` buffers each group's values in the
    percentile aggregate (the group_percentiles bound) and is the
    oracle-reproducible form; ``exact=False`` swaps in the
    percentile_approx sketch for hot groups at scale.
    """
    v, g = col_ref(value_col), col_ref(group_col)
    if exact:
        lo = F.percentile(v, F.lit(float(lower)))
        hi = F.percentile(v, F.lit(float(upper)))
    else:
        lo = F.percentile_approx(v, F.lit(float(lower)), F.lit(int(accuracy)))
        hi = F.percentile_approx(v, F.lit(float(upper)), F.lit(int(accuracy)))
    bounds = df.groupBy(g.alias("__bg")).agg(
        lo.alias("__lo"), hi.alias("__hi")
    )
    clipped = F.when(
        v.isNull(), F.lit(None).cast("double")
    ).otherwise(F.round(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")), round_dp))
    return (
        df.join(F.broadcast(bounds), g.eqNullSafe(F.col("__bg")))
        .select(
            *[col_ref(c) for c in id_cols], g, clipped.alias("clipped")
        )
    )


def chi_square_crosstab(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Pearson chi-square independence statistic between two
    categorical columns — the quick "is this feature informative /
    is this split biased" test over arbitrarily many rows.

    Returns ONE row ``(chi2, dof, n)`` where
    ``chi2 = sum over cells of (observed - expected)^2 / expected``
    with ``expected = row_total * col_total / n``; ``dof =
    (|A|-1) * (|B|-1)``.  NULL categories are categories.

    Scale shape: one (a, b) counting aggregate (cell-cardinality-
    sized), marginals re-aggregated FROM THE CELLS (no second corpus
    scan), expected values computed on the tiny cell frame via two
    broadcast joins, one final single-row sum.  All arithmetic is
    exact rationals-in-doubles, so the rounded statistic is
    engine-reproducible.
    """
    a, b = col_ref(col_a), col_ref(col_b)
    cells = df.groupBy(a.alias("__a"), b.alias("__b")).agg(
        F.count(F.lit(1)).alias("__o")
    )
    # marginal joins are NULL-SAFE and the distinct counts add the
    # NULL category back in (count_distinct ignores NULLs): a plain
    # equi-join would silently drop every NULL-category cell — halving
    # the statistic and zeroing dof on exactly the "is this split
    # biased" inputs where NULLs matter most
    row_tot = cells.groupBy(F.col("__a").alias("__ra_k")).agg(
        F.sum("__o").alias("__ra")
    )
    col_tot = cells.groupBy(F.col("__b").alias("__cb_k")).agg(
        F.sum("__o").alias("__cb")
    )
    n_tot = cells.agg(
        F.sum("__o").cast("double").alias("__n"),
        (
            F.count_distinct("__a")
            + F.max(F.when(F.col("__a").isNull(), 1).otherwise(0))
        ).alias("__ka"),
        (
            F.count_distinct("__b")
            + F.max(F.when(F.col("__b").isNull(), 1).otherwise(0))
        ).alias("__kb"),
    )
    # the statistic sums over the FULL ka×kb grid: a zero-observed
    # cell still contributes (0 − e)²/e = e, so summing only observed
    # cells systematically underestimates chi2 on any table with empty
    # cells (a perfect-dependence 2×2 reports HALF its true value).
    # The grid is the cross product of the two marginal frames —
    # category-cardinality-sized, broadcast — with observed counts
    # left-joined on and missing cells coalesced to 0.
    grid = row_tot.crossJoin(F.broadcast(col_tot))
    joined = (
        grid.join(
            F.broadcast(cells),
            F.col("__ra_k").eqNullSafe(F.col("__a"))
            & F.col("__cb_k").eqNullSafe(F.col("__b")),
            "left",
        )
        .crossJoin(F.broadcast(n_tot))
    )
    o = F.coalesce(F.col("__o"), F.lit(0)).cast("double")
    exp = F.col("__ra") * F.col("__cb") / F.col("__n")
    term = (o - exp) * (o - exp) / exp
    return joined.agg(
        F.round(F.sum(term), round_dp).alias("chi2"),
        ((F.first("__ka") - 1) * (F.first("__kb") - 1))
        .cast("long")
        .alias("dof"),
        F.first("__n").cast("long").alias("n"),
    )


def kl_drift(
    df: DataFrame,
    period_col: str,
    category_col: str,
    base_period,
    new_period,
    round_dp: int = 6,
) -> DataFrame:
    """Distribution drift between two periods of a categorical column:
    ``KL(new || base)`` plus total-variation distance — the mixture /
    traffic drift monitor (did this week's event mix shift?).

    Returns ONE row ``(kl, tv, n_base, n_new)``.  Categories absent
    from a period get probability 0; KL uses additive smoothing of
    one pseudo-count per category on the BASE side only (new-side
    zeros contribute 0 to KL by the 0*log(0/q)=0 convention), so the
    divergence is finite and both engines compute the identical
    closed form.

    Scale shape: one (period, category) counting aggregate — the
    corpus reduces to a category-cardinality-sized frame before any
    distribution math; the probability algebra runs on that tiny
    frame via a full-outer category join.
    """
    p, c = col_ref(period_col), col_ref(category_col)
    counts = (
        df.where(p.isin([base_period, new_period]))
        .groupBy(p.alias("__p"), c.alias("__c"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    base = counts.where(F.col("__p") == base_period).select(
        "__c", F.col("__n").alias("__nb")
    )
    new = counts.where(F.col("__p") == new_period).select(
        F.col("__c").alias("__c2"), F.col("__n").alias("__nn")
    )
    cats = base.join(
        new, F.col("__c").eqNullSafe(F.col("__c2")), "full_outer"
    ).select(
        F.coalesce("__nb", F.lit(0)).alias("nb"),
        F.coalesce("__nn", F.lit(0)).alias("nn"),
    )
    # totals get __-prefixed names: Spark resolves case-insensitively
    # by default, so "Nb" would collide with the cell column "nb"
    tot = cats.agg(
        F.sum("nb").cast("double").alias("__tb"),
        F.sum("nn").cast("double").alias("__tn"),
        F.count(F.lit(1)).cast("double").alias("__tk"),
    )
    j = cats.crossJoin(F.broadcast(tot))
    # empty periods contribute probability 0 everywhere (NOT null: an
    # unguarded nb/0 is NULL under the repo's non-ANSI session and a
    # DIVIDE_BY_ZERO crash under ANSI — either way the monitor would
    # miss the most extreme drift, a fully disjoint period)
    q = (F.col("nb") + F.lit(1.0)) / (F.col("__tb") + F.col("__tk"))
    pr = F.when(
        F.col("__tn") > 0, F.col("nn") / F.col("__tn")
    ).otherwise(F.lit(0.0))
    pb = F.when(
        F.col("__tb") > 0, F.col("nb") / F.col("__tb")
    ).otherwise(F.lit(0.0))
    kl_term = F.when(pr > 0, pr * F.log(pr / q)).otherwise(F.lit(0.0))
    tv_term = F.abs(pr - pb) / 2.0
    return j.agg(
        F.round(F.sum(kl_term), round_dp).alias("kl"),
        F.round(F.sum(tv_term), round_dp).alias("tv"),
        F.sum("nb").cast("long").alias("n_base"),
        F.sum("nn").cast("long").alias("n_new"),
    )


def group_trend(
    df: DataFrame,
    group_col: str,
    x: Column | str,
    y: Column | str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group OLS trend line: ``(group, n, slope, intercept, r2)``
    — "is this segment's metric drifting over time?" as one pass.

    Closed-form least squares from the five sufficient sums
    (n, Σx, Σy, Σxx, Σxy, Σyy): slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²),
    intercept = (Σy − slope·Σx)/n, r² the squared Pearson ratio.
    n and every sum run over PAIRWISE-COMPLETE rows only (both x and
    y non-null) — mixing an all-rows n with NULL-skipping sums would
    corrupt every ratio.  Groups with zero x-variance (fewer than 2
    complete pairs, or none at all — they stay present with n=0)
    emit NULL slope/r2 rather than a divide-by-zero.

    Determinism contract: callers MUST CENTER x near zero (e.g.
    hours since the corpus epoch, not raw epoch-seconds) — with
    |mean(x)|² ≫ var(x) the nΣxx − Σx² cancellation amplifies
    fp-summation noise past the rounding grain; centered, the
    residual cross-engine error is ~1e-10 relative, far below 6dp.
    The zero-variance guard ENFORCES this: when the retained variance
    ratio den_x/(nΣxx) falls below 1e-12 — constant x, OR uncentered
    x whose offset dwarfs its spread — the group emits NULL rather
    than digits that would be engine- and partitioning-unstable.

    Scale shape: ONE aggregate with map-side partial combine — six
    doubles of state per group, no window, no second pass; the
    downstream algebra is per-group scalar arithmetic in codegen.
    """
    xc = col_ref(x) if isinstance(x, str) else x
    yc = col_ref(y) if isinstance(y, str) else y
    # every sufficient sum is masked to PAIRWISE-COMPLETE rows: SUM
    # skips NULLs per-term, so an unmasked COUNT(1) would pair an
    # n-with-NULLs against sums-without-NULLs and silently corrupt
    # slope/intercept/r2 for any group with a NULL x or y.  Groups
    # stay present (n=0, NULL stats) — the groupBy is unfiltered.
    both = xc.isNotNull() & yc.isNotNull()
    xm = F.when(both, xc)
    ym = F.when(both, yc)
    sums = df.groupBy(col_ref(group_col)).agg(
        F.count(xm).alias("n"),
        F.sum(xm).alias("sx"),
        F.sum(ym).alias("sy"),
        F.sum(xm * xm).alias("sxx"),
        F.sum(xm * ym).alias("sxy"),
        F.sum(ym * ym).alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    # zero-variance guard is RELATIVE, not an exact float compare: for
    # constant-but-nonzero x the nΣxx − Σx² cancellation leaves ~ulp
    # garbage (|den| ≈ 1e-16·nΣxx) that `!= 0` would divide by,
    # producing a spurious huge slope (ADVICE r6).  den must clear
    # 1e-12 of its uncancelled magnitude — legitimate variance is
    # orders above that under the centered-x contract, and fp noise
    # (positive OR negative) falls below it.
    ok_x = den_x > F.lit(1e-12) * n * F.col("sxx")
    ok_y = den_y > F.lit(1e-12) * n * F.col("syy")
    slope = F.when(ok_x, num / den_x)
    intercept = F.when(
        ok_x, (F.col("sy") - (num / den_x) * F.col("sx")) / n
    )
    r2 = F.when(ok_x & ok_y, num * num / (den_x * den_y))
    return sums.select(
        col_ref(group_col),
        n,
        F.round(slope, round_dp).alias("slope"),
        F.round(intercept, round_dp).alias("intercept"),
        F.round(r2, round_dp).alias("r2"),
    )
