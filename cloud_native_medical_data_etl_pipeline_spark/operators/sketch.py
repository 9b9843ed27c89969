"""Sublinear-memory frequency & cardinality sketches (Count-Min, HLL).

The exact token count (q45's shape) shuffles one row per distinct
token — fine until the vocabulary itself is the problem (web-scale
corpora push billions of distinct tokens). The Count-Min sketch caps
state at d×w counters no matter the vocabulary: every token increments
one counter per hash row, and an estimate reads the MINIMUM of its d
counters — an upper bound on the true count (collisions only ever
inflate), with error ≤ εN for w = ⌈e/ε⌉ at confidence 1-(1/2)^d.

Spark shape: the build is ONE aggregate whose key space is capped at
d×w (partial map-side combine, shuffle carries ≤ d×w rows per
executor); estimation broadcast-joins the tiny sketch. Hashing is the
repo's deterministic md5-slice convention, so the DuckDB oracle
reproduces every collision and the driver check verifies the sketch's
estimates EXACTLY — including their characteristic overestimates.

Extension beyond the reference (no sketches in the pandas pipeline);
complements `bloom.py` (membership) with frequency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ._common import col_ref, md5_position


def _row_pos(tok: Column, j: int, w: int) -> Column:
    """Counter index of ``tok`` in hash row j: the shared seeded-
    position hash (`_common.md5_position`) with seed j, modulus w."""
    return md5_position(tok, j, w)


def build_count_min(
    df: DataFrame,
    content_col: str = "text",
    d: int = 4,
    w: int = 1 << 10,
) -> DataFrame:
    """The d×w sketch of ``df``'s token stream: (j, pos, cnt) rows,
    at most d·w of them regardless of vocabulary size. One explode +
    one bounded-key aggregate; the shuffle after map-side combine
    carries ≤ d·w rows per task."""
    toks = df.select(
        F.explode(
            X.lower_tokens(F.coalesce(col_ref(content_col), F.lit("")))
        ).alias("tok")
    )
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _row_pos(F.col("tok"), j, w).alias("pos"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("c")
    ).select("c.j", "c.pos")
    return cells.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimate(
    tokens: DataFrame,
    sketch: DataFrame,
    token_col: str = "tok",
    d: int = 4,
    w: int = 1 << 10,
) -> DataFrame:
    """Estimated count per token: min over the d counters each token
    hashes to (0 if a counter was never touched — impossible for a
    token that was in the build stream, possible for probes of unseen
    tokens). The sketch is ≤ d·w rows and BROADCASTS; per-token work
    is d narrow lookup rows + one token-keyed min."""
    probes = tokens.select(
        col_ref(token_col).alias("tok"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _row_pos(col_ref(token_col), j, w).alias("pos"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("c"),
    ).select("tok", "c.j", "c.pos")
    return (
        probes.join(F.broadcast(sketch), ["j", "pos"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("n_est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog: fixed-memory distinct-count estimation
# ---------------------------------------------------------------------------
def _hll_alpha(m: int) -> float:
    """Flajolet's bias constant for m >= 128 registers, written as the
    exact expression the oracle repeats so both engines evaluate the
    same double."""
    return 0.7213 / (1.0 + 1.079 / float(m))


def hll_register_maxes(
    df: DataFrame,
    content_col: str = "text",
    group_col: str = "source",
    p: int = 8,
) -> DataFrame:
    """Per-group HLL registers: (group, reg, mx) with at most 2^p rows
    per group surviving the map-side combine, no matter how many input
    rows feed it.  `p` must be a multiple of 4 (the register index is a
    hex-prefix slice of md5, the repo's engine-portable hash).

    rho — the 1-based position of the first set bit in the 64-bit
    stream after the register bits — is computed with pure string/int
    ops (strip leading hex zeros, then a 16-way CASE on the first
    nonzero digit), so DuckDB reproduces it exactly; no float log2.
    """
    if p % 4 or not 8 <= p <= 60:
        # lower bound: the 0.7213/(1+1.079/m) alpha is the standard
        # constant only for m >= 128, so p=4 (m=16) would silently add
        # bias on top of HLL's already-large small-m error; upper
        # bound: the register index is conv() of p/4 hex digits cast
        # to LONG, exact only through 15 digits (p=60) — and the rho
        # stream slices the next 16 of md5's 32, fitting at p<=60
        raise ValueError(
            f"p must be a multiple of 4 in [8, 60], got {p}"
        )
    h = F.md5(F.coalesce(col_ref(content_col), F.lit("")))
    reg = F.conv(F.substring(h, 1, p // 4), 16, 10).cast("long")
    suffix = F.substring(h, p // 4 + 1, 16)
    stripped = F.regexp_replace(suffix, "^0+", "")
    first = F.substring(stripped, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = (
        F.when(stripped == "", F.lit(65))
        .otherwise((16 - F.length(stripped)) * 4 + extra + 1)
        .cast("int")
    )
    return (
        df.select(
            col_ref(group_col).alias("grp"),
            reg.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("mx"))
    )


def hll_cardinality(
    df: DataFrame,
    content_col: str = "text",
    group_col: str = "source",
    p: int = 8,
) -> DataFrame:
    """Estimated distinct `content_col` values per group: (group,
    hll_est).  Standard raw-HLL harmonic mean over 2^p registers with
    the small-range linear-counting correction; untouched registers
    contribute 2^0 to the harmonic sum without materializing them
    (m - touched), so no group×register crossjoin exists anywhere.

    Scale shape: one bounded-key aggregate (≤ groups·2^p shuffle rows
    after partial combine) + one group-keyed rollup.  The 2^p-register
    state is what a 1000-executor run shuffles per group — constant,
    unlike exact count-distinct whose shuffle carries every distinct
    value.  Typical relative error 1.04/sqrt(2^p) (6.5% at p=8).

    When cross-engine reproducibility is NOT required, prefer Spark's
    native ``approx_count_distinct`` (HLL++, JVM-side sparse registers
    + bias correction — `operators/profile.py` uses it); this operator
    exists for the oracle-checkable path: every register value is a
    pure md5/string expression DuckDB reproduces bit-exactly."""
    m = 1 << p
    alpha = _hll_alpha(m)
    regs = hll_register_maxes(df, content_col, group_col, p)
    agg = regs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("z_hit"),
        F.count(F.lit(1)).alias("touched"),
    )
    raw = F.lit(alpha) * m * m / (F.col("z_hit") + (m - F.col("touched")))
    v = m - F.col("touched")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), m * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        F.col("grp").alias(group_col),
        F.round(est, 3).alias("hll_est"),
    )
