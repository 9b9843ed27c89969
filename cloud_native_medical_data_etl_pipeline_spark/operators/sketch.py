"""Count-Min sketch: sublinear-memory token frequency estimation.

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
from ._common import col_ref


def _row_pos(tok: Column, j: int, w: int) -> Column:
    """Counter index of ``tok`` in hash row j: int(md5('j|'||tok)[:8],
    16) % w — exact integer ops, engine-portable."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}|"), tok)), 1, 8), 16, 10
        ).cast("long")
        % w
    )


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
