"""Item co-occurrence / association mining over grouped baskets.

The market-basket primitive: which items appear together in the same
basket more often than independence predicts?  Feeds recommendation
priors, event-correlation dashboards, and curriculum co-topic
analysis.

Scale shape: the input reduces FIRST to distinct (basket, item) rows
(one shuffle — multiplicity inside a basket never inflates pair
counts), pairs come from a self-equi-join ON THE BASKET KEY, and all
counts aggregate map-side-combinable.  Per-basket pair volume is
C(k, 2) for a k-item basket, so the hazard is the degenerate hot
basket (a bot session touching every item): ``max_basket_items``
drops those baskets before the join — the same cap-the-hot-group
guard as ngram pruning and linkage blocking, declared in the
operator's semantics so oracles mirror it.  The basket total N rides
as a one-row broadcast (the q74/TF-IDF pattern), never a driver-side
count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame,
    basket_cols: Sequence[str],
    item_col: str,
    min_pair_count: int = 1,
    max_basket_items: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Distinct item pairs with co-occurrence count and lift.

    Returns ``(item_a, item_b, pair_n, lift)`` with ``item_a <
    item_b``; ``lift = (pair_n * N) / (n_a * n_b)`` where N is the
    number of (surviving) baskets and n_x the baskets containing x.
    """
    bk = [F.col(c) for c in basket_cols]
    d = df.select(*bk, F.col(item_col).alias("__it")).distinct()

    if max_basket_items is not None:
        sizes = d.groupBy(*basket_cols).agg(
            F.count(F.lit(1)).alias("__bn")
        )
        d = d.join(
            sizes.where(F.col("__bn") <= max_basket_items).select(
                *basket_cols
            ),
            list(basket_cols),
        )
    d = d.persist()

    n_total = d.select(*basket_cols).distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__N")
    )
    item_n = d.groupBy("__it").agg(F.count(F.lit(1)).alias("__in"))

    a = d.select(*bk, F.col("__it").alias("item_a"))
    b = d.select(*bk, F.col("__it").alias("item_b"))
    pairs = (
        a.join(b, list(basket_cols))
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .where(F.col("pair_n") >= min_pair_count)
    )
    out = (
        pairs.join(
            F.broadcast(item_n.select(F.col("__it").alias("item_a"),
                                      F.col("__in").alias("__na"))),
            "item_a",
        )
        .join(
            F.broadcast(item_n.select(F.col("__it").alias("item_b"),
                                      F.col("__in").alias("__nb"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "item_a",
            "item_b",
            "pair_n",
            F.round(
                F.col("pair_n") * F.col("__N")
                / (F.col("__na") * F.col("__nb")),
                round_dp,
            ).alias("lift"),
        )
    )
    from .dedup import _with_cached_deps

    return _with_cached_deps(out, d)
