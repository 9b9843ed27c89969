"""Weighted PageRank over edge lists, plus corpus graph extraction.

Link-style centrality is the canonical iterative-join workload a
declarative engine must handle well (the reference pandas pipeline has
no iterative operators at all — SURVEY.md §2); it also earns its keep
in a training-data pipeline directly: rank tokens/entities by
co-occurrence centrality for vocabulary pruning, rank sources by
citation structure for quality weighting.

Spark shape per iteration: ranks ⋈ edges on src (shuffle keyed by
src), one groupBy(dst) sum for the incoming mass, one broadcast of the
two scalar aggregates (dangling mass, node count).  Between
iterations the rank frame is `localCheckpoint`-ed — the same lesson as
`components.py`: each iteration references the previous ranks three
times (contributions, dangling mass, node join), so an unpersisted
loop recomputes the whole prefix 3^k times and the lineage explodes.
On a real cluster prefer a reliable checkpoint dir for long chains;
state per iteration is one narrow (node, rank) frame either way.

Determinism contract (cross-engine oracles): every iteration ROUNDS
ranks to `iter_dp` decimals, so both engines re-synchronize each hop
and fp summation-order noise (~1e-16 relative) can never accumulate
across iterations; all float constants are injected as Python-repr'd
doubles on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ._common import col_ref


def adjacency_edges(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted token-adjacency edges ``(src, dst, w)``: one edge per
    ordered bigram occurrence, counted corpus-wide.  One posexplode +
    one self-join on (doc, pos+1) — the join key is the document id
    and position, so the shuffle carries narrow (id, pos, token) rows,
    never the document text."""
    toks = df.select(
        col_ref(id_col).alias("k"),
        F.posexplode(
            X.lower_tokens(F.coalesce(col_ref(content_col), F.lit("")))
        ).alias("pos", "tok"),
    )
    a = toks.select("k", "pos", F.col("tok").alias("src"))
    b = toks.select(
        "k", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("dst")
    )
    return (
        a.join(b, ["k", "pos"])
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 8,
    iter_dp: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Weighted PageRank with uniform teleport and dangling-mass
    redistribution: ``(node, rank)`` for every node appearing as an
    edge endpoint, after a FIXED number of damped iterations (fixed —
    not convergence-tested — so the computation is a closed form both
    engines reproduce exactly).

    rank_{t+1}(v) = (1-d)/N + d·(Σ_{u→v} rank_t(u)·w(u,v)/outw(u)
                               + dangling_t/N)

    Edges must carry positive weight to distribute rank; w<=0 / NULL
    edges are ignored for mass flow (their endpoints still join the
    node set), and a node with no positive-weight out-edge is
    dangling.  Ranks therefore always sum to 1.
    """
    e = edges.select(
        F.col("src"), F.col("dst"), F.col("w").cast("double").alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    # only edges with POSITIVE weight carry rank: a w<=0 or NULL edge
    # has no defined share of u's out-mass, and a node whose EVERY
    # edge is such falls out of outw and into the dangling set below —
    # otherwise its w/0 (or NULL) normalization would make its rank
    # mass silently evaporate each iteration (ranks no longer summing
    # to 1) instead of redistributing uniformly.
    ew = e.where(F.col("w") > 0)
    outw = ew.groupBy("src").agg(F.sum("w").alias("ow"))
    # iteration-invariant state, computed ONCE: normalized edge
    # weights (w/outw) and the dangling-node set — re-deriving either
    # inside the loop would add a join and an anti-join per iteration
    enorm = (
        ew.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("wn"))
        .localCheckpoint()
    )
    dang = (
        nodes.join(outw, nodes["node"] == outw["src"], "left_anti")
        .select("node")
        .localCheckpoint()
    )
    n_lit = F.lit(float(n))
    tp = F.lit(1.0 - damping)
    d = F.lit(damping)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            ranks.join(enorm, ranks["node"] == enorm["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("wn")).alias("c"))
        )
        dangling = (
            ranks.join(dang, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(dangling))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                F.round(
                    tp / n_lit
                    + d
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / n_lit
                    ),
                    iter_dp,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", round_dp).alias("rank"))
