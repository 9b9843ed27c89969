"""Connected components over near-duplicate pair graphs.

Near-dup operators (dedup.minhash_lsh_pairs etc.) emit PAIRS; corpus
dedup needs CLUSTERS — similarity chains a~b, b~c must collapse to one
canonical document even when a~c was never scored. That transitive step
is connected components: every doc gets the minimum doc key reachable
through the pair graph, and keep-one-per-component is then a single
groupBy.

The reference has no iterative operators at all (SURVEY.md §2); this is
the training-data-pipeline extension that completes its dedup story.

Algorithm: min-label propagation. Each round every vertex takes the
minimum label among itself and its neighbors; rounds needed = graph
diameter, and near-dup clusters are shallow (dozens of docs, diameter a
handful). The Spark-specific parts that make an ITERATIVE DataFrame
loop viable:

  * `localCheckpoint` each round — without it the lineage doubles per
    iteration and analysis cost explodes;
  * convergence is detected with a changed-label count (one small
    action per round), not a fixed round count;
  * state per round is one narrow (vertex, label) frame; each round
    costs one shuffle join + one groupBy-min on it.

At 100 TB: label propagation is the O(diameter)-round baseline;
synchronous alternating large-star/small-star halves round count for
high-diameter graphs, and either way per-round cost stays one shuffle
of the (vertex, label) frame — never the shingle/text payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "key_a",
    dst: str = "key_b",
    max_iter: int = 50,
) -> DataFrame:
    """(vertex, component) for every vertex in `pairs`, where component
    is the minimum vertex key reachable via undirected edges."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor = edges.join(
            labels.withColumnRenamed("v", "b"), "b"
        ).select(F.col("a").alias("v"), "label")
        new_labels = (
            labels.union(neighbor)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    src: str = "key_a",
    dst: str = "key_b",
) -> DataFrame:
    """Cluster summary per component: size and canonical (minimum) key.
    The keep-list for corpus dedup is `keep = all docs EXCEPT vertices
    with vertex != component` — one anti join downstream."""
    cc = connected_components(pairs, src, dst)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("vertex").alias("max_member"),
    )
