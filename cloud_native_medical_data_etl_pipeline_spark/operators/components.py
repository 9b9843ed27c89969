"""Connected components over near-duplicate pair graphs.

Near-dup operators (dedup.minhash_lsh_pairs etc.) emit PAIRS; corpus
dedup needs CLUSTERS — similarity chains a~b, b~c must collapse to one
canonical document even when a~c was never scored. That transitive step
is connected components: every doc gets the minimum doc key reachable
through the pair graph, and keep-one-per-component is then a single
groupBy.

The reference has no iterative operators at all (SURVEY.md §2); this is
the training-data-pipeline extension that completes its dedup story.

Algorithm: min-label propagation WITH pointer jumping. Each round
every vertex takes the minimum label among itself and its neighbors
(one hop through the edge graph), then shortcuts to its label's label
(one hop through the LABEL graph — the path-halving trick from
pointer-jumping / large-star-small-star CC). Neighbor propagation
alone needs diameter rounds — a 1000-node path graph would take 999
Spark jobs; the shortcut halves every label chain each round, so
convergence is O(log diameter) (property-tested: a 1024-node path
converges in <= 2*log2(n)+4 rounds). The Spark-specific parts that
make an ITERATIVE DataFrame loop viable:

  * `localCheckpoint` each round — without it the lineage doubles per
    iteration and analysis cost explodes;
  * convergence is detected with a changed-label count (one small
    action per round), not a fixed round count;
  * state per round is one narrow (vertex, label) frame; each round
    costs two shuffle joins + one groupBy-min on it — never the
    shingle/text payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "key_a",
    dst: str = "key_b",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(vertex, component) for every vertex in `pairs`, where component
    is the minimum vertex key reachable via undirected edges.

    Pass a dict as ``stats`` to receive {"rounds": n} — used by the
    convergence property tests."""
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
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neighbor = edges.join(
            labels.withColumnRenamed("v", "b"), "b"
        ).select(F.col("a").alias("v"), "label")
        merged = (
            labels.union(neighbor)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: shortcut each vertex to its label's label.
        # A label is always a vertex of the same component (labels
        # start as the vertex itself and only ever take reachable
        # minima), so the shortcut stays inside the component while
        # halving every label chain — O(log diameter) rounds overall
        # instead of O(diameter). Left join + coalesce keeps vertices
        # whose label has no own row (cannot happen by construction,
        # but a dropped row would silently wedge convergence).
        lmap = merged.select(
            F.col("v").alias("__lv"), F.col("label").alias("__ll")
        )
        new_labels = (
            merged.join(lmap, merged["label"] == lmap["__lv"], "left")
            .select(
                "v",
                F.coalesce(
                    F.least("label", "__ll"), F.col("label")
                ).alias("label"),
            )
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
    if stats is not None:
        stats["rounds"] = rounds
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


def cluster_representatives(
    pairs: DataFrame,
    docs: DataFrame,
    score_col: str,
    key_col: str = "doc_id",
    src: str = "key_a",
    dst: str = "key_b",
) -> DataFrame:
    """Quality-aware keep: for each near-dup cluster (connected
    component of the pair graph), keep the HIGHEST-scoring member —
    the curation rule real pipelines use instead of min-id keep-first
    (keep the longest / highest-quality copy, drop the rest).

    Returns one row per cluster: (component, keep, keep_score,
    n_members, dropped) where ``dropped = n_members - 1``. Documents
    in no pair are their own singleton clusters and are NOT returned
    (nothing to decide); union them back as keepers downstream via an
    anti-join against the pair vertices.

    Ties break on the smaller key for determinism. Scale shape: the
    component labeling is pointer-jumping `connected_components`
    (O(log diameter) rounds); scoring joins the vertex frame (pair
    vertices only, not the corpus) to the docs table once, and the
    argmax is one component-keyed WindowGroupLimit window.
    """
    cc = connected_components(pairs, src, dst)
    return _pick_representatives(cc, docs, score_col, key_col)


def _pick_representatives(
    cc: DataFrame, docs: DataFrame, score_col: str, key_col: str
) -> DataFrame:
    """Shared argmax tail: (vertex, component) + docs -> one row per
    component with the highest-scoring member (ties -> smaller key)."""
    from pyspark.sql import Window

    from ._common import col_ref

    scored = cc.join(
        docs.select(
            col_ref(key_col).alias("vertex"),
            col_ref(score_col).alias("__score"),
        ),
        "vertex",
    )
    win = Window.partitionBy("component").orderBy(
        F.col("__score").desc(), F.col("vertex").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(win))
        .groupBy("component")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("vertex"))).alias("keep"),
            F.max(F.when(F.col("__rn") == 1, F.col("__score"))).alias(
                "keep_score"
            ),
            F.count(F.lit(1)).alias("n_members"),
            (F.count(F.lit(1)) - 1).alias("dropped"),
        )
    )


def collapsed_cluster_representatives(
    docs: DataFrame,
    score_col: str,
    key_col: str = "doc_id",
    content_col: str = "text",
    ngram_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """`cluster_representatives` over the MinHash pair graph of `docs`,
    with exact duplicates COLLAPSED before pair generation — the fix
    for the quadratic pair blowup of replica-heavy corpora.

    Exact copies (identical `content_col`) have identical shingle sets,
    so in the full pair graph every copy pairs with every other copy
    AND with everything its text pairs with: a group of m replicas
    inflates pair volume by O(m^2) while adding zero information. This
    variant hash-groups exact copies first, runs the MinHash kernel
    over one CANONICAL doc per group (the minimum key, mirroring
    `dedup.exact_dedup`'s sha2(coalesce(text,'')) key), labels
    components over canonical pairs only, then expands membership back
    to every copy. Pair volume tracks the DEDUPED corpus.

    Output is row-identical to
    ``cluster_representatives(minhash_lsh_pairs(docs), docs)``:

      * components: copies inherit exactly their canonical's
        connectivity (same shingle set => same verified neighbors at
        the same jaccard), so expanded components equal full-graph
        components; labels match because each canonical is the minimum
        key of its copy group, so the min over a component's canonicals
        IS the min over its full member set;
      * multi-copy groups whose canonical sits in no canonical pair are
        still clusters in the full graph (copies pair with each other
        at jaccard 1.0) — emitted with component = canonical, gated on
        the same shingle-producing-text test the MinHash kernel applies
        (empty/whitespace texts produce no shingles, hence no pairs,
        hence no cluster — in either formulation);
      * the score argmax runs over the EXPANDED member set, so a copy
        with a higher `score_col` than its canonical still wins keep.
    """
    from . import dedup as D
    from ..functions import text as X
    from ._common import col_ref

    # members (corpus-sized but narrow) is consumed by the groups
    # aggregate AND the final expansion; groups (|distinct texts| rows)
    # by the canonical semi-join, the solo-group scan, and the
    # expansion — persisted, or every consumption would replay the
    # full-corpus sha2 + shingle-gate HOF this variant exists to
    # bound.  Released via the caller-unpersists contract below.
    members = docs.select(
        col_ref(key_col).alias("member"),
        F.sha2(
            F.coalesce(col_ref(content_col).cast("string"), F.lit("")), 256
        ).alias("__h"),
        (
            F.size(
                X.word_ngrams_from_tokens(
                    X.lower_tokens(col_ref(content_col)), ngram_n
                )
            )
            > 0
        ).alias("__shingleable"),
    ).persist()
    groups = members.groupBy("__h").agg(
        F.min("member").alias("canonical"),
        F.count(F.lit(1)).alias("__n"),
        F.max("__shingleable").alias("__ok"),
    ).persist()
    canon_docs = docs.join(
        groups.select(F.col("canonical").alias(key_col)),
        key_col,
        "semi",
    )
    pairs = D.minhash_lsh_pairs(
        canon_docs,
        content_col=content_col,
        key_col=key_col,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        ngram_n=ngram_n,
    )
    cc_canon = connected_components(pairs)
    # multi-copy groups whose canonical is in no canonical pair are
    # clusters of exact copies (pairwise jaccard 1.0 in the full graph)
    solo_groups = (
        groups.where((F.col("__n") >= 2) & F.col("__ok"))
        .join(
            cc_canon.select(F.col("vertex").alias("canonical")),
            "canonical",
            "anti",
        )
        .select("canonical", F.col("canonical").alias("component"))
    )
    canon_to_comp = cc_canon.select(
        F.col("vertex").alias("canonical"), "component"
    ).unionByName(solo_groups)
    expanded = (
        members.join(groups.select("__h", "canonical"), "__h")
        .join(canon_to_comp, "canonical")
        .select(F.col("member").alias("vertex"), "component")
    )
    out = _pick_representatives(expanded, docs, score_col, key_col)
    return D._with_cached_deps(out, pairs, members, groups)
