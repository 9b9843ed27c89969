"""BM25 relevance scoring over the documents table — the retrieval
primitive an LLM data pipeline uses for quality-targeted selection
(rank a crawl against a reference query / seed set) and for building
retrieval eval sets.

Scale shape (the whole point of the formulation):
  * per-document term frequencies come from array expressions over the
    tokenized text — for a query of m terms that is m `filter` counts
    per row, entirely map-side, NO explode of the token stream and no
    (doc, term) shuffle;
  * the corpus statistics BM25 needs (N, avgdl, per-term document
    frequencies) aggregate to ONE row, which joins back by broadcast —
    a BroadcastNestedLoopJoin of a single row, not a shuffle;
  * scoring is a fixed arithmetic expression per row, and top-k is
    TakeOrdered (per-partition heap), never a global sort.
So the plan is: one scan -> one 1-row aggregate -> map-side score ->
heap top-k, unchanged at 100 TB. The classic inverted-index
formulation (explode to (term, doc) postings) only wins when queries
vastly outnumber corpus passes; for pipeline-style "score the whole
corpus once" workloads the map-side form moves no data at all.

Determinism / oracle notes: tf and dl are integer-valued doubles, so
the one cross-partition aggregate (sums of integers + one division)
is exact regardless of partition order; ln() may differ by an ulp
between JVM and C libm, absorbed by round-to-6dp (the engine-parity
budget every float query here carries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    content_col: str = "text",
    key_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
) -> DataFrame:
    """Per-document BM25 score against a bag of query ``terms``.
    Returns (key_col, bm25) for every document (score 0.0 when no term
    matches).

    idf uses the standard +1 smoothing, ln(1 + (N - df + 0.5)/(df + 0.5)),
    so scores stay non-negative even for terms in most documents.
    """
    if not terms:
        raise ValueError("bm25_scores: empty query term list")
    toks = X.lower_tokens(content_col)

    def tf_col(term: str):
        # closure factory: F.filter lambdas must be one-arg, and the
        # loop variable must bind per-term (repo gotcha — a two-arg
        # lambda would receive (element, index))
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    from pyspark import StorageLevel

    from .dedup import _with_cached_deps

    # per_doc feeds BOTH the one-row stats aggregate and the scored
    # projection; without a persist the tokenize + m filter-count
    # kernel (the CPU-dominant work) would re-evaluate for each — the
    # same lineage re-evaluation tfidf_top_terms engineers around.
    # The cached frame is narrow (key + m+1 doubles, spillable) and is
    # freed via the dedup.release() caller-unpersists contract.
    per_doc = df.select(
        F.col(key_col),
        F.size(toks).cast("double").alias("__dl"),
        *[tf_col(t).cast("double").alias(f"__tf{i}") for i, t in enumerate(terms)],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("double")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / norm
    return _with_cached_deps(
        scored.select(F.col(key_col), F.round(score, round_dp).alias("bm25")),
        per_doc,
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    content_col: str = "text",
    key_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 — orderBy on the ROUNDED score with a
    key tie-break, so the boundary of the k-set is engine-stable."""
    from .dedup import _with_cached_deps

    scored = bm25_scores(df, terms, content_col, key_col, k1, b)
    return _with_cached_deps(
        scored.orderBy(F.col("bm25").desc(), F.col(key_col).asc()).limit(k),
        scored,
    )


def tfidf_top_terms(
    df: DataFrame,
    content_col: str = "text",
    key_col: str = "doc_id",
    top_n: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Per-document top-``top_n`` terms by TF-IDF — the keyword-
    extraction primitive (document labeling, topic seeding, near-dup
    explanation) that complements bm25_scores' query-side ranking.

    tf is the term's count within the document; idf = ln(N / df_t)
    with N = total input rows and df_t = number of documents containing
    the term (no smoothing — corpus-wide terms score exactly 0).
    Returns (key_col, term, tfidf, rank) with rank 1..top_n assigned by
    (tfidf DESC, term ASC) — rounding BEFORE ranking keeps the order,
    and therefore the emitted rows, engine-stable.

    Scale shape: one explode to (doc, term), ONE (doc, term) shuffle
    for tf, then document frequencies come from a term-keyed COUNT
    window over the tf rows (distinct (doc, term) by construction) —
    in-stream, so the corpus is scanned and exploded exactly ONCE (an
    aggregate-and-join-back formulation re-evaluates the tf lineage
    for the df side); N joins back as a one-row broadcast; ranking is
    one doc-keyed window. The (doc, term) explode is the posting-list
    pass bm25 avoids — here it IS the workload, since every document
    needs its own per-term scores.
    """
    from pyspark.sql import Window

    toks = X.lower_tokens(content_col)
    pairs = df.select(F.col(key_col), F.explode(toks).alias("term"))
    tf = pairs.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("__tf"))
    dfw = Window.partitionBy("term")
    ndocs = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    scored = (
        tf.withColumn("__df", F.count(F.lit(1)).over(dfw))
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("__tf") * F.log(F.col("__n") / F.col("__df")), round_dp
            ),
        )
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(key_col, "term", "tfidf", "rank")
    )


# the term index's on-disk schema, declared at every read: the bucket
# is a 2-hex-char STRING partition value, and Spark's partition-value
# type inference parses Java-numeric-looking strings — including hex
# like "8f" (Double.parseDouble accepts the f/d float suffixes, so
# "8f" becomes 8.0!) — whenever EVERY bucket directory in the index
# happens to look numeric.  A small corpus can hit that (caught by the
# indexed-vs-direct hypothesis fuzz at 2 docs: buckets {73, 98, 8f}
# all parsed, the pruned read matched nothing); big corpora only
# escape because some bucket contains a non-numeric hex pair.  A
# user-provided schema bypasses inference entirely.
TERM_INDEX_SCHEMA = "term string, doc long, dl double, tf long, bucket string"


def read_term_index(spark, path: str) -> DataFrame:
    """Read a build_term_index table with the declared schema — ALWAYS
    use this (or pass the schema yourself) instead of a bare
    spark.read.parquet: see TERM_INDEX_SCHEMA on why inference
    corrupts hex bucket values on small indexes."""
    return spark.read.schema(TERM_INDEX_SCHEMA).parquet(path)


def build_term_index(
    df: DataFrame,
    path: str,
    content_col: str = "text",
    key_col: str = "doc_id",
) -> None:
    """Materialize an inverted term index: posting rows
    (term, doc, tf, dl) written as parquet partitioned by a 2-hex-char
    md5 bucket of the term (256 partitions).

    This is the many-queries scale shape of bm25_scores: that operator
    re-scans the corpus per query bag (right when the corpus is read
    once anyway); an index pays the explode ONCE at build time, and
    every query reads only its terms' bucket directories — term
    selectivity becomes Catalyst PARTITION PRUNING, zero bytes from
    unprobed buckets. The bucket is md5-derived so the query side can
    compute it in plain Python (hashlib) without a Spark job; a term's
    postings live entirely in its own bucket, so per-term document
    frequencies aggregate correctly from pruned reads. Corpus-level
    stats (N, avgdl) ride along in an underscore-prefixed side
    directory that Spark's file listing ignores.

    PERMANENT CONTRACT: ``key_col`` must be an integral type — the
    index stores ``doc long`` per the fixed TERM_INDEX_SCHEMA, and
    every reader pins that schema (schema inference is what corrupted
    hex bucket values; see read_term_index). Deriving the stored type
    from the input frame was considered and rejected: a variable
    schema would have to be persisted in the sidecar and threaded
    through every reader, re-opening the inference bug class this
    layout closed. String document ids pre-map to long before
    indexing — ``F.xxhash64(id_col)`` when ids only need to be stable
    and distinct, or a window/``zipWithIndex``-style dense mapping
    when they must round-trip.
    """
    # TERM_INDEX_SCHEMA declares `doc long`, and every read goes
    # through it (inference-bypass contract) — so a non-long key would
    # come back as nulls/cast failures, INCLUDING in this function's
    # own stats pass below.  Refuse up front rather than corrupt.
    key_type = df.schema[key_col].dataType
    if not isinstance(key_type, (T.LongType, T.IntegerType,
                                 T.ShortType, T.ByteType)):
        raise ValueError(
            f"build_term_index: key_col {key_col!r} must be an integral "
            f"type (stored as `doc long` per TERM_INDEX_SCHEMA), got "
            f"{key_type.simpleString()}"
        )
    toks = X.lower_tokens(content_col)
    base = df.select(
        F.col(key_col).cast("long").alias("doc"),
        F.size(toks).cast("double").alias("dl"),
        F.explode(toks).alias("term"),
    )
    postings = (
        base.groupBy("term", "doc", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("bucket", F.substring(F.md5("term"), 1, 2))
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
    # stats from the JUST-WRITTEN postings, not a second tokenize pass:
    # distinct (doc, dl) covers every non-empty doc; empty docs
    # contribute dl=0 to the average, so avgdl = sum(dl)/N with N from
    # a cheap column-less count of the input
    written = read_term_index(df.sparkSession, path)
    sum_dl = written.select("doc", "dl").dropDuplicates().agg(
        F.coalesce(F.sum("dl"), F.lit(0.0)).alias("__sumdl")
    )
    stats = (
        df.agg(F.count(F.lit(1)).cast("double").alias("n"))
        .crossJoin(sum_dl)
        .select("n", (F.col("__sumdl") / F.col("n")).alias("avgdl"))
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/_corpus_stats")


def bm25_topk_indexed(
    spark,
    path: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
) -> DataFrame:
    """Query a build_term_index table: prune to the query terms' md5
    buckets (computed driver-side with hashlib — no Spark job), read
    only those partitions, aggregate per-term document frequencies from
    the pruned postings, and score sum-of-term-contributions per doc.

    Returns (doc, bm25) top-k by (rounded score desc, doc asc). Only
    documents matching at least one term can appear — identical to
    bm25_topk's ranking whenever k does not exceed the matched-doc
    count, since zero-score rows can never enter a positive top-k.

    The per-doc score is summed in FIXED term order (one conditional
    aggregate per query term, then a left-to-right add chain), not via
    a bag sum over the posting rows: a doc's postings live in
    different bucket partitions, so ``sum(contrib)`` would combine
    partials in shuffle-fetch order — nondeterministic in the last
    ulp, which a rounded-score hash oracle (q141) cannot tolerate.
    The fixed chain reproduces bm25_scores'/the SQL oracle's
    ``c0 + c1 + ...`` expression exactly (an unmatched term
    contributes exactly +0.0 there, matched by the coalesce).  Cost is
    |terms| conditional sums instead of one — still a single doc-keyed
    shuffle over posting-volume rows.
    """
    import hashlib
    from functools import reduce

    if not terms:
        raise ValueError("bm25_topk_indexed: empty query term list")
    buckets = sorted(
        {hashlib.md5(t.encode()).hexdigest()[:2] for t in terms}
    )
    post = (
        read_term_index(spark, path)
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(terms))
    )
    stats = spark.read.parquet(f"{path}/_corpus_stats")
    dfreq = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    per_term = [
        F.sum(F.when(F.col("term") == F.lit(t), contrib)).alias(f"__c{i}")
        for i, t in enumerate(terms)
    ]
    score = reduce(
        lambda x, y: x + y,
        [F.coalesce(F.col(f"__c{i}"), F.lit(0.0)) for i in range(len(terms))],
    )
    return (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc")
        .agg(*per_term)
        .select("doc", F.round(score, round_dp).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc").asc())
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    query_cols: tuple[str, ...] = (),
    rrf_k: int = 60,
    top: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N retriever result lists — the
    standard hybrid-retrieval combiner (Cormack et al. SIGIR'09;
    lexical BM25 + dense ANN is the shape every RAG pipeline runs):
    ``score(d) = sum over lists of 1 / (rrf_k + rank_d)``.  Rank-based
    fusion needs no score calibration between retrievers, which is
    exactly why it wins over weighted score sums across heterogeneous
    scorers.

    Each input frame carries ``(*query_cols, doc_col, rank_col)`` with
    rank 1-based within its (query, list).  Returns
    ``(*query_cols, doc_col, rrf)`` — the top ``top`` per query by
    (rounded rrf DESC, doc key ASC), rounding before ranking so the
    cut is engine-stable.

    Scale shape: result lists are top-k-sized (k rows per query per
    retriever), so the union + one grouped sum + per-query top window
    all operate on retriever OUTPUT volume, never corpus volume — the
    fusion stage is free compared to the retrievers feeding it.
    """
    from functools import reduce

    from pyspark.sql import Window

    parts = [
        r.select(*query_cols, F.col(doc_col), F.col(rank_col))
        for r in rankings
    ]
    u = reduce(lambda x, y: x.unionByName(y), parts)
    scored = u.groupBy(*query_cols, doc_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col))),
            round_dp,
        ).alias("rrf")
    )
    if query_cols:
        w = Window.partitionBy(*query_cols).orderBy(
            F.col("rrf").desc(), F.col(doc_col).asc()
        )
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= top)
            .drop("__rn")
        )
    return scored.orderBy(F.col("rrf").desc(), F.col(doc_col).asc()).limit(
        top
    )
