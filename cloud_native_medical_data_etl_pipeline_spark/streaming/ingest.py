"""Streaming corpus ingest with cross-batch near-duplicate gating —
the end-to-end shape a training-data pipeline actually runs: documents
arrive continuously, each micro-batch is deduplicated against ITSELF
and against everything already accepted, and only novel documents are
appended to the corpus store.

Composition (each piece individually oracle-verified elsewhere):

    exact_dedup            in-batch exact collapse (q03)
    minhash_lsh_pairs      in-batch near-dup collapse (q17's kernel)
    minhash_lsh_join       batch-vs-corpus near-dup probe (q86)
    append + key anti-join replay-safe accept

Exactly-once reasoning: foreachBatch + checkpoint makes batch REPLAY
the failure mode (a batch can run twice, never half).  Replay is a
no-op through two independent guards — the key anti-join drops rows
whose doc_id is already stored, and the near-dup probe drops rows
whose content near-duplicates stored content (an exact redelivery has
jaccard 1.0).  So at-least-once delivery composes into an
exactly-once corpus without a sink transaction log — the
stream_to_lake_upsert argument, extended from key identity to content
identity.

Scale shape per batch: batch-sized signature work (the corpus side of
the probe recomputes signatures from the stored parquet — at real
scale you persist the corpus signature table once and band-join the
delta against it, which is exactly what minhash_lsh_join's contract
allows), candidates from band equi-joins only, and one append write.
The corpus store is plain parquet here; swapping in a day-partitioned
lake layout is `sources.lake.write_partitioned` plumbing, not an
algorithm change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D


def ingest_batch(
    batch: DataFrame,
    corpus_path: str,
    content_col: str = "text",
    key_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    ngram_n: int = 3,
) -> int:
    """Accept one batch of documents into the corpus at
    ``corpus_path``; returns the number of rows appended.  Idempotent:
    re-running the same batch appends nothing.
    """
    spark = batch.sparkSession

    # 1. in-batch exact + near-dup collapse (keep the min-key copy)
    kept = D.exact_dedup(batch, content_col, key_col)
    pairs = D.minhash_lsh_pairs(
        kept,
        content_col=content_col,
        key_col=key_col,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        ngram_n=ngram_n,
    )
    losers = pairs.select(F.col("key_b").alias(key_col)).dropDuplicates()
    kept = kept.join(losers, key_col, "left_anti")

    # 2. gate against the stored corpus (if any).  Only the
    # path-not-found class means "first batch, no corpus yet" — any
    # other read failure must raise, or a transient FS error would
    # silently disable the dedup gate and admit duplicates
    # (the upsert_partition lesson, sources/lake.py — same marker
    # discrimination, AnalysisException alone is too broad: schema
    # inference on a half-written directory raises it too).
    from pyspark.errors import AnalysisException

    from ..sources.lake import _is_missing_data_error

    try:
        corpus = spark.read.parquet(corpus_path)
        have_corpus = True
    except AnalysisException as exc:
        if not _is_missing_data_error(exc):
            raise
        have_corpus = False
    if have_corpus:
        # key guard: a replayed row's id is already stored
        kept = kept.join(
            corpus.select(key_col), key_col, "left_anti"
        )
        # content guard: near-dups of stored content are dropped
        matches = D.minhash_lsh_join(
            kept,
            corpus,
            content_col=content_col,
            key_col=key_col,
            num_hashes=num_hashes,
            bands=bands,
            jaccard_threshold=jaccard_threshold,
            ngram_n=ngram_n,
        )
        dup_keys = matches.select(
            F.col("probe_key").alias(key_col)
        ).dropDuplicates()
        kept = kept.join(dup_keys, key_col, "left_anti")
    else:
        matches = None
    # materialize survivors BEFORE releasing the caches the lazy plan
    # still reads (release()'s consume-then-release contract) and
    # BEFORE the append extends the directory the plan still scans
    kept = kept.localCheckpoint(eager=True)
    if matches is not None:
        D.release(matches)
    D.release(pairs)

    n = kept.count()
    if n:
        kept.write.mode("append").parquet(corpus_path)
    return n


def stream_dedup_ingest(
    spark: SparkSession,
    input_path: str,
    corpus_path: str,
    checkpoint: str,
    content_col: str = "text",
    key_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
) -> None:
    """Drain ``input_path`` (a directory of parquet document files, or
    a single ``.parquet`` file — split into (parent dir, glob filter)
    the way `sources.events_io.stream_events` does, since the file
    stream source only accepts directories) into the deduplicated
    corpus at ``corpus_path`` with an availableNow trigger — each
    micro-batch flows through :func:`ingest_batch`."""
    import os

    schema = spark.read.parquet(input_path).schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df,
            corpus_path,
            content_col=content_col,
            key_col=key_col,
            jaccard_threshold=jaccard_threshold,
        )

    reader = spark.readStream.schema(schema)
    if input_path.endswith(".parquet") and not os.path.isdir(input_path):
        reader = reader.option(
            "pathGlobFilter", os.path.basename(input_path)
        )
        input_path = os.path.dirname(input_path)

    q = (
        reader.parquet(input_path)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
