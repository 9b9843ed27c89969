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
jaccard 1.0 — including sub-ngram docs, which are signature-padded so
they shingle deterministically instead of bypassing the guard, see
`_pad_short_sig_source`).  So at-least-once delivery composes into an
exactly-once corpus without a sink transaction log — the
stream_to_lake_upsert argument, extended from key identity to content
identity.

Scale shape per batch: batch-sized signature work ONLY. The corpus
side of the near-dup probe reads the PERSISTED signature table at
``<corpus_path>_sigs`` (a `dedup.minhash_base` product maintained by
this module: survivors' signatures are appended right after the
corpus append), so per-batch md5/shingle cost tracks the batch, never
the corpus; candidates come from band equi-joins between the batch
signatures and the parquet-backed index; one corpus append + one
signature append per batch. A crash between the two appends leaves
signature rows missing for the just-appended docs — every batch
self-heals by signing any corpus keys absent from the index (normally
zero rows; gated by a metadata-only row-count compare, which is why
unsigned short docs still get PLACEHOLDER rows). The corpus store is
plain parquet here; swapping in a day-partitioned lake layout is
`sources.lake.write_partitioned` plumbing, not an algorithm change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D

# reserved pad token for sub-ngram documents: contains NUL, so no
# whitespace split of real text can ever produce it
_PAD_TOKEN = "\x00pad"


def _pad_short_sig_source(
    df: DataFrame, content_col: str, ngram_n: int
) -> DataFrame:
    """Signature-side view of ``df`` where documents with fewer than
    ``ngram_n`` ASCII-whitespace tokens are padded with `_PAD_TOKEN`
    up to exactly ``ngram_n`` tokens.

    Without this, sub-ngram docs produce no shingles, get placeholder
    index rows, and BYPASS the cross-batch content guard entirely — an
    exact redelivery of a short doc under a new key would be silently
    admitted, breaking the module's content-identity exactly-once
    contract.  Padded, every doc yields at least one deterministic
    shingle: identical short content collides at jaccard 1.0 (dropped),
    different short content shares no shingle with anything (pad tokens
    appear in no real text — they contain NUL).  The padding feeds ONLY
    signature computation; stored corpus rows keep the original text.
    The split mirrors `dedup._minhash_base_arrow`'s ASCII ``\\s+``."""
    c = F.col(content_col)
    deficit = F.lit(ngram_n) - F.size(F.split(c, r"\s+"))
    padded = F.concat_ws(
        " ", c, F.array_join(F.array_repeat(F.lit(_PAD_TOKEN), deficit), " ")
    )
    return df.withColumn(
        content_col, F.when(deficit > 0, padded).otherwise(c)
    )


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

    CONTRACT: ``key_col`` must be non-null.  A null-key row bypasses
    the KEY guard (the anti-join's SQL equality never matches NULL —
    the r16 asof/cdc/upsert finding), leaving only the CONTENT guard
    between a redelivery and a duplicate append: identical text still
    collides at jaccard 1.0, but a reworded near-miss under a null
    key rides on threshold luck.  Assign keys upstream
    (``F.xxhash64(content)`` at minimum) rather than stream null ids.

    Signature index: survivors' MinHash signatures land in
    ``<corpus_path>_sigs`` (schema = `dedup.minhash_base` output).
    Sub-ngram docs are signature-padded (`_pad_short_sig_source`) so
    they get REAL signature rows and the content guard covers them;
    the all-null placeholder machinery remains for indexes written
    before padding existed.  Index row count equals corpus row count
    either way, keeping the per-batch self-heal check metadata-only.
    """
    spark = batch.sparkSession
    sig_path = corpus_path.rstrip("/") + "_sigs"

    # 1. in-batch exact + near-dup collapse (keep the min-key copy).
    # The batch's signature base is computed ONCE and persisted: the
    # in-batch pair kernel, the corpus probe, and the index append all
    # read it.
    kept = D.exact_dedup(batch, content_col, key_col)
    batch_base = D.minhash_base(
        _pad_short_sig_source(kept, content_col, ngram_n),
        content_col=content_col,
        key_col=key_col,
        num_hashes=num_hashes,
        ngram_n=ngram_n,
    ).persist()
    pairs = D.minhash_lsh_pairs(
        kept,
        key_col=key_col,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        base=batch_base,
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
        # content guard: near-dups of stored content are dropped.
        # The corpus side comes from the persisted signature index —
        # self-healed first, so a crash between the corpus append and
        # the signature append of a prior batch cannot silently admit
        # near-dups of the unsigned rows.
        corpus_sigs = _heal_signature_index(
            spark, corpus, sig_path, content_col, key_col, num_hashes, ngram_n
        )
        matches = D.minhash_lsh_join(
            kept,
            None,
            key_col=key_col,
            num_hashes=num_hashes,
            bands=bands,
            jaccard_threshold=jaccard_threshold,
            probe_base=batch_base.join(
                kept.select(F.col(key_col).alias("k")), "k", "semi"
            ),
            corpus_base=corpus_sigs.where(F.size("sh") > 0),
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
    # survivors' signature rows (placeholders for unshingleable docs),
    # materialized before the cache release for the same reason
    new_sigs = _sig_rows_for(
        batch_base, kept.select(key_col), key_col
    ).localCheckpoint(eager=True)
    if matches is not None:
        D.release(matches)
    D.release(pairs)
    batch_base.unpersist()

    n = kept.count()
    if n:
        # corpus first, signatures second: replay recovers a missing
        # signature via the self-heal; the reverse order would let a
        # replayed row near-dup-match its OWN orphaned signature and
        # never reach the corpus
        kept.write.mode("append").parquet(corpus_path)
        new_sigs.write.mode("append").parquet(sig_path)
    return n


def _sig_rows_for(
    base: DataFrame, keys: DataFrame, key_col: str
) -> DataFrame:
    """Signature-index rows for every key in ``keys``: the base row
    when one exists, else an all-null PLACEHOLDER (sh = [], mh* null) —
    keeps index row count == corpus row count so the heal check is
    metadata-only. Placeholder rows never produce band candidates:
    exploding an empty sh contributes nothing and their concat_ws
    bucket rows are filtered out by the probe's size(sh) > 0 guard."""
    keyed = keys.select(F.col(key_col).alias("k"))
    present = base.join(keyed, "k", "semi")
    mh_cols = [c for c in base.columns if c.startswith("mh")]
    missing = keyed.join(base.select("k"), "k", "anti").select(
        "k",
        F.array().cast("array<string>").alias("sh"),
        *[F.lit(None).cast("string").alias(c) for c in mh_cols],
    )
    return present.unionByName(missing)


def _heal_signature_index(
    spark: SparkSession,
    corpus: DataFrame,
    sig_path: str,
    content_col: str,
    key_col: str,
    num_hashes: int,
    ngram_n: int,
) -> DataFrame:
    """Return the corpus signature index, first appending rows for any
    corpus keys it is missing (bootstrap of a pre-index corpus, or
    recovery from a crash between the corpus and signature appends).
    The no-drift fast path is a metadata-only row-count compare —
    placeholder rows keep the counts comparable."""
    from pyspark.errors import AnalysisException

    from ..sources.lake import _is_missing_data_error

    try:
        sigs = spark.read.parquet(sig_path)
        have_sigs = True
    except AnalysisException as exc:
        if not _is_missing_data_error(exc):
            raise
        have_sigs = False

    if have_sigs and sigs.count() == corpus.count():
        return sigs

    missing_docs = corpus
    if have_sigs:
        missing_docs = corpus.join(
            sigs.select(F.col("k").alias(key_col)), key_col, "anti"
        )
    missing_base = D.minhash_base(
        _pad_short_sig_source(missing_docs, content_col, ngram_n),
        content_col=content_col,
        key_col=key_col,
        num_hashes=num_hashes,
        ngram_n=ngram_n,
    )
    _sig_rows_for(
        missing_base, missing_docs.select(key_col), key_col
    ).write.mode("append").parquet(sig_path)
    return spark.read.parquet(sig_path)


def stream_dedup_ingest(
    spark: SparkSession,
    input_path: str,
    corpus_path: str,
    checkpoint: str,
    content_col: str = "text",
    key_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    ngram_n: int = 3,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``input_path`` (a directory of parquet document files, or
    a single ``.parquet`` file — split into (parent dir, glob filter)
    the way `sources.events_io.stream_events` does, since the file
    stream source only accepts directories) into the deduplicated
    corpus at ``corpus_path`` with an availableNow trigger — each
    micro-batch flows through :func:`ingest_batch`.

    ``max_files_per_trigger`` bounds the files per micro-batch (the
    file source's knob) — a multi-batch drain through the persisted
    signature index is property-tested equal to sequential
    :func:`ingest_batch` calls over the same file splits."""
    import os

    schema = spark.read.parquet(input_path).schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # signature params MUST pass through: draining into a corpus
        # whose _sigs index was built with non-default num_hashes/bands
        # would otherwise append rows with a different mh-lane schema,
        # silently breaking every later band probe
        ingest_batch(
            batch_df,
            corpus_path,
            content_col=content_col,
            key_col=key_col,
            jaccard_threshold=jaccard_threshold,
            num_hashes=num_hashes,
            bands=bands,
            ngram_n=ngram_n,
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
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
