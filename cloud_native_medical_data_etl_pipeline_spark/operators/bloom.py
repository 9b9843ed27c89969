"""Bloom-filter contamination gate: flag corpus documents whose
n-grams are (almost all) present in a benchmark/eval set — WITHOUT
joining the corpus against the eval grams.

The q60 `contamination` operator is the exact form: corpus grams
equi-join eval grams, cost ~|corpus grams| shuffled. This module is
the membership-SKETCH form a 100 TB pipeline runs first: the eval
set's gram positions pack into an m-bit Bloom filter — m/64 longs, a
few KB — which BROADCASTS, so the corpus-side check is one map-side
pass (gram -> k md5 positions -> bit probes) plus a single doc-keyed
count aggregate. No corpus-sized shuffle touches eval data at all.

False positives are the Bloom trade: a gram can hit when k positions
collide with other grams' bits (rate ~(1-e^{-kn/m})^k). Positions are
DETERMINISTIC md5 slices (the portable-hash convention every dedup
oracle here uses), so the DuckDB oracle reproduces the exact same
collisions: the driver check verifies Spark<->SQL consistency of the
sketch decision, including its false positives.

Extension beyond the reference (no sketch structures anywhere in the
pandas pipeline); the decomposition gate/exact mirrors
`contamination`'s role as the training-data hygiene pre-filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ._common import col_ref, md5_position

_SLOT_BITS = 64


def _positions(gram: Column, m: int, k: int) -> Column:
    """Array of the k Bloom bit positions for ``gram``: position_j =
    the shared seeded-position hash (`_common.md5_position`) with
    seed j and modulus m."""
    return F.array(*[md5_position(gram, j, m) for j in range(k)])


def _gram_frame(
    docs: DataFrame, content_col: str, key_col: str, n: int
) -> DataFrame:
    """(key, gram) rows — distinct n-grams per doc, the shared shingle
    convention (lowercased ASCII-whitespace tokens, space-joined)."""
    return docs.select(
        col_ref(key_col).alias("k"),
        F.explode(
            X.word_ngrams_from_tokens(X.lower_tokens(col_ref(content_col)), n)
        ).alias("gram"),
    )


def build_ngram_bloom(
    eval_docs: DataFrame,
    content_col: str = "text",
    n: int = 3,
    m: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """The packed Bloom filter of ``eval_docs``' n-grams: (slot, bits)
    rows, at most m/64 of them (a few KB for the default m=65536) —
    small enough to broadcast into the corpus-side probe however large
    the corpus is. Build cost is one distinct + one m/64-group
    aggregate over the EVAL set only."""
    grams = eval_docs.select(
        F.explode(
            X.word_ngrams_from_tokens(X.lower_tokens(col_ref(content_col)), n)
        ).alias("gram")
    ).distinct()
    pos = grams.select(
        F.explode(_positions(F.col("gram"), m, k)).alias("pos")
    ).distinct()
    return (
        pos.select(
            (F.col("pos") / _SLOT_BITS).cast("long").alias("slot"),
            (F.col("pos") % _SLOT_BITS).cast("int").alias("bit"),
        )
        .groupBy("slot")
        .agg(
            # shiftleft's bit-count arg must be a Column here, which
            # the classic-API wrapper rejects — SQL expr form instead
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits")
        )
    )


def bloom_contamination(
    docs: DataFrame,
    bloom: DataFrame,
    content_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    m: int = 1 << 16,
    k: int = 3,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Per-document contamination report against a
    :func:`build_ngram_bloom` filter: (key, n_grams, n_hit,
    contaminated) where a gram HITS iff all k of its positions are set
    and a doc is contaminated iff hit-fraction >= ``flag_threshold``.

    Plan shape: the (key, gram, position) explode is map-side; the
    position -> slot lookup is a BROADCAST hash join against the tiny
    filter (each of a gram's k positions md5-hashed exactly once, in
    codegen); per-gram hits partial-aggregate map-side before the one
    (key, gram)-keyed shuffle, and the doc rollup re-aggregates from
    those groups. Docs with no grams (fewer than n tokens) are kept
    with n_grams = 0 and contaminated = false.

    Measurement note (r6, with results FORCED via a full aggregate —
    a bare count() lets Catalyst eliminate the left-outer join against
    the unique-keyed hit frame and skip the md5 work entirely, which
    invalidated a first round of comparisons): this form and the
    shuffle-free alternative (packed filter inlined as a dense array
    literal, probe in a `size(filter(grams, g -> ...))` Project) tie
    at sf0.1 (~2.5 s for 4.75k docs) — the interpreted-lambda penalty
    of the HOF form roughly cancels the join+shuffle cost of this one.
    This form is kept because every expression stays inside
    whole-stage codegen, the shuffle volume (one narrow row per
    distinct (doc, gram)) matches what the MinHash band family already
    ships, and a literal-free plan avoids re-analyzing a 1024-element
    array literal per run. Measured: 2.38 s / 2.88 s / 11.24 s at
    4.75k / 47.5k / 475k docs — linear in gram volume, as designed.
    """
    probe = _gram_frame(docs, content_col, key_col, n).select(
        "k", "gram", F.posexplode(_positions(F.col("gram"), m, k))
    )
    hits = (
        probe.select(
            "k",
            "gram",
            (F.col("col") / _SLOT_BITS).cast("long").alias("slot"),
            (F.col("col") % _SLOT_BITS).cast("int").alias("bit"),
        )
        .join(F.broadcast(bloom), "slot", "left")
        .withColumn(
            "hit",
            F.coalesce(
                F.expr("shiftright(bits, bit)").bitwiseAND(1) == 1,
                F.lit(False),
            ),
        )
        .groupBy("k", "gram")
        .agg((F.count_if("hit") == k).alias("gram_hit"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count_if("gram_hit").cast("long").alias("n_hit"),
        )
    )
    return (
        docs.select(col_ref(key_col).alias("k"))
        .join(hits, "k", "left")
        .select(
            F.col("k").alias(key_col),
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0).cast("long")).alias("n_hit"),
            F.coalesce(
                F.col("n_hit") >= F.col("n_grams") * flag_threshold,
                F.lit(False),
            ).alias("contaminated"),
        )
    )
