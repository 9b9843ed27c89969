"""Count-based language-model scoring and lexical corpus statistics —
the distributed skeleton of perplexity-based corpus filtering (score
each document by how "surprising" its tokens are under a corpus-wide
unigram or bigram model; drop the tails) plus the type/token health
metrics that gate a corpus before training.

Scale shape, two aggregation passes over narrow columns:
  1. model build: explode tokens -> (token, count) aggregation — one
     shuffle keyed by token, partial map-side combine, top-``vocab``
     truncation via TakeOrdered (never a global sort);
  2. scoring: explode tokens -> equi-join with the vocab (a top-V
     table, explicitly ``broadcast()`` — V is a knob, not the corpus)
     -> per-doc mean of -log2 p(token), one shuffle keyed by doc.
Out-of-vocabulary tokens score with a floor probability (add-one on
the truncated tail), so rare-token gibberish scores HIGH (bad) and
stopword-y text scores LOW — the standard filtering direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def build_unigram_model(
    df: DataFrame,
    content_col: str = "text",
    vocab: int = 50_000,
) -> DataFrame:
    """(token, p) for the ``vocab`` most frequent whitespace tokens
    (lowercased), p = count / total_tokens over the WHOLE corpus
    (computed before truncation, so probabilities are true corpus
    frequencies, not renormalized top-V ones). Ties at the cutoff
    break lexicographically for determinism."""
    toks = df.select(
        F.explode(X.lower_tokens(content_col)).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(vocab)
    return top.crossJoin(F.broadcast(total)).select(
        "token", (F.col("cnt") / F.col("total")).alias("p")
    )


def unigram_logprob_score(
    df: DataFrame,
    model: DataFrame | None = None,
    content_col: str = "text",
    key_col: str = "doc_id",
    vocab: int = 50_000,
    oov_p: float = 1e-7,
    round_dp: int = 6,
) -> DataFrame:
    """Per-document mean negative log2 unigram probability.

    Returns (key_col, n_scored, bits_per_token): lower = more typical
    of the corpus. ``model`` defaults to one built from ``df`` itself
    (self-scoring, the usual filtering setup); pass a model built from
    a trusted reference corpus to score an incoming crawl against it.
    Documents with no tokens are omitted.
    """
    if model is None:
        model = build_unigram_model(df, content_col, vocab)

    toks = df.select(
        F.col(key_col),
        F.explode(X.lower_tokens(content_col)).alias("token"),
    )
    scored = toks.join(F.broadcast(model), "token", "left").select(
        key_col,
        (-F.log2(F.coalesce(F.col("p"), F.lit(float(oov_p))))).alias("bits"),
    )
    return scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.round(F.avg("bits"), round_dp).alias("bits_per_token"),
    )


def _bigram_pairs(df: DataFrame, content_col: str, key_col: str) -> DataFrame:
    """(key, w1, w2) for each consecutive token pair — built map-side
    from two array slices zipped per row (no positional self-join, no
    shuffle). Docs with <2 tokens emit nothing."""
    tk = X.lower_tokens(content_col)
    n = F.size(tk)
    pairs = F.zip_with(
        F.slice(tk, F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice(tk, F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return df.select(F.col(key_col), F.explode(pairs).alias("b")).select(
        key_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )


def bigram_logprob_score(
    df: DataFrame,
    content_col: str = "text",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    min_count: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """Per-document bigram-LM surprisal — the conditional-probability
    upgrade of `unigram_logprob_score` (the CCNet-style perplexity
    filter: score docs under an n-gram model of the corpus, drop the
    high-surprisal tail).

    p(w2|w1) = (C(w1,w2) + alpha) / (C(w1) + alpha·V), add-alpha
    smoothing over the exact corpus vocabulary V; unseen bigrams and
    unseen histories fall out of the same formula with C = 0 (an
    unseen history scores exactly 1/V per continuation). Returns
    (key_col, n_bigrams, bits_per_bigram); docs with fewer than two
    tokens are omitted.

    Scale shape: bigram extraction is map-side (two array slices
    zipped — no positional self-join); the model is corpus-sized, so
    scoring joins are SHUFFLE equi-joins on (w1, w2) and w1 — neither
    side broadcasts. `min_count` prunes singleton bigrams from the
    model (they then score as unseen), which at 100 TB bounds the
    model table by the non-hapax bigram vocabulary — the standard
    memory/size lever for count-based LMs.
    """
    # pairs feeds BOTH the model aggregate and the scoring join, and
    # uni feeds the |V| count and the history join — unpersisted, each
    # consumption would replay the corpus tokenize/explode (the
    # dominant cost), ~4x the work.  Caller-unpersists contract:
    # consume the result, then dedup.release(result).
    pairs = _bigram_pairs(df, content_col, key_col).persist()
    uni = (
        df.select(F.explode(X.lower_tokens(content_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cu"))
        .persist()
    )
    vocab_size = uni.count()  # exact |V|: one aggregate, a scalar
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    if min_count > 1:
        bg = bg.where(F.col("cb") >= min_count)
    a = float(alpha)
    scored = (
        pairs.join(bg, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("token", "w1"), "w1", "left")
        .select(
            key_col,
            (
                -F.log2(
                    (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(a))
                    / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(a * vocab_size))
                )
            ).alias("bits"),
        )
    )
    from .dedup import _with_cached_deps

    return _with_cached_deps(
        scored.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("bits"), round_dp).alias("bits_per_bigram"),
        ),
        pairs,
        uni,
    )


def lexical_diversity(
    df: DataFrame,
    content_col: str = "text",
    group_col: str = "source",
    round_dp: int = 6,
) -> DataFrame:
    """Per-group lexical diversity: exact token/type counts,
    type-token ratio, and hapax ratio (share of types seen once) —
    the corpus-health numbers that catch template spam (TTR collapses)
    and OCR noise (hapax ratio explodes) before training.

    Returns (group_col, n_tokens, n_types, type_token_ratio,
    hapax_ratio). Groups whose documents have no tokens are omitted.

    Scale shape: exact distincts WITHOUT count_distinct's expand —
    one (group, token)-keyed counting aggregate (map-side combinable)
    then one group-keyed rollup of that already-distinct frame; the
    shuffle carries (group, token, count), never documents.
    """
    per_tok = (
        df.select(
            F.col(group_col),
            F.explode(X.lower_tokens(content_col)).alias("token"),
        )
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_tok.groupBy(group_col).agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("cnt"), round_dp).alias(
            "type_token_ratio"
        ),
        F.round(
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            round_dp,
        ).alias("hapax_ratio"),
    )


def char_entropy(
    df: DataFrame,
    content_col: str = "text",
    key_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    """Per-document character-distribution Shannon entropy (bits) —
    the classic gibberish/encoding-noise detector: natural text sits
    in a narrow entropy band, base64 blobs and mojibake score high,
    template spam scores low. Complements `lexical_diversity` (token
    level) and `functions.text` repetition (span level).

    Returns (key_col, n_chars, char_entropy); empty/NULL docs are
    omitted (entropy of nothing is undefined, not 0).

    Scale shape: one explode to (doc, char) with map-side partial
    aggregation — the shuffle carries at most |docs| x |charset|
    triples (charset ~100 for text), NOT one row per character; the
    entropy reduction is a second doc-keyed aggregate over those
    triples.
    """
    per_char = (
        df.select(
            F.col(key_col),
            F.explode(F.split(F.coalesce(F.col(content_col), F.lit("")), "")).alias(
                "ch"
            ),
        )
        .where(F.col("ch") != "")
        .groupBy(key_col, "ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = per_char.groupBy(key_col).agg(F.sum("cnt").alias("n"))
    return (
        per_char.join(totals, key_col)
        .groupBy(key_col)
        .agg(
            F.max("n").cast("bigint").alias("n_chars"),
            F.round(
                -F.sum(
                    (F.col("cnt") / F.col("n"))
                    * F.log2(F.col("cnt") / F.col("n"))
                ),
                round_dp,
            ).alias("char_entropy"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    vocab: int = 50_000,
    content_col: str = "text",
    group_col: str = "source",
    round_dp: int = 6,
) -> DataFrame:
    """Tokenizer-fit check: per-group out-of-vocabulary rate against
    the corpus's own top-``vocab`` token list — the number that says
    whether a fixed vocabulary (or a tokenizer trained on one slice)
    actually covers each source before committing to it. A source
    whose OOV rate is an outlier will fragment into subwords and
    effectively get a worse compression ratio than its mixture weight
    assumes.

    Returns (group_col, n_tokens, oov_tokens, oov_rate).

    Scale shape: the vocab is a top-V TakeOrdered over one token-keyed
    counting shuffle (the q66 model-build shape, ties broken
    lexicographically); coverage is one (group, token) counting
    aggregate LEFT-joined to the broadcast vocab, rolled up to
    |groups| rows.
    """
    counts = (
        df.select(F.explode(X.lower_tokens(content_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(vocab).select("token")
    per = (
        df.select(
            F.col(group_col),
            F.explode(X.lower_tokens(content_col)).alias("token"),
        )
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(top.withColumn("__in", F.lit(1))), "token", "left")
    )
    return per.groupBy(group_col).agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("oov_tokens"),
        F.round(
            F.sum(F.when(F.col("__in").isNull(), F.col("n")).otherwise(0))
            / F.sum("n"),
            round_dp,
        ).alias("oov_rate"),
    )
