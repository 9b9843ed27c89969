"""Unigram language-model quality scoring — the distributed skeleton
of perplexity-based corpus filtering (score each document by how
"surprising" its tokens are under a corpus-wide unigram model; drop
the tails).

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
