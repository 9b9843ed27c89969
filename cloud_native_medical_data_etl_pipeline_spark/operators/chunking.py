"""Document chunking for pretraining: split each document's token
stream into fixed-width windows with a configurable stride (overlap),
the step between corpus curation and sequence packing.

Scale shape: pure per-row expression work — tokenize once, generate
window start offsets with ``sequence()``, slice+rejoin per offset, then
ONE ``posexplode``.  No shuffle at all until whatever consumes the
chunks aggregates them; row expansion is ``ceil(n_tokens/stride)`` per
doc, stated up front because the output row count, not the compute, is
what a 100 TB run must budget for.  Everything is JVM expression work
(whole-stage codegen), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def chunk_documents(
    df: DataFrame,
    content_col: str = "text",
    key_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Split documents into ``chunk_tokens``-token windows every
    ``stride`` tokens (default: no overlap, stride = chunk_tokens).

    Returns (key_col, chunk_id, chunk_text, n_tokens):
      * chunk_id — 0-based window index within the document;
      * chunk_text — the window's tokens re-joined with single spaces
        (tokenization is whitespace splitting, consistent with
        functions/text.py token_count);
      * n_tokens — window width; the LAST window may be short, and
        windows that would start at or past the end are not emitted.
    Documents with no tokens produce no rows.
    """
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    toks: Column = X.tokens(content_col)  # case-preserving whitespace split
    n = F.size(toks)
    # window starts: 1, 1+stride, ... (1-based for slice())
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.filter(
        F.transform(
            starts,
            lambda s: F.slice(toks, s, chunk_tokens),
        ),
        lambda c: F.size(c) > 0,
    )
    exploded = df.select(
        F.col(key_col),
        F.posexplode(chunks).alias("chunk_id", "__chunk"),
    )
    return exploded.select(
        key_col,
        "chunk_id",
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").alias("n_tokens"),
    )
