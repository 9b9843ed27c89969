"""Corpus snapshot diff — the incremental-ingest primitive.

A training-data pipeline re-crawls / re-exports its sources on a
schedule; the first question against the new snapshot is "what
actually changed?" so that downstream work (re-embedding, re-dedup,
re-tokenization) touches only the delta, not the full 100 TB.

Scale shape: each side is reduced MAP-SIDE to ``(key, md5(content))``
— 8 + 32 bytes per row — before anything shuffles, so the full-outer
join on the key ships fingerprints, never documents.  One hash
shuffle total; the status column is a pure CASE expression on null
patterns of the joined hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns ``(key_col, status)`` with status in
    ``added`` (key only in ``new``), ``removed`` (key only in
    ``old``), ``changed`` (both, content hash differs), and — only
    when ``include_unchanged`` — ``unchanged``.

    NULL content hashes as the empty string, so NULL -> '' is
    "unchanged" by construction; callers that need to distinguish
    should carry an explicit presence flag in ``content_col``.
    """
    oldh = old.select(
        F.col(key_col).alias("__k"),
        F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("__ho"),
    )
    newh = new.select(
        F.col(key_col).alias("__k"),
        F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("__hn"),
    )
    joined = oldh.join(newh, on="__k", how="full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(F.col("__k").alias(key_col), status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out
