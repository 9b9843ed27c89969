"""Shared deterministic hash-sampling predicate.

The engine's "train on a sample, apply to everything" levers
(`classifier.quality_classifier_scores(train_sample_mod=...)`,
`quantize.pq_train(train_sample_mod=...)`, and
`quantize.build_ivfpq_index` via passthrough) all select the SAME
1/mod row subset: keep a row iff its md5-hex-prefix uniform — the
engine's engine-stable random (`curate.weighted_sample` /
`mix_corpora` trick) — lands in residue class 0 mod ``mod``.  A pure
function of the key: reproducible across partition layouts, re-runs,
and engines (DuckDB spells it
``('0x' || substr(md5(key), 1, 8))::BIGINT % mod = 0``), unlike
seeded rand() or engine-specific hashes.  One helper so the contract
cannot drift per kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic per-key uniform in (0, 1]: (first 8 hex digits of
    md5(salt || key) + 1) / 2^32 — the engine-stable random used by
    `curate.weighted_sample` (Efraimidis-Spirakis priorities) and
    `quantize._kmeanspp_seed_books` (D² seeding races).  Salting keeps
    independent sampling streams independent; the +1 keeps u strictly
    positive so pow(u, 1/w) never hits 0**inf.  One definition so the
    construction cannot drift per kernel (DuckDB spells it
    ``(('0x' || substr(md5(salt || key), 1, 8))::BIGINT + 1) / 2^32``).
    """
    s = key.cast("string")
    h = F.md5(F.concat(F.lit(salt), s)) if salt else F.md5(s)
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(4294967296.0)


def hash_sample_predicate(key: Column, mod: int) -> Column:
    """Boolean column: this row belongs to the deterministic 1/mod
    md5-hash-sample keyed on ``key``."""
    if mod < 1:
        raise ValueError(f"sample mod must be >= 1, got {mod}")
    return (
        F.conv(
            F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
        ).cast("long")
        % mod
        == 0
    )


def hash_sample(df: DataFrame, key_col: str, mod: int) -> DataFrame:
    """The 1/mod md5-hash-sample of ``df``.  mod=1 keeps every row."""
    if mod == 1:
        return df
    return df.where(hash_sample_predicate(F.col(key_col), mod))
