"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def col_ref(name: str) -> Column:
    """Exact-name column reference: backtick-escape so a name with
    dots, spaces, or backticks resolves to THE column, not to a
    struct-field path (``F.col('meta.lang')`` parses as nested-field
    access) and not to a parse error.  The single definition of the
    escape previously copy-pasted per operator — new operators should
    import this; older modules migrate opportunistically (touching a
    kernel re-opens its driver-evidence window)."""
    return F.col("`" + name.replace("`", "``") + "`")


def md5_position(x: Column, seed: int, modulus: int) -> Column:
    """Seeded hash position in [0, modulus): int(md5(f"{seed}|" || x)
    [:8], 16) % modulus — exact integer ops both engines reproduce
    bit-for-bit (8 hex chars < 2^32, so no sign or overflow edge).
    The single definition of the seeded-position construction shared
    by the Bloom filter (`bloom._positions`) and the Count-Min sketch
    (`sketch._row_pos`); their DuckDB oracles replay it as
    ``('0x' || substr(md5(seed || '|' || x), 1, 8))::BIGINT % modulus``,
    so one divergent copy would silently desynchronize an operator
    from its oracle."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}|"), x)), 1, 8), 16, 10
        ).cast("long")
        % modulus
    )
