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
