"""Vector kernels over array<float|double> embedding columns.

Built on higher-order functions (zip_with + aggregate) so dot products
and norms run JVM-side without Python round-trips — the brute-force
path a 1000-executor cluster can actually scan with.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe-ish (0-norm -> null, like divide by
    zero under non-ANSI semantics)."""
    return dot(a, b) / (norm(a) * norm(b))


def normalize(a: Column | str) -> Column:
    """L2-normalize an embedding once up front so later cosine = dot —
    at scale, normalizing at ingest halves the per-pair cost.

    The norm rides through ``array_repeat`` (evaluated ONCE per row,
    then repeated) rather than being referenced inside the transform
    lambda — HOF lambdas re-evaluate their whole expression tree per
    element, which would make the O(d) norm aggregate O(d²) per row."""
    ca = F.col(a) if isinstance(a, str) else a
    n = norm(ca)
    return F.zip_with(
        ca,
        F.array_repeat(n, F.size(ca)),
        lambda v, m: v.cast("double") / m,
    )


def sqdist(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance, left-to-right fold over dimensions
    (F.aggregate is a deterministic in-order fold, so two engines that
    walk the array in index order sum in the same association)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            ca,
            cb,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
