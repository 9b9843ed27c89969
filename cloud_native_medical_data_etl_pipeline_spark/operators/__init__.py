from . import dedup, enrich, quality, similarity, transforms  # noqa: F401
