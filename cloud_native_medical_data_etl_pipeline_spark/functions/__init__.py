from . import medical, text, vectors  # noqa: F401
