from . import lake, rest  # noqa: F401
