from . import binding  # noqa: F401
