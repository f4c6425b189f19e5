from .console import console  # noqa: F401
