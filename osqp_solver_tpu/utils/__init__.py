from . import checkpoint, observability, oracle, types  # noqa: F401
