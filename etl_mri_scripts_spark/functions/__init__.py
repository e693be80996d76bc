from .registry import register_all  # noqa: F401
