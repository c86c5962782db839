from . import index  # noqa: F401
