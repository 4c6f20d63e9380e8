from . import interp  # noqa: F401
