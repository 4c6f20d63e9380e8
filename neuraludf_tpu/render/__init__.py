from . import alpha, renderer, sampling  # noqa: F401
