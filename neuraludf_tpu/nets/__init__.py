from . import embedder, fields, mlp  # noqa: F401
