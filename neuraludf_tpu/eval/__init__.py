from .chamfer import eval_mesh  # noqa: F401
