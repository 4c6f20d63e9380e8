from .sharding import build_parallel_train_step, make_mesh  # noqa: F401
