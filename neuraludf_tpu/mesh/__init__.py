from . import grid, mc, ply  # noqa: F401
