from .jax_setup import setup_jax  # noqa: F401
