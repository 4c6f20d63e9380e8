"""JAX runtime setup: persistent compilation cache + profiler hooks.

TPU compiles of the fused train step take O(minutes) on remote-compile
tunnels; the persistent cache makes every process after the first start in
seconds. Enabled by default under ./.jax_cache (override with
NEURALUDF_JAX_CACHE, disable with NEURALUDF_JAX_CACHE=0).
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    env = os.environ.get("NEURALUDF_JAX_CACHE", "")
    if env == "0":
        return
    cache_dir = cache_dir or env or os.path.join(os.getcwd(), ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # cache regardless of compile-time heuristics on explicit request
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax or read-only fs: run without the cache
        pass


def start_profiler_server(port: int = 9999) -> None:
    """Expose a jax.profiler endpoint (tensorboard-profile compatible)."""
    import jax

    jax.profiler.start_server(port)


def trace(log_dir: str):
    """Context manager: capture a profiler trace into log_dir."""
    import jax

    return jax.profiler.trace(log_dir, create_perfetto_link=False)
