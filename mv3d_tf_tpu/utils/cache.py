"""Persistent XLA compilation-cache setup shared by every entry point.

Big jitted programs cost minutes to compile cold (on the 1-core CI host
and over the axon tunnel alike); the persistent cache makes re-runs
near-instant. One helper so the cache directory is derived portably
(env override > ~/.cache) instead of hardcoded per tool.
"""

import os


def enable_compile_cache(min_compile_secs: float = 2.0) -> None:
    """Best-effort: point JAX at a persistent compilation cache.

    The directory comes from $MV3D_JAX_CACHE_DIR if set, else
    ~/.cache/jax_comp_cache. Failures (read-only home, old JAX) are
    swallowed — the cache is an optimization, never a requirement.
    """
    import jax

    cache_dir = os.environ.get(
        "MV3D_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
