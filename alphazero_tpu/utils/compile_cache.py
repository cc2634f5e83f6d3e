"""Persistent XLA compilation cache.

The reference pays a one-time numba JIT cost per process
(/root/reference/main.py imports build jitclasses in seconds, cached by
numba's on-disk cache via @njit(cache=True)).  Our analog is XLA's
persistent compilation cache: staged recipes (scripts/splendor_recipe_r4.sh)
run each stage as a fresh process, and tunnel compiles cost minutes — the
cache turns every re-compile of an unchanged program shape into a disk read.

Fails soft: backends that cannot serialize executables just log a warning
and compile normally.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory.

    Env override: AZTPU_COMPILE_CACHE (set to '0' to disable).
    """
    env = os.environ.get("AZTPU_COMPILE_CACHE")
    if env == "0":
        return ""
    path = env or path or os.path.expanduser("~/.cache/alphazero_tpu_xla")
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program (default skips sub-second compiles; tunnel
        # round-trips make even small programs worth caching)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except OSError as e:       # read-only HOME (CI sandbox): compile normally
        import warnings
        warnings.warn(f"persistent compile cache disabled ({e})")
        return ""
    return path
