"""Persistent XLA compilation cache.

The TPU-tunnel backend in this environment compiles large modules slowly
(minutes for the full train step). Enabling jax's persistent compilation
cache makes every run after the first start in seconds. Called by bench.py,
the graft entry points and the Trainer.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str:
    global _enabled
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    # CPU AOT cache entries are machine-feature-sensitive and can SIGILL when
    # reloaded under different flags; the cache only pays off for the slow
    # TPU remote compiles anyway.
    if jax.default_backend() != "tpu":
        return path
    if not _enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        try:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except AttributeError:  # older jax
            pass
        _enabled = True
    return path
