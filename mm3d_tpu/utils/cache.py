"""Persistent XLA compilation cache.

TPU compiles on this host go through a remote-compile tunnel and cost
minutes for training graphs; the persistent cache makes every subsequent
process start warm.  Called by all CLI entry points and bench.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    import jax

    if path is None:
        try:
            current = jax.config.jax_compilation_cache_dir
        except AttributeError:  # pragma: no cover - very old jax
            current = None
        if current:
            # already configured (e.g. tests/conftest points the whole
            # suite at the CPU cache dir): keep it.  Re-pointing mid-
            # process would split the cache across two dirs and turn
            # every previously-cached executable into a miss (measured
            # as CLI tests re-compiling graphs the suite already built)
            return current
    path = path or os.environ.get(
        "MM3D_COMPILE_CACHE", os.path.expanduser("~/.cache/mm3d_jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags — cache is best-effort
        pass
    return path
