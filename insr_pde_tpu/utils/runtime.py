"""Process-level runtime setup shared by all entry points."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache.

    On the tunneled TPU platform a fresh compile costs minutes per program
    (see .claude/skills/verify SKILL.md); the cache makes every subsequent
    process reuse the compiled executable. Safe no-op if the backend doesn't
    support serialization.
    """
    import jax

    if os.environ.get("INSR_NO_COMPILATION_CACHE"):
        return
    # NOTE: the tunneled 'axon' platform was observed NOT to benefit (its
    # PJRT plugin appears not to deserialize cached executables); the cache
    # is kept for standard TPU/CPU deployments where it does.
    cache_dir = path or os.environ.get(
        "INSR_COMPILATION_CACHE", os.path.expanduser("~/.cache/jax_insr"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
