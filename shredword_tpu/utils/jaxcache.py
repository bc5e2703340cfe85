"""Persistent XLA compilation cache setup.

The hot training step compiles one large fused program per capacity
bucket (sorts + scans inside ``lax.while_loop``); through the remote
TPU tunnel a cold compile can take minutes.  The persistent cache makes
every compile a one-time cost per machine instead of per process.
"""

from __future__ import annotations

import os

_DONE = False


def ensure_jax_cache() -> None:
    """Idempotently point JAX at a persistent compilation cache dir.

    Override with SHREDWORD_JAX_CACHE; set to "0"/"off" to disable.
    Safe to call before or after backend init.
    """
    global _DONE
    if _DONE:
        return
    _DONE = True
    path = os.environ.get("SHREDWORD_JAX_CACHE", "/tmp/shredword_jax_cache")
    if path.lower() in ("0", "off", "none", ""):
        return
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a hard failure
        pass
