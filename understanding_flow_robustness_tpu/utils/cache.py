"""Persistent XLA compilation cache setup.

Compiles over the tunneled TPU backend take minutes; the persistent cache
makes every recurring program (bench, eval, attack loops) compile once per
machine.  Call ``enable_compilation_cache()`` before the first jit.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/ufr_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("UFR_COMPILE_CACHE", _DEFAULT_DIR)
    # separate caches per backend: CPU AOT artifacts compiled elsewhere
    # fail feature checks when loaded on a different machine
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
