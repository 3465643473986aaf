"""Persistent XLA compilation cache setup.

First compiles are slow (especially through the axon remote-compile
tunnel); caching them on disk makes repeat pipeline runs start fast.
"""

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.join(os.path.expanduser("~"), ".cache", "sdtpu_xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
