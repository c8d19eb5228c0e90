"""JAX persistent compilation cache setup.

This environment's TPU backend compiles remotely and slowly (a fresh train
step can take ~10 min to compile); the persistent cache makes repeat CLI /
bench invocations start in seconds. Call ``enable_compilation_cache()``
early in every entry point.
"""

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "ICLR17C_JAX_CACHE", os.path.expanduser("~/.cache/iclr17c_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
