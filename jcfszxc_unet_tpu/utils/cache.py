"""Persistent XLA compile cache for the CLIs.

The reference has no compile step; here the jitted epoch/eval graphs cost
minutes to compile (remote compilation through this image's TPU relay), so
the CLIs persist compiled executables across invocations.

CPU executables are deliberately NOT cached: on this image CPU compiles
can happen remotely (PALLAS_AXON_REMOTE_COMPILE) on hosts with different
CPU features, and loading such AOT objects locally risks SIGILL
(experiments_record.md).
"""

from __future__ import annotations

DEFAULT_CACHE_DIR = "/tmp/jcfszxc_unet_tpu_jax_cache"


def enable_persistent_compile_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> bool:
    """Turn on the persistent compile cache unless running on CPU.
    Returns True if enabled."""
    import jax

    try:
        if jax.default_backend() == "cpu":
            return False
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
