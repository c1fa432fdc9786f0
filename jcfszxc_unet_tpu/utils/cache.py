"""Persistent XLA compile cache for the CLIs.

The reference has no compile step; here the jitted epoch/eval graphs cost
minutes to compile (remote compilation through this image's TPU relay), so
the CLIs persist compiled executables across invocations.

CPU executables are deliberately NOT cached: on this image CPU compiles
can happen remotely (PALLAS_AXON_REMOTE_COMPILE) on hosts with different
CPU features, and loading such AOT objects locally risks SIGILL
(experiments_record.md).

The cache lives in a per-user directory created with mode 0700 (override
with ``JCFSZXC_UNET_TPU_CACHE_DIR``): compiled executables are loaded and
executed, so a world-writable shared path like /tmp would let another
local user plant entries.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    env = os.environ.get("JCFSZXC_UNET_TPU_CACHE_DIR")
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return os.path.join(base, "jcfszxc_unet_tpu", "jax_cache")


def enable_persistent_compile_cache(cache_dir: str | None = None) -> bool:
    """Turn on the persistent compile cache unless running on CPU.
    Returns True if enabled."""
    import jax

    try:
        if jax.default_backend() == "cpu":
            return False
        if cache_dir is None:
            cache_dir = default_cache_dir()
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
