"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-world "fake backend" for data-parallel tests without a real pod —
see SURVEY.md §4.

IMPORTANT: this image's sitecustomize registers a remote-TPU ("axon") PJRT
plugin and calls ``jax.config.update("jax_platforms", "axon,cpu")`` in
every process — the JAX_PLATFORMS *env var* is silently overridden.  An
explicit config update after import wins, so that is what we do here.
"""

import os

# Belt: env vars (effective if sitecustomize is absent); set before import.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Suspenders: explicit config updates beat the sitecustomize override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)
# Exact fp32 convs/matmuls so torch-oracle parity checks are tight.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the model zoo is 16 sizeable graphs; cache
# compiled executables across test runs.  The dir is DISTINCT from the
# CLIs' cache (utils/cache.py): that one refuses CPU entries because this
# image can compile remotely on hosts with different CPU features
# (SIGILL risk); the test cache is local-CPU-only and per-user (0700).
_test_cache = os.path.join(
    os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache"),
    "jcfszxc_unet_tpu", "jax_cache_cpu_tests")
os.makedirs(_test_cache, mode=0o700, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _test_cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402

# Smoke tier (`pytest -m smoke`, VERDICT r3 item 10): one fast module per
# framework layer — numerics, optimizer, data, CLI contracts, checkpoint
# durability, model flags, DCN smoke, visualization.  The torch-oracle
# parity suites (the 30-minute bulk) stay full-suite-only: they gate
# releases, not edit loops.
SMOKE_MODULES = {
    "test_losses", "test_optim", "test_data", "test_cli", "test_vis",
    "test_checkpoint_async", "test_logit_head", "test_distributed",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
