"""Test config: force CPU JAX with 8 virtual devices (sharding tests).

NOTE: this environment preloads jax via a sitecustomize that registers a
TPU backend and sets JAX_PLATFORMS before any test code runs, so plain env
vars are ineffective — we must go through jax.config.update BEFORE the
first backend use.
"""

import os
import sys

# XLA_FLAGS is read at CPU-client creation (lazily), so env still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
else:
    # Bump an inherited smaller count (e.g. a stale =2 from a prior shell):
    # merely detecting the substring would silently SKIP every mesh test.
    import re

    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=(\d+)",
        lambda m: m.group(0)
        if int(m.group(1)) >= 8
        else "--xla_force_host_platform_device_count=8",
        flags,
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already preloaded by sitecustomize)

jax.config.update("jax_platforms", "cpu")
# Parity tests need true f32 matmuls (TPU-default precision is bf16-ish).
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache to amortize compile time across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
