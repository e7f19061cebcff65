"""Test configuration: force CPU with 8 virtual devices for mesh tests.

Must run before the first `import jax` anywhere in the test session.
"""

import os

# The axon sitecustomize registers the TPU tunnel whenever
# PALLAS_AXON_POOL_IPS is set and forces platforms to "axon,cpu";
# tests must run on the local CPU backend (the tunnel has huge per-op
# latency), so drop the trigger before jax import.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize may have imported jax before this conftest ran and
# pinned platforms to "axon,cpu"; as long as no backend is initialized yet,
# this override still wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite's cost on this 1-core box is
# dominated by recompiling the same tiny models; reruns hit the cache.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
