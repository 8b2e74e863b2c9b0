"""Test config: force an 8-virtual-device CPU platform.

This is the standard JAX trick for testing distributed code without a pod
(SURVEY.md section 5 "Distributed without a cluster"): all shard_map / halo /
mesh tests run against 8 fake CPU devices; identical code runs on a real
v5e-8.

NOTE: in this environment importing pytest already imports jax, so env vars
alone are latched too late — we also override jax.config directly (backends
initialize lazily, so this is still in time as long as no array was created
at import).
"""

import os
import resource

# The default 8 MB stack has segfaulted the XLA CPU compiler mid-suite on
# large shard_map executables (deep LLVM/HLO pass recursion; crash in
# backend_compile_and_load with 122 GB RAM free). Raise to the hard limit
# before jax loads so the main thread's stack can grow.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ValueError, OSError):
        pass

os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the persistent XLA compile cache under pytest: CLI entry points
# call enable_compile_cache(), and jaxlib's executable (de)serialization
# has segfaulted on large CPU shard_map executables even with a fresh,
# isolated cache dir (observed in test_video_blocks, once on cache get and
# once on put). Tests never benefit from the persistent cache anyway —
# every CPU compile here is fast. enable_compile_cache honors "off".
os.environ.setdefault("VMORPH_COMPILE_CACHE", "off")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
