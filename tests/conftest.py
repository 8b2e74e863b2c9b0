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
import sys

# The default 8 MB stack has segfaulted the XLA CPU compiler mid-suite on
# large executables (deep LLVM/HLO pass recursion; crash in
# backend_compile_and_load with 122 GB RAM free; seen twice, ~130 tests
# in, both in optimize_pair compiles). Raising RLIMIT_STACK in-process is
# NOT enough: the kernel bases the main stack's growth room on the rlimit
# at exec time, and glibc latches the default pthread stack size from it
# at startup — so a runtime raise leaves both the main thread and XLA's
# compile threads at 8 MB. The reliable fix is to set a large FINITE limit
# and re-exec the interpreter once (same pid/argv; rlimits survive exec).
# Done from pytest_configure (below) rather than at import so pytest's
# capture manager can hand back the REAL stdout/stderr fds first — exec
# under active capture strands all output in an orphaned temp file.
_STACK_WANT = 512 * 1024 * 1024  # virtual reservation only — free on 64-bit


def _stack_limit_is_small() -> bool:
    soft, _ = resource.getrlimit(resource.RLIMIT_STACK)
    return soft == resource.RLIM_INFINITY or 0 < soft < _STACK_WANT


def pytest_configure(config):
    if not _stack_limit_is_small() or os.environ.get("VMORPH_STACK_REEXEC") == "1":
        return
    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    cap = _STACK_WANT if hard == resource.RLIM_INFINITY else min(_STACK_WANT, hard)
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (cap, hard))
    except (ValueError, OSError):
        return
    os.environ["VMORPH_STACK_REEXEC"] = "1"
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
        except Exception:
            pass
    os.execv(sys.executable, list(sys.orig_argv))

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


# Every compiled executable mmaps JIT code/data regions and none are ever
# released while the pjit caches hold them, so a full-suite process crosses
# the kernel's vm.max_map_count (65530 default) after ~130 tests — mmap
# then fails and LLVM's JIT segfaults inside backend_compile_and_load.
# (Diagnosed by logging /proc/self/maps per test: position-dependent
# crashes at ~the same TEST COUNT in different tests; a full green run
# measured a PEAK OF 87,969 maps at test_video_blocks, 1.3x the default
# ceiling.) Two mitigations: raise the sysctl when permitted, and drop
# compiled-executable references between modules once the map count nears
# the ceiling.


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def _max_map_count() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except (OSError, ValueError):
        return 65530


try:  # best-effort: needs root / a writable procfs (true in CI sandboxes)
    if _max_map_count() < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("262144\n")
except OSError:
    pass


@pytest.fixture(scope="module", autouse=True)
def _shed_executable_maps():
    yield
    if _map_count() > int(0.7 * _max_map_count()):
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
