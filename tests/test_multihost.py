"""Multi-host (DCN tier) tests — the standard JAX single-node
multi-process recipe (SURVEY.md section 5 "Multi-host paths tested with
jax.distributed single-node multi-process")."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["VM_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

# The env var alone is NOT enough here: environments with an auto-loaded
# TPU plugin (axon) ignore JAX_PLATFORMS, the worker silently initializes
# the TPU backend, and jax.process_count() comes back 1.
jax.config.update("jax_platforms", "cpu")
from videomorphing_tpu.parallel.multihost import initialize, global_mesh, process_shard

pid, n = initialize()
assert n == 2, n

# pure-DP sharding of a job list
jobs = list(range(10))
mine = process_shard(jobs)
assert mine == ([0, 1, 2, 3, 4] if pid == 0 else [5, 6, 7, 8, 9]), (pid, mine)

# a real cross-process collective over the global mesh
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = global_mesh()
assert mesh.devices.size == 4  # 2 processes x 2 virtual devices

@jax.jit
def total(x):
    return jnp.sum(x)

x = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P("batch")),
    lambda idx: jnp.asarray([float(pid * 2 + 1)])  # local shard values
)
# process 0 contributes [1,1], process 1 [3,3] -> global sum 8
out = float(total(x))
assert out == 8.0, out
print(f"proc {pid}: OK", flush=True)
"""


def test_two_process_cluster(tmp_path):
    port = _free_port()
    env = dict(
        os.environ,
        VM_REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES="2",
    )
    env.pop("PYTEST_CURRENT_TEST", None)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        e = dict(env, JAX_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=e, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=210)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed runtime unavailable (timeout)")
        outs.append(out.decode())
    if any(p.returncode != 0 for p in procs):
        msg = "\n".join(outs)
        # sandboxed CI may block local TCP entirely (no coordinator
        # reachable) — that's an environment restriction, not a code bug
        if ("Connection refused" in msg or "DEADLINE_EXCEEDED" in msg
                or "CANCELLED" in msg or "failed to connect" in msg):
            pytest.skip("local TCP blocked: jax.distributed cluster cannot form here")
        raise AssertionError(msg)
    assert all("OK" in o for o in outs), outs


def test_process_shard_explicit():
    from videomorphing_tpu.parallel.multihost import process_shard

    jobs = list(range(10))
    assert process_shard(jobs, 0, 3) == [0, 1, 2, 3]
    assert process_shard(jobs, 1, 3) == [4, 5, 6, 7]
    assert process_shard(jobs, 2, 3) == [8, 9]
    assert process_shard([], 0, 2) == []
