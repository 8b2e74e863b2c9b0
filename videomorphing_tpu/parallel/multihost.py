"""Multi-host execution (DCN tier) for batch workloads.

SURVEY.md section 6 "Distributed communication backend": XLA collectives
over ICI handle intra-host sharding; scaling config-5 batches past one host
uses ``jax.distributed`` + a global mesh, with DCN as the transport. The
reference has no distributed execution at all — this is a new first-class
component of the rebuild.

Model: every process runs the same program; `initialize()` joins the
cluster; `global_mesh()` builds a mesh over ALL processes' devices; pure-DP
batch work shards by process via :func:`process_shard` (no cross-host
communication at all — each host streams, solves and encodes its share),
while sharded computations (spatial or pair sharding across hosts) go
through the normal `shard_map` path on the global mesh, with XLA routing
collectives over DCN.

Single-node testing: ``tests/test_multihost.py`` launches N real processes
with a local coordinator (the standard JAX single-node multi-process
recipe).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join (or no-op on single-process) the distributed runtime.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``); with none set this is a no-op single-process run.
    Returns ``(process_id, num_processes)``.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def global_mesh(axis_name: str = "batch") -> Mesh:
    """1-D mesh over every device of every process (DP over DCN+ICI)."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def process_shard(items: Sequence, process_id: Optional[int] = None,
                  num_processes: Optional[int] = None) -> List:
    """This process's contiguous share of a global work list.

    The pure-DP tier of multi-host batching: jobs are independent, so no
    collective is needed — each host takes ``items[lo:hi]``.
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    per = -(-len(items) // n)
    return list(items[pid * per : (pid + 1) * per])
