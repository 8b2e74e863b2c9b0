"""Row-halo exchange for spatially sharded stencil computation.

The morphing analogue of ring attention's KV rotation (SURVEY.md section 6
"long-context"): the SSIM window and TPS stencil need a few neighbor rows
across shard boundaries, exchanged with two ``lax.ppermute`` shifts over ICI.
Domain edges receive ZERO rows, which exactly reproduces the unsharded
zero-pad window sums — so the spatially sharded solver is numerically
identical to the single-device oracle (tested in tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Extend a row-sharded block with ``halo`` rows from each neighbor.

    Must run inside ``shard_map``; ``x``: local block (Hl, ...). Returns
    (Hl + 2*halo, ...). Non-periodic: edge shards get zero halos.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # my top halo = bottom rows of my upper neighbor (i-1 -> i)
    top = jax.lax.ppermute(
        x[-halo:], axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    # my bottom halo = top rows of my lower neighbor (i+1 -> i)
    bottom = jax.lax.ppermute(
        x[:halo], axis_name, perm=[(i + 1, i) for i in range(n - 1)]
    )
    # ppermute leaves non-receivers with zeros — exactly the zero-pad we
    # want at the true domain edges; make it explicit for clarity
    top = jnp.where(idx == 0, jnp.zeros_like(top), top)
    bottom = jnp.where(idx == n - 1, jnp.zeros_like(bottom), bottom)
    return jnp.concatenate([top, x, bottom], axis=0)
