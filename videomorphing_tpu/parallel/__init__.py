"""L4 — distribution over a TPU mesh.

The reference runs on ONE CUDA GPU with no distribution of any kind
(SURVEY.md section 3, parallelism inventory) — this layer is new, scoped by
BASELINE.json configs 3-5:

- frame/pair data parallelism: synthesis and batched pair solves sharded
  over a 1-D ``("batch",)`` mesh (``frames.py``);
- spatial sharding (the morphing analogue of sequence/context parallelism):
  one big frame's rows split over cores, stencil halos exchanged with
  ``lax.ppermute``, energy reductions with ``psum`` (``halo.py``,
  ``spatial.py``);
- XLA collectives over ICI are the only communication backend — no
  NCCL/MPI analogue is warranted (SURVEY.md section 6).
"""

from videomorphing_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
)
from videomorphing_tpu.parallel.halo import halo_exchange_rows
from videomorphing_tpu.parallel.frames import (
    render_clip_sharded,
    optimize_pairs_batched,
)
from videomorphing_tpu.parallel.spatial import make_spatial_level_solver

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "halo_exchange_rows",
    "render_clip_sharded",
    "optimize_pairs_batched",
    "make_spatial_level_solver",
]
