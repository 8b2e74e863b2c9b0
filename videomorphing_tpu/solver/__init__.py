"""L1 — the halfway-domain correspondence solver.

Rebuild of the reference's "gpumorph" core (SURVEY.md section 3): energy
definition, multi-color preconditioned descent with per-iteration line search
and foldover clamping, and the coarse-to-fine pyramid driver. The plain-jnp
path here is the oracle; ``videomorphing_tpu.pallas`` provides the fused
kernels validated against it.
"""

from videomorphing_tpu.solver.energy import (
    LevelData,
    make_level_data,
    total_energy,
    energy_terms,
    warp_pair,
)
from videomorphing_tpu.solver.constraints import (
    rasterize_point_constraints,
    scale_points,
)
from videomorphing_tpu.solver.descent import (
    boundary_mask,
    color_mask,
    foldover_scale,
    make_level_solver,
    LevelStats,
)
from videomorphing_tpu.solver.ctf import optimize_pair, OptimizeResult

__all__ = [
    "LevelData",
    "make_level_data",
    "total_energy",
    "energy_terms",
    "warp_pair",
    "rasterize_point_constraints",
    "scale_points",
    "boundary_mask",
    "color_mask",
    "foldover_scale",
    "make_level_solver",
    "LevelStats",
    "optimize_pair",
    "OptimizeResult",
]
