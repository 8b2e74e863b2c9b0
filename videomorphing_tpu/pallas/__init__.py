"""L1b — fused Pallas/Mosaic kernels for the halfway-domain sweep.

TPU-native rebuild of the reference's CUDA sweep kernels (SURVEY.md
section 3 "GPU morph core", section 8 stage 4): where the reference fuses
SSIM window statistics, the TPS stencil, the constraint terms and the
per-pixel line-search quantities into CUDA kernels over GPU-resident
buffers, this package fuses the same math into ``pl.pallas_call`` kernels
over VMEM tiles, with the packed per-level planes HBM-resident between
iterations.

Two kernels:

- :func:`fused_value_grad_precond` — one pass producing the total energy,
  the analytic gradient dE/dv and the Gauss-Newton diagonal preconditioner
  (the jnp twin is ``solver.descent.energy_value_grad_precond``).
- :func:`fused_total_energy` — one pass producing the energy only, used by
  the Armijo line search (jnp twin: ``solver.energy.total_energy``).

Both are validated against their jnp twins in ``tests/test_pallas.py``
(SURVEY.md section 5 "Kernel equivalence"); the twins are the oracle, the
kernels are the performance path.
"""

from videomorphing_tpu.pallas.sweep import (
    fused_total_energy,
    fused_total_energy_planes,
    fused_value_grad_precond,
    fused_value_grad_precond_planes,
    pallas_available,
)

__all__ = [
    "fused_total_energy",
    "fused_total_energy_planes",
    "fused_value_grad_precond",
    "fused_value_grad_precond_planes",
    "pallas_available",
]
