"""videomorphing_tpu — a TPU-native (JAX/XLA/Pallas) video-morphing framework.

A ground-up rebuild of the capabilities of ``liaojing/videomorphing`` (the
C++/CUDA research code for Liao et al., "Automating Image Morphing using
Structural Similarity on a Halfway Domain", ACM TOG 33(5) 2014 [TOG14], and
"Semi-Automated Video Morphing", CGF 33(4) / EGSR 2014 [EGSR14]) designed
TPU-first rather than ported:

- the per-pixel correspondence field lives on a *halfway domain* and is solved
  by coarse-to-fine preconditioned descent with multi-color (checkerboard)
  updates — the TPU analogue of the reference's CUDA multi-color Gauss-Seidel
  sweeps (SURVEY.md section 1.3);
- the hot sweep is fused into Pallas kernels that keep window statistics and
  gradients VMEM-resident (``videomorphing_tpu.pallas``);
- synthesis is batched bidirectional bilinear warps along quadratic motion
  paths with Poisson-extended, occlusion-aware blending, ``vmap``-ed over
  output times and sharded over a TPU mesh (``videomorphing_tpu.synth``,
  ``videomorphing_tpu.parallel``);
- video runs as a ``lax.scan`` over frames carrying the converged field
  (temporal-coherence propagation, [EGSR14] section 4).

NOTE on citations: the reference mount ``/root/reference`` was empty at survey
time (SURVEY.md section 0), so docstrings cite the papers ([TOG14]/[EGSR14])
and SURVEY.md sections instead of reference ``file:line``.
"""

from videomorphing_tpu.config import (
    MorphParams,
    SynthParams,
    VideoParams,
)

__version__ = "0.1.0"

__all__ = [
    "MorphParams",
    "SynthParams",
    "VideoParams",
    "__version__",
]
