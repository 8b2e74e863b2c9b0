"""L2 — morph synthesis: quadratic paths, batched warps, extended blending.

Rebuild of the reference's render kernels + path solver + Poisson extension
(SURVEY.md section 2 layer L2). No rasterization/splatting: output frames are
produced by inverting the halfway path per output pixel and backward bilinear
sampling — batched, vmappable over time, shardable over a mesh
(BASELINE.json north star "batched bidirectional bilinear warps").
"""

from videomorphing_tpu.synth.paths import bulge_field, rotation_angle_map
from videomorphing_tpu.synth.render import (
    path_displacement,
    invert_path,
    render_frame,
    render_clip,
)
from videomorphing_tpu.synth.blend import blend_extended

__all__ = [
    "bulge_field",
    "rotation_angle_map",
    "path_displacement",
    "invert_path",
    "render_frame",
    "render_clip",
    "blend_extended",
]
