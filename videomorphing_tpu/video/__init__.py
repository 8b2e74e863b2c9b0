"""L3 — video orchestration: optical flow, temporal propagation, occlusion.

Rebuild of the reference's video matching thread + flow module ([EGSR14];
SURVEY.md section 2 layer L3). The per-clip flow is a pyramid Horn-Schunck in
pure JAX (the reference wraps an external GPU flow; any flow of similar
quality satisfies the contract since flow only warm-starts and regularizes —
SURVEY.md section 1.5). Frames are processed as a ``lax.scan`` carrying the
converged halfway field.
"""

from videomorphing_tpu.video.flow import flow_pair, clip_flows
from videomorphing_tpu.video.occlusion import occlusion_confidence
from videomorphing_tpu.video.temporal import advect_halfway_field
from videomorphing_tpu.video.pipeline import (
    solve_clip_fields,
    morph_video,
    VideoResult,
)

__all__ = [
    "flow_pair",
    "clip_flows",
    "occlusion_confidence",
    "advect_halfway_field",
    "solve_clip_fields",
    "morph_video",
    "VideoResult",
]
