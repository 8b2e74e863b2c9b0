"""Occlusion detection from forward/backward flow inconsistency [EGSR14 s5].

A pixel visible in both frames has flows that round-trip:
fwd(p) + bwd(p + fwd(p)) ~ 0. Where the round-trip error is large the pixel
is occluded in the next frame; blending weights shift toward the un-occluded
source (SURVEY.md section 3 "Occlusion detection/blend").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import VideoParams
from videomorphing_tpu.ops.resample import bilinear_sample, grid_coords


def occlusion_confidence(
    flow_fwd: jnp.ndarray,
    flow_bwd: jnp.ndarray,
    vp: VideoParams = VideoParams(),
    use_fused: bool | None = None,
) -> jnp.ndarray:
    """Per-pixel visibility confidence in [0, 1] (1 = consistent / visible).

    ``flow_fwd``: (H, W, 2) flow of this frame to the other; ``flow_bwd``:
    the reverse flow. Soft threshold on the round-trip error.

    The round-trip lookup ``bwd(p + fwd(p))`` is a bilinear sample of a
    2-channel plane at a smooth coordinate map — exactly the fused
    sampler's contract — so on TPU it rides ``pallas.warp.fused_sample``
    (same edge-clamp semantics, exact-XLA fallback per band). The XLA
    gather this replaces was the north-star profile's 3rd-largest phase:
    9.7 s of a 34.2 s 30-frame 1080p run went to these 58 four-tap
    gathers (scripts/profile_northstar.py, PERF.md round 3).
    """
    h, w = flow_fwd.shape[0], flow_fwd.shape[1]
    g = grid_coords(h, w, dtype=flow_fwd.dtype)
    if use_fused is None:
        use_fused = vp.fused_occlusion and jax.default_backend() == "tpu"
    if use_fused:
        from videomorphing_tpu.pallas.warp import fused_sample

        (bwd_at,) = fused_sample([flow_bwd], [g + flow_fwd])
    else:
        bwd_at = bilinear_sample(flow_bwd, g + flow_fwd)
    err = jnp.linalg.norm(flow_fwd + bwd_at, axis=-1)
    occ = jax.nn.sigmoid((err - vp.occlusion_thresh) / max(vp.occlusion_soft, 1e-6))
    return 1.0 - occ
