"""Video morphing model [EGSR14]: flows + temporal scan + batched synthesis."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.video.pipeline import VideoResult, morph_video, solve_clip_fields


@dataclasses.dataclass(frozen=True)
class VideoMorpher:
    """Configured video morpher (BASELINE.json configs 3-4).

    >>> morpher = VideoMorpher()
    >>> out = morpher(clip_a, clip_b, keyframe_points)
    >>> out.frames  # (T, H, W, C) morph transition
    """

    mp: MorphParams = MorphParams()
    sp: SynthParams = SynthParams()
    vp: VideoParams = VideoParams()

    def solve(self, clip_a, clip_b, points=None):
        return solve_clip_fields(clip_a, clip_b, points, self.mp, self.vp)

    def __call__(
        self,
        clip_a: jnp.ndarray,
        clip_b: jnp.ndarray,
        points: Optional[jnp.ndarray] = None,
        times: Optional[jnp.ndarray] = None,
        render: bool = True,
        mesh=None,
    ) -> VideoResult:
        return morph_video(
            clip_a, clip_b, points=points, times=times,
            mp=self.mp, sp=self.sp, vp=self.vp, render=render, mesh=mesh,
        )
