"""Image-pair morphing model [TOG14]: solve + paths + render.

This is the flagship model (BASELINE.json configs 1-2): two images + sparse
correspondences in, K in-between frames out.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams, SynthParams
from videomorphing_tpu.solver.ctf import OptimizeResult, optimize_pair
from videomorphing_tpu.synth.paths import bulge_field, jitted_bulge_field
from videomorphing_tpu.synth.render import jitted_render_clip, render_clip, render_frame


class MorphArtifacts(NamedTuple):
    """Everything needed to re-render without re-optimizing — the analogue of
    the reference's cached converged fields (SURVEY.md section 6
    checkpoint/resume)."""

    v: jnp.ndarray                  # (H, W, 2) halfway field
    b: Optional[jnp.ndarray]        # (H, W, 2) quadratic-path bulge
    result: Optional[OptimizeResult]


@dataclasses.dataclass(frozen=True)
class ImageMorpher:
    """Configured image-pair morpher.

    >>> morpher = ImageMorpher()
    >>> frames = morpher(i0, i1, points, n_frames=16)
    """

    mp: MorphParams = MorphParams()
    sp: SynthParams = SynthParams()

    def solve(
        self,
        i0: jnp.ndarray,
        i1: jnp.ndarray,
        points: Optional[jnp.ndarray] = None,
        v0: Optional[jnp.ndarray] = None,
    ) -> MorphArtifacts:
        """Optimize the halfway field and the quadratic-path bulge."""
        res = optimize_pair(i0, i1, points=points, params=self.mp, v0=v0)
        b = jitted_bulge_field(self.sp)(res.v) if self.sp.quadratic_paths else None
        return MorphArtifacts(v=res.v, b=b, result=res)

    def render(
        self,
        i0: jnp.ndarray,
        i1: jnp.ndarray,
        art: MorphArtifacts,
        ts: jnp.ndarray,
    ) -> jnp.ndarray:
        return jitted_render_clip(self.sp)(i0, i1, art.v, art.b, ts)

    def render_one(self, i0, i1, art: MorphArtifacts, t) -> jnp.ndarray:
        return render_frame(i0, i1, art.v, art.b, t, self.sp)

    def __call__(
        self,
        i0: jnp.ndarray,
        i1: jnp.ndarray,
        points: Optional[jnp.ndarray] = None,
        n_frames: int = 16,
        include_endpoints: bool = True,
    ) -> jnp.ndarray:
        art = self.solve(i0, i1, points)
        if include_endpoints:
            ts = jnp.linspace(0.0, 1.0, n_frames)
        else:
            ts = (jnp.arange(n_frames) + 1.0) / (n_frames + 1.0)
        return self.render(i0, i1, art, ts)
