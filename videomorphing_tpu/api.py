"""Public library API (L5).

The reference's public surface is its Qt GUI; the rebuild's is this module +
the CLI (SURVEY.md section 2 layer L5): image pair or clip pair + sparse
correspondences in, morph frames out.

    import videomorphing_tpu as vm
    frames = vm.api.morph_pair(i0, i1, points, n_frames=16)
    result = vm.api.morph_clips(clip_a, clip_b, points)

``Session`` supports the reference's interactive loop (SURVEY.md section 4
stack E): update points, re-solve warm-started from the current field, render
a preview — same jitted code path, no special mode.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.models.image_morph import ImageMorpher, MorphArtifacts
from videomorphing_tpu.models.video_morph import VideoMorpher
from videomorphing_tpu.video.pipeline import VideoResult


def morph_pair(
    i0,
    i1,
    points=None,
    n_frames: int = 16,
    mp: MorphParams = MorphParams(),
    sp: SynthParams = SynthParams(),
) -> jnp.ndarray:
    """Morph an image pair: (H, W, C) x2 -> (n_frames, H, W, C)."""
    return ImageMorpher(mp, sp)(_dev(i0), _dev(i1), _pts(points), n_frames)


def solve_pair(i0, i1, points=None, mp=MorphParams(), sp=SynthParams()) -> MorphArtifacts:
    """Solve only (field + bulge), for callers that render separately."""
    return ImageMorpher(mp, sp).solve(_dev(i0), _dev(i1), _pts(points))


def morph_clips(
    clip_a,
    clip_b,
    points=None,
    times=None,
    mp: MorphParams = MorphParams(),
    sp: SynthParams = SynthParams(),
    vp: VideoParams = VideoParams(),
    render: bool = True,
    mesh=None,
) -> VideoResult:
    """Morph a clip pair: (T, H, W, C) x2 -> VideoResult with (T, H, W, C).

    ``mesh``: optional 1-D device mesh — frame BLOCKS solve in parallel
    across it (one cold head per block, warm scan within; config 4).
    """
    return VideoMorpher(mp, sp, vp)(
        _dev(clip_a), _dev(clip_b), _pts(points), times=times, render=render,
        mesh=mesh,
    )


def morph_pair_layered(
    i0,
    i1,
    layers,
    points=None,
    n_frames: int = 16,
    mp: MorphParams = MorphParams(),
    sp: SynthParams = SynthParams(),
) -> jnp.ndarray:
    """Layered morph: independently-moving regions get their own fields.

    ``layers``: sequence of ``models.layered.Layer`` or dicts with keys
    ``mask0``/``mask1`` ((H, W) float arrays) and optional ``points``.
    """
    from videomorphing_tpu.models.layered import Layer
    from videomorphing_tpu.models.layered import morph_pair_layered as _mpl

    norm = []
    for l in layers:
        if isinstance(l, Layer):
            norm.append(l)
        else:
            norm.append(
                Layer(
                    mask0=_dev(l["mask0"]),
                    mask1=_dev(l["mask1"]),
                    points=_pts(l.get("points")),
                )
            )
    return _mpl(_dev(i0), _dev(i1), norm, _pts(points), n_frames, mp, sp)


def morph_clips_layered(
    clip_a,
    clip_b,
    layers,
    points=None,
    times=None,
    mp: MorphParams = MorphParams(),
    sp: SynthParams = SynthParams(),
    vp: VideoParams = VideoParams(),
    mesh=None,
):
    """Layered video morph: independently-moving regions of a CLIP pair get
    their own temporally propagated fields (SURVEY.md section 3 layer masks;
    see ``video.layered``).

    ``layers``: sequence of ``video.layered.VideoLayer`` or dicts with keys
    ``mask0``/``mask1`` ((T, H, W) or (H, W) arrays) and optional ``points``.
    """
    from videomorphing_tpu.video.layered import VideoLayer
    from videomorphing_tpu.video.layered import morph_clips_layered as _mcl

    norm = []
    for l in layers:
        if isinstance(l, VideoLayer):
            norm.append(l)
        else:
            norm.append(
                VideoLayer(
                    mask0=_dev(l["mask0"]),
                    mask1=_dev(l["mask1"]),
                    points=_pts(l.get("points")),
                )
            )
    return _mcl(
        _dev(clip_a), _dev(clip_b), norm, _pts(points),
        times=times, mp=mp, sp=sp, vp=vp, mesh=mesh,
    )


class Session:
    """Interactive morphing session with warm restarts on point edits."""

    def __init__(self, i0, i1, mp: MorphParams = MorphParams(), sp: SynthParams = SynthParams()):
        self.i0 = _dev(i0)
        self.i1 = _dev(i1)
        self.morpher = ImageMorpher(mp, sp)
        self.points: Optional[jnp.ndarray] = None
        self.art: Optional[MorphArtifacts] = None

    def update_points(self, points) -> MorphArtifacts:
        """Re-solve with edited points, warm-started from the current field."""
        self.points = _pts(points)
        v0 = self.art.v if self.art is not None else None
        res = self.morpher.solve(self.i0, self.i1, self.points, v0=v0)
        self.art = res
        return res

    def solve(self) -> MorphArtifacts:
        if self.art is None:
            self.art = self.morpher.solve(self.i0, self.i1, self.points)
        return self.art

    def preview(self, t: float = 0.5) -> jnp.ndarray:
        """The halfway-view equivalent: render one frame at time t."""
        art = self.solve()
        return self.morpher.render_one(self.i0, self.i1, art, t)

    def render(self, n_frames: int = 16) -> jnp.ndarray:
        art = self.solve()
        ts = jnp.linspace(0.0, 1.0, n_frames)
        return self.morpher.render(self.i0, self.i1, art, ts)


def _dev(x) -> jnp.ndarray:
    arr = jnp.asarray(x)
    if arr.dtype in (jnp.uint8,):
        arr = arr.astype(jnp.float32) / 255.0
    return arr.astype(jnp.float32) if arr.dtype != jnp.float32 else arr


def _pts(points):
    """Normalize correspondences: (N, 2, 2) array, or a keyframe mapping
    ``{frame_idx: (N, 2, 2)}`` (video only — same N point identities per
    keyframe, flow-tracked between them [EGSR14 s3])."""
    if points is None:
        return None
    if isinstance(points, dict):
        out = {}
        n = None
        for k, v in points.items():
            p = jnp.asarray(v, jnp.float32)
            if p.ndim != 3 or p.shape[1:] != (2, 2):
                raise ValueError(
                    f"keyframe {k}: points must be (N, 2, 2), got {p.shape}"
                )
            if n is not None and p.shape[0] != n:
                raise ValueError(
                    "all keyframes must carry the same N point identities"
                )
            n = p.shape[0]
            out[int(k)] = p
        return out
    pts = jnp.asarray(points, jnp.float32)
    if pts.ndim != 3 or pts.shape[1:] != (2, 2):
        raise ValueError(
            f"points must be (N, 2, 2): [[y0,x0],[y1,x1]] pairs, got {pts.shape}"
        )
    return pts
