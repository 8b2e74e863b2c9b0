"""Coarse-to-fine pyramid driver for the halfway-domain solve [TOG14 s4].

Python orchestrates levels (each level shape is its own jit specialization,
exactly one compile per shape thanks to an lru-cached jitted solver); within
a level everything runs in one device-resident ``lax.while_loop``
(SURVEY.md section 4, stack B: no host round-trips until the final field).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.ops.pyramid import (
    auto_n_levels,
    downsample_to,
    gaussian_pyramid,
    pyramid_shapes,
    upsample_field_2x,
)
from videomorphing_tpu.solver.constraints import (
    rasterize_point_constraints,
    scale_points,
)
from videomorphing_tpu.solver.descent import LevelStats, make_level_solver
from videomorphing_tpu.solver.energy import LevelData, make_level_data


class OptimizeResult(NamedTuple):
    v: jnp.ndarray                 # (H, W, 2) converged halfway field
    level_stats: Tuple[LevelStats, ...]  # coarse -> fine order
    n_levels: int


@functools.lru_cache(maxsize=None)
def _jitted_level_solver(params: MorphParams, n_iters: int):
    return jax.jit(make_level_solver(params, n_iters))


def resample_field(v: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize a displacement field to (H, W), rescaling vector magnitudes."""
    h0, w0 = v.shape[0], v.shape[1]
    out = jax.image.resize(v, (hw[0], hw[1], 2), method="bilinear")
    return out * jnp.asarray([hw[0] / h0, hw[1] / w0], dtype=v.dtype)


@functools.lru_cache(maxsize=None)
def _jitted_full_solve(
    params: MorphParams,
    hw: Tuple[int, int],
    n_levels: int,
    start_level: int,
    n_points: int,
    with_v0: bool,
    with_tc: bool,
):
    """ONE jitted executable for the whole coarse-to-fine solve.

    The chip sits behind a high-latency link, so the eager glue between
    per-level solves (pyramid build, constraint rasterization, field
    upsampling — ~20 small dispatches) used to cost more wall clock than
    the coarse level solves themselves. Tracing every level into a single
    program removes all of it; the compile is cached per
    (params, shape, level-structure) signature like the level solvers were.
    """
    h, w = hw
    shapes = pyramid_shapes(h, w, n_levels)

    def run(i0, i1, points, v0, tc_w, tc_v):
        dtype = i0.dtype
        pyr0 = gaussian_pyramid(i0, n_levels)
        pyr1 = gaussian_pyramid(i1, n_levels)

        if with_v0:
            v = resample_field(v0.astype(dtype), shapes[start_level])
        else:
            v = jnp.zeros(shapes[start_level] + (2,), dtype)

        stats = []
        for level in range(start_level, -1, -1):
            lh, lw = shapes[level]
            lpts = scale_points(points, (h, w), (lh, lw))
            ui_w, ui_v = rasterize_point_constraints(lpts, (lh, lw), params.ui_sigma, dtype)
            if with_tc:
                ltc_w = downsample_to(tc_w[..., None] if tc_w.ndim == 2 else tc_w, (lh, lw))
                ltc_v = resample_field(tc_v.astype(dtype), (lh, lw))
            else:
                ltc_w = None
                ltc_v = None
            data = make_level_data(pyr0[level], pyr1[level], ui_w, ui_v, ltc_w, ltc_v)
            solve = make_level_solver(params, params.iters_for_level(level, n_levels))
            v, st = solve(v, data)
            stats.append(st)
            if level > 0:
                v = upsample_field_2x(v, shapes[level - 1])
        return v, tuple(stats)

    return jax.jit(run)


def optimize_pair(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    points: Optional[jnp.ndarray] = None,
    params: MorphParams = MorphParams(),
    v0: Optional[jnp.ndarray] = None,
    tc_w: Optional[jnp.ndarray] = None,
    tc_v: Optional[jnp.ndarray] = None,
    start_level: Optional[int] = None,
) -> OptimizeResult:
    """Solve for the halfway field between ``i0`` and ``i1`` (H, W, C).

    ``points``: optional (N, 2, 2) full-res correspondence pairs
    ((y, x) in image 0, (y, x) in image 1) [TOG14 s3.3].
    ``v0``: optional full-res warm start (video propagation [EGSR14 s4]).
    ``tc_w/tc_v``: optional full-res temporal-coherence weight/target.
    ``start_level``: coarsest level to solve (defaults: coarsest when cold,
    a mid level when warm-started — warm frames need no coarse search).
    """
    h, w = i0.shape[0], i0.shape[1]
    dtype = i0.dtype
    n_levels = params.n_levels or auto_n_levels(h, w, params.min_level_size)

    if points is None:
        points = jnp.zeros((0, 2, 2), dtype)

    if start_level is None:
        start_level = (n_levels - 1) if v0 is None else max((n_levels - 1) // 2, 0)
    start_level = min(start_level, n_levels - 1)

    with_v0 = v0 is not None
    with_tc = tc_w is not None and tc_v is not None
    run = _jitted_full_solve(
        params, (h, w), n_levels, start_level, int(points.shape[0]),
        with_v0, with_tc,
    )
    z2 = jnp.zeros((h, w, 2), dtype)
    v, stats = run(
        i0, i1, points,
        v0 if with_v0 else z2,
        tc_w if with_tc else jnp.zeros((h, w, 1), dtype),
        tc_v if with_tc else z2,
    )
    return OptimizeResult(v=v, level_stats=tuple(stats), n_levels=n_levels)
