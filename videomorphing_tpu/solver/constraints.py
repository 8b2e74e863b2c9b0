"""Sparse user correspondences -> per-level constraint maps [TOG14 s3.3].

A user pair (q0_i, q1_i) (full-resolution (y, x) pixel coords in image 0 and
image 1) implies a halfway anchor p_i = (q0+q1)/2 with target vector
v_i = (q1-q0)/2. The reference propagates these soft constraints across its
pyramid (SURVEY.md section 3 "UI-constraint term"); here each level gets a
rasterized weight map + target field, computed once per solve and kept
device-resident through the level solver.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from videomorphing_tpu.ops.resample import grid_coords


def scale_points(points: jnp.ndarray, full_hw: Tuple[int, int], level_hw: Tuple[int, int]) -> jnp.ndarray:
    """Rescale (N, 2, 2) point pairs from full-res coords to a level's grid.

    Per-axis factors handle ceil-divided level shapes exactly.
    """
    if points.shape[0] == 0:
        return points
    sy = level_hw[0] / full_hw[0]
    sx = level_hw[1] / full_hw[1]
    return points * jnp.asarray([sy, sx], dtype=points.dtype)


def rasterize_point_constraints(
    points: jnp.ndarray,
    hw: Tuple[int, int],
    sigma: float,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize point pairs (already in THIS level's coordinates).

    ``points``: (N, 2, 2) float — [i, 0] = q0_i (y, x), [i, 1] = q1_i.
    Returns ``(w, vt)``: weight map (H, W, 1) in [0, 1] and target field
    (H, W, 2). Weight is a Gaussian falloff around each halfway anchor; where
    anchors overlap, targets blend by weight.
    """
    h, w = hw
    if points.shape[0] == 0:
        return jnp.zeros((h, w, 1), dtype), jnp.zeros((h, w, 2), dtype)

    points = points.astype(dtype)
    anchors = 0.5 * (points[:, 0] + points[:, 1])   # (N, 2) halfway positions
    targets = 0.5 * (points[:, 1] - points[:, 0])   # (N, 2) target vectors

    g = grid_coords(h, w, dtype=dtype)              # (H, W, 2)
    d = g[None] - anchors[:, None, None, :]         # (N, H, W, 2)
    d2 = jnp.sum(d * d, axis=-1)                    # (N, H, W)
    wts = jnp.exp(-0.5 * d2 / (sigma * sigma))      # (N, H, W)

    wsum = jnp.sum(wts, axis=0)                     # (H, W)
    vt = jnp.einsum("nhw,nc->hwc", wts, targets) / jnp.maximum(wsum, 1e-12)[..., None]
    w_map = jnp.clip(wsum, 0.0, 1.0)
    return w_map[..., None], vt
