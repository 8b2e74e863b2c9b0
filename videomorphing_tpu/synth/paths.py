"""Quadratic motion paths from local rotation [TOG14 s5.1].

Straight-line halfway paths ghost on rotating content; [TOG14] bends each
pixel's path into a quadratic. The reference solves a locally-rigid linear
least-squares system for the per-pixel bulge (its exact rigidity energy is
unverifiable — SURVEY.md section 1.4 item 1); the rebuild derives the bulge
in closed form from rotation geometry and smooths it with one exact
screened-Poisson (DCT) solve — two cheap, batched, TPU-exact steps instead of
an iterative sparse solve:

For a neighborhood rotating by angle theta between phi0 and phi1, the true
half-time position is the ARC midpoint, while the halfway domain stores the
CHORD midpoint p. With v the half-chord, elementary circle geometry gives

    bulge b*(p) = tan(theta/4) * R(-90) v(p),

where theta(p) is the rotation angle of the local map phi1 o phi0^{-1}
(polar-decomposition angle of J = (I + Dv)(I - Dv)^{-1}). The quadratic path

    x_t(p) = p + (2t - 1) v(p) + 4 t (1 - t) b(p)

then passes through the arc midpoint at t = 1/2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import SynthParams
from videomorphing_tpu.ops.poisson import screened_poisson_dct


def _field_jacobian(v: jnp.ndarray) -> jnp.ndarray:
    """Central-difference Jacobian Dv, (H, W, 2, 2): Dv[i, j] = d v_i / d x_j
    with axis order (y, x)."""
    def cdiff(f, axis):
        g = (jnp.roll(f, -1, axis) - jnp.roll(f, 1, axis)) * 0.5
        if axis == 0:
            g = g.at[0].set(f[1] - f[0]).at[-1].set(f[-1] - f[-2])
        else:
            g = g.at[:, 0].set(f[:, 1] - f[:, 0]).at[:, -1].set(f[:, -1] - f[:, -2])
        return g

    dvy_dy = cdiff(v[..., 0], 0)
    dvy_dx = cdiff(v[..., 0], 1)
    dvx_dy = cdiff(v[..., 1], 0)
    dvx_dx = cdiff(v[..., 1], 1)
    row0 = jnp.stack([dvy_dy, dvy_dx], axis=-1)
    row1 = jnp.stack([dvx_dy, dvx_dx], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotation_angle_map(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle theta(p) of the local map phi1 o phi0^{-1}, (H, W).

    J = (I + Dv)(I - Dv)^{-1}; theta = atan2(J10 - J01, J00 + J11), the polar
    decomposition angle (exact for similarity maps, least-squares otherwise).
    """
    dv = _field_jacobian(v)
    eye = jnp.eye(2, dtype=v.dtype)
    a = eye + dv
    b = eye - dv
    det_b = b[..., 0, 0] * b[..., 1, 1] - b[..., 0, 1] * b[..., 1, 0]
    det_b = jnp.where(jnp.abs(det_b) < 1e-6, 1e-6, det_b)
    binv = (
        jnp.stack(
            [
                jnp.stack([b[..., 1, 1], -b[..., 0, 1]], -1),
                jnp.stack([-b[..., 1, 0], b[..., 0, 0]], -1),
            ],
            -2,
        )
        / det_b[..., None, None]
    )
    j = jnp.einsum("...ik,...kj->...ij", a, binv)
    return jnp.arctan2(j[..., 1, 0] - j[..., 0, 1], j[..., 0, 0] + j[..., 1, 1])


def bulge_field(v: jnp.ndarray, sp: SynthParams = SynthParams()) -> jnp.ndarray:
    """Per-pixel quadratic-path bulge b(p), (H, W, 2).

    Closed-form rotational bulge, clamped for robustness (theta -> pi blows
    tan up at folds/occlusion edges), then smoothed by a screened Poisson so
    the path field is as smooth as the reference's LLS solution.
    """
    theta = rotation_angle_map(v)
    coef = jnp.tan(jnp.clip(theta, -2.8, 2.8) * 0.25)
    # R(-90) in (y, x) component order: (uy, ux) -> (ux, -uy)
    perp = jnp.stack([v[..., 1], -v[..., 0]], axis=-1)
    bstar = coef[..., None] * perp
    norm = jnp.linalg.norm(bstar, axis=-1, keepdims=True)
    bstar = bstar * (jnp.minimum(norm, sp.max_bulge) / jnp.maximum(norm, 1e-12))
    b = screened_poisson_dct(bstar, alpha=1.0, mu=sp.path_smooth_mu)
    return b.astype(v.dtype)


@functools.lru_cache(maxsize=None)
def jitted_bulge_field(sp: SynthParams):
    """Cached jitted :func:`bulge_field` (keyed by SynthParams)."""
    return jax.jit(lambda v: bulge_field(v, sp))
