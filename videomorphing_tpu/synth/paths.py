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


def _field_jacobian_planes(v: jnp.ndarray):
    """Central-difference Jacobian entries of v as four (H, W) planes:
    (dvy/dy, dvy/dx, dvx/dy, dvx/dx), axis order (y, x).

    Planes, NOT an (H, W, 2, 2) tensor: trailing length-2 axes land in the
    minor tiling dims on TPU and pad 64x (a 4K morph hit a 7.9 GB HLO temp
    for a 127 MB logical array).
    """
    def cdiff(f, axis):
        g = (jnp.roll(f, -1, axis) - jnp.roll(f, 1, axis)) * 0.5
        if axis == 0:
            g = g.at[0].set(f[1] - f[0]).at[-1].set(f[-1] - f[-2])
        else:
            g = g.at[:, 0].set(f[:, 1] - f[:, 0]).at[:, -1].set(f[:, -1] - f[:, -2])
        return g

    return (
        cdiff(v[..., 0], 0), cdiff(v[..., 0], 1),
        cdiff(v[..., 1], 0), cdiff(v[..., 1], 1),
    )


def rotation_angle_map(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle theta(p) of the local map phi1 o phi0^{-1}, (H, W).

    J = (I + Dv)(I - Dv)^{-1}; theta = atan2(J10 - J01, J00 + J11), the polar
    decomposition angle (exact for similarity maps, least-squares otherwise).
    All 2x2 algebra is unrolled onto (H, W) planes (see
    :func:`_field_jacobian_planes` for why).
    """
    p00, p01, p10, p11 = _field_jacobian_planes(v)
    one = jnp.ones_like(p00)
    a00, a01, a10, a11 = one + p00, p01, p10, one + p11
    b00, b01, b10, b11 = one - p00, -p01, -p10, one - p11
    det_b = b00 * b11 - b01 * b10
    det_b = jnp.where(jnp.abs(det_b) < 1e-6, 1e-6, det_b)
    # J = a @ adj(b) / det(b); only J10 - J01 and J00 + J11 are needed
    j00 = (a00 * b11 - a01 * b10) / det_b
    j01 = (-a00 * b01 + a01 * b00) / det_b
    j10 = (a10 * b11 - a11 * b10) / det_b
    j11 = (-a10 * b01 + a11 * b00) / det_b
    return jnp.arctan2(j10 - j01, j00 + j11)


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
