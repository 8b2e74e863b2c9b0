"""Poisson-extended, occlusion-aware blending [TOG14 s5.2; EGSR14 s5].

Naive cross-dissolve bleeds backgrounds wherever one warped image has no
valid content (disocclusion, out-of-frame). Following the reference's
approach: each warped image is smoothly EXTENDED past its valid region
(membrane extension -> multiscale pull-push here, SURVEY.md section 1.4
item 3), then blended; optionally the blend runs in the gradient domain with
one exact DCT Poisson solve per frame ("poisson" mode).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from videomorphing_tpu.config import SynthParams
from videomorphing_tpu.ops.poisson import (
    divergence,
    forward_gradients,
    poisson_solve_dct,
    pull_push_extend,
)


def blend_weights(
    t: jnp.ndarray,
    m0: jnp.ndarray,
    m1: jnp.ndarray,
    conf0: Optional[jnp.ndarray] = None,
    conf1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-pixel weight of image 1 in the blend, (H, W).

    Starts from the morph time ``t``, then shifts toward the valid /
    un-occluded source ([EGSR14 s5] occlusion-aware blending): a source that
    is invalid (out of frame) or occluded loses its vote; where both are
    valid the weights reduce to (1-t, t).
    """
    a0 = (1.0 - t) * m0 * (conf0 if conf0 is not None else 1.0)
    a1 = t * m1 * (conf1 if conf1 is not None else 1.0)
    denom = a0 + a1
    return jnp.where(denom > 1e-6, a1 / jnp.maximum(denom, 1e-6), t)


def blend_extended(
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    m0: jnp.ndarray,
    m1: jnp.ndarray,
    t: jnp.ndarray,
    sp: SynthParams = SynthParams(),
    conf0: Optional[jnp.ndarray] = None,
    conf1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Blend two warped images with Poisson extension past invalid regions.

    ``w0, w1``: (H, W, C) warped images; ``m0, m1``: (H, W) validity masks;
    ``t``: scalar morph time. Returns the blended frame (H, W, C).
    """
    w = blend_weights(t, m0, m1, conf0, conf1)[..., None]

    # membrane extension of each source past its valid region
    e0 = pull_push_extend(w0, m0, n_levels=sp.extend_levels)
    e1 = pull_push_extend(w1, m1, n_levels=sp.extend_levels)

    lin = (1.0 - w) * e0 + w * e1
    if sp.blend_mode == "linear":
        return lin

    # SCREENED gradient-domain blend: min lam|x - lin|^2 + |grad x - g_mix|^2
    # i.e. (lam*I - Lap) x = lam*lin - div(g_mix). A pure Poisson on blended
    # gradients would flatten the intended cross-dissolve (with smooth
    # sources the mixed gradients are ~0 everywhere); the screening term
    # anchors low frequencies to the linear blend while high frequencies
    # follow the mixed gradients, suppressing seams [TOG14 s5.2].
    gy0, gx0 = forward_gradients(e0)
    gy1, gx1 = forward_gradients(e1)
    gy = (1.0 - w) * gy0 + w * gy1
    gx = (1.0 - w) * gx0 + w * gx1
    rhs = sp.blend_screen_lambda * lin - divergence(gy, gx)
    out = _screened_solve(rhs, sp.blend_screen_lambda)
    return jnp.clip(out, 0.0, 1.0)


def _screened_solve(rhs: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Solve (lam*I - Laplacian) x = rhs with Neumann BCs via DCT."""
    from videomorphing_tpu.ops.poisson import _neg_laplace_eigs, dct2, idct2

    h, w = rhs.shape[0], rhs.shape[1]
    eigs = _neg_laplace_eigs(h, w, rhs.dtype)
    if rhs.ndim > 2:
        eigs = eigs.reshape(eigs.shape + (1,) * (rhs.ndim - 2))
    return idct2(dct2(rhs) / (lam + eigs))
