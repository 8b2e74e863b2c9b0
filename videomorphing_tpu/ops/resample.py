"""Bilinear sampling and coordinate grids.

TPU notes: the per-pixel warp ``I(p +/- v(p))`` is an arbitrary 2-D gather.
We flatten it into a 1-D row gather over ``(H*W, C)`` — the embedding-lookup
shape XLA:TPU lowers efficiently — plus a 4-tap lerp. This is the rebuild of
the reference's CUDA texture fetches (SURVEY.md section 2 layer L0); TPUs have
no texture units, so the gather is hoisted out of the Pallas kernels and left
to XLA while the window/stencil math is fused (SURVEY.md section 8 stage 4).

Conventions used across the package:
- images are ``(H, W, C)`` float, fields are ``(H, W, 2)`` with the last axis
  ordered ``(dy, dx)`` (row, col);
- coordinates are pixel-center based: pixel (i, j) sits at coords (i, j).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_coords(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinate grid, shape (H, W, 2) ordered (y, x)."""
    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return jnp.stack([ys, xs], axis=-1)


def inside_mask(coords: jnp.ndarray, h: int, w: int, margin: float = 0.0) -> jnp.ndarray:
    """1.0 where (y, x) falls inside the image rectangle, else 0.0.

    ``coords``: (..., 2) in (y, x). Used for validity/disocclusion masks in
    blending ([TOG14] section 5.2).
    """
    y = coords[..., 0]
    x = coords[..., 1]
    ok = (
        (y >= margin)
        & (y <= (h - 1) - margin)
        & (x >= margin)
        & (x <= (w - 1) - margin)
    )
    return ok.astype(coords.dtype)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample ``img`` (H, W, C) at ``coords`` (..., 2) in (y, x).

    Out-of-range coordinates are clamped to the edge (the validity of samples
    is tracked separately via :func:`inside_mask`). Differentiable in both
    ``img`` and ``coords``.
    """
    h, w = img.shape[0], img.shape[1]
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    c = img.shape[-1]

    y = jnp.clip(coords[..., 0], 0.0, h - 1.0)
    x = jnp.clip(coords[..., 1], 0.0, w - 1.0)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    flat = img.reshape(h * w, c)
    out_shape = coords.shape[:-1]

    def take(yi, xi):
        idx = (yi * w + xi).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(out_shape + (c,))

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)

    fy = fy[..., None]
    fx = fx[..., None]
    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    out = top + (bot - top) * fy
    if squeeze:
        out = out[..., 0]
    return out


def bilinear_sample_with_grad(img: jnp.ndarray, coords: jnp.ndarray):
    """Bilinear sample plus the EXACT derivative of the interpolant.

    Returns ``(value, dval)`` with ``value``: (..., C) and ``dval``:
    (..., C, 2) = d value / d (y, x). Matches jax.grad of
    :func:`bilinear_sample` w.r.t. coords (the in-cell finite difference of
    corner values), with zero derivative where the coordinate is clamped
    outside the domain. The solver's analytic gradient path uses this instead
    of autodiff so the Pallas sweep can reproduce it exactly (SURVEY.md
    section 8 stage 4).
    """
    h, w = img.shape[0], img.shape[1]
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    c = img.shape[-1]

    y_raw = coords[..., 0]
    x_raw = coords[..., 1]
    y = jnp.clip(y_raw, 0.0, h - 1.0)
    x = jnp.clip(x_raw, 0.0, w - 1.0)
    # derivative of clip: 1 inside, 0 where clamped (match autodiff's
    # zero-gradient saturation)
    dy_ok = ((y_raw > 0.0) & (y_raw < h - 1.0)).astype(img.dtype)
    dx_ok = ((x_raw > 0.0) & (x_raw < w - 1.0)).astype(img.dtype)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    flat = img.reshape(h * w, c)
    out_shape = coords.shape[:-1]

    def take(yi, xi):
        idx = (yi * w + xi).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(out_shape + (c,))

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)

    fy_ = fy[..., None]
    fx_ = fx[..., None]
    top = v00 + (v01 - v00) * fx_
    bot = v10 + (v11 - v10) * fx_
    val = top + (bot - top) * fy_

    dval_dy = (bot - top) * dy_ok[..., None]
    dval_dx = ((v01 - v00) * (1.0 - fy_) + (v11 - v10) * fy_) * dx_ok[..., None]
    dval = jnp.stack([dval_dy, dval_dx], axis=-1)
    if squeeze:
        val = val[..., 0]
        dval = dval[..., 0, :]
    return val, dval


def bicubic_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Catmull-Rom bicubic sampling of ``img`` (H, W, C) at (..., 2) (y, x).

    Keys' cubic convolution with a = -0.5 — the classic high-quality
    resampling filter (sharper than bilinear, no ringing worth speaking of
    on natural images). 16 taps as 16 row gathers over the same flattened
    (H*W, C) layout as :func:`bilinear_sample`; ~4x the gather cost, so
    this is the *final render* quality option (SynthParams.sampling), not
    the solver path — the solver's SSIM window statistics are insensitive
    to the interpolant (SURVEY.md section 2 L0 wishlist row).

    Out-of-range coordinates clamp to the edge; tap indices clamp per-tap
    (equivalent to edge-replicated padding).
    """
    h, w = img.shape[0], img.shape[1]
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    c = img.shape[-1]

    y = jnp.clip(coords[..., 0], 0.0, h - 1.0)
    x = jnp.clip(coords[..., 1], 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def cubic_weights(f):
        # Catmull-Rom weights for taps at offsets (-1, 0, 1, 2)
        f2 = f * f
        f3 = f2 * f
        w_m1 = -0.5 * f3 + f2 - 0.5 * f
        w_0 = 1.5 * f3 - 2.5 * f2 + 1.0
        w_1 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
        w_2 = 0.5 * f3 - 0.5 * f2
        return (w_m1, w_0, w_1, w_2)

    wy = cubic_weights(fy)
    wx = cubic_weights(fx)

    flat = img.reshape(h * w, c)
    out_shape = coords.shape[:-1]

    def take(dy, dx):
        yi = jnp.clip(y0i + dy, 0, h - 1)
        xi = jnp.clip(x0i + dx, 0, w - 1)
        idx = (yi * w + xi).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(out_shape + (c,))

    out = jnp.zeros(out_shape + (c,), img.dtype)
    for iy, dy in enumerate((-1, 0, 1, 2)):
        row = jnp.zeros(out_shape + (c,), img.dtype)
        for ix, dx in enumerate((-1, 0, 1, 2)):
            row = row + wx[ix][..., None] * take(dy, dx)
        out = out + wy[iy][..., None] * row
    if squeeze:
        out = out[..., 0]
    return out


def sample_at(img: jnp.ndarray, base: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at ``base + offset`` — the halfway-domain warp.

    With ``base = grid_coords(H, W)`` this computes the warped image
    ``I-hat(p) = I(p + offset(p))`` of [TOG14] section 3.1 (``offset = -v``
    for image 0, ``+v`` for image 1).
    """
    return bilinear_sample(img, base + offset)


def image_gradients(img: jnp.ndarray) -> jnp.ndarray:
    """Central-difference spatial gradients.

    Returns (H, W, C, 2) with last axis (d/dy, d/dx); edges use one-sided
    differences. Used for the chain rule through the warp:
    d I(p+u)/du = grad-I at (p+u) (sampled from this precomputed field).
    """
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    gy = (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0)) * 0.5
    gx = (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1)) * 0.5
    # one-sided at edges
    gy = gy.at[0].set(img[1] - img[0]).at[-1].set(img[-1] - img[-2])
    gx = gx.at[:, 0].set(img[:, 1] - img[:, 0]).at[:, -1].set(img[:, -1] - img[:, -2])
    g = jnp.stack([gy, gx], axis=-1)
    if squeeze:
        g = g[:, :, 0, :]
    return g
