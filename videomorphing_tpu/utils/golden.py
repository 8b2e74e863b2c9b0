"""Golden-field midpoint fidelity: the in-repo stand-in for the BASELINE
"SSIM >= 0.99 vs reference" gate.

The reference mount has been empty every session (SURVEY.md section 0), so
no reference renders exist to diff against. This module substitutes the
strongest check that needs no reference: synthetic pairs whose TRUE halfway
field and TRUE midpoint frame are known in closed form. The images are sums
of band-limited cosine waves — pure functions of (y, x) — so ``i0``, ``i1``
and the analytic midpoint are all EXACT point evaluations (no interpolation
error contaminates the ground truth).

Cases (derivations in the docstrings):

- ``translation``: I1 is I0 shifted by 2u. True field v(p) = u everywhere;
  true midpoint frame M(q) = tex(q - u). Exact for linear AND quadratic
  paths (the bulge of a translation is ~0).
- ``rotation``: I1 is I0 rotated by 2*theta about the center. Choosing the
  correspondence phi0 = R(-theta)x, phi1 = R(theta)x gives halfway points
  p = cos(theta) x, hence v(p) = tan(theta) J (p - c) (J = +90-degree
  rotation). Under the TRUE circular arcs each point passes through x at
  t = 0.5, so the true midpoint frame is I0 rotated by theta:
  M(q) = tex(R(-theta)(q - c) + c). The quadratic-path bulge approximates
  exactly this arc ([TOG14 s5.1]) — this case exercises solver + paths +
  renderer end-to-end against an analytic truth.
- ``scale``: I1 is I0 zoomed by k about the center. True field
  v(p) = ((k-1)/(k+1))(p - c) — divergent where rotation is solenoidal and
  translation constant; zoom paths are straight, so the bulge must vanish.

Unlike the endpoint SSIM (which a wrong-but-smooth field passes, VERDICT
round 1), a field error here directly misplaces texture in the midpoint
frame and the SSIM drops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class GoldenCase(NamedTuple):
    i0: jnp.ndarray        # (H, W, C)
    i1: jnp.ndarray        # (H, W, C)
    mid_true: jnp.ndarray  # (H, W, C) analytic frame at t = 0.5
    v_true: jnp.ndarray    # (H, W, 2) analytic halfway field
    crop: int              # interior-crop margin for metrics (boundary_lock
    #                        pins the solved field at edges where v_true != 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _texture(key, ys, xs, channels: int = 3, n_waves: int = 24,
             min_period: float = 10.0, max_period: float = 80.0) -> jnp.ndarray:
    """Band-limited random texture evaluated at arbitrary float coords.

    tex(y, x) = 0.5 + sum_k a_k cos(wy_k y + wx_k x + psi_k), per channel,
    amplitudes normalized so values stay in [0, 1]. A pure function of the
    coordinates — warped evaluations are exact, never resampled. Jitted:
    the eager form paid ~6 min of tunnel latency per case on the TPU
    backend (measured).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    period = jnp.exp(
        jax.random.uniform(
            k1, (channels, n_waves),
            minval=float(np.log(min_period)), maxval=float(np.log(max_period)),
        )
    )
    ang = jax.random.uniform(k2, (channels, n_waves), minval=0.0, maxval=2.0 * np.pi)
    omega = 2.0 * np.pi / period
    wy = omega * jnp.sin(ang)
    wx = omega * jnp.cos(ang)
    psi = jax.random.uniform(k3, (channels, n_waves), minval=0.0, maxval=2.0 * np.pi)
    amp = jax.random.uniform(k4, (channels, n_waves), minval=0.5, maxval=1.0)
    amp = 0.48 * amp / jnp.sum(amp, axis=1, keepdims=True)

    # (H, W, C): sum over waves of a cos(wy*y + wx*x + psi)
    phase = (
        ys[..., None, None] * wy + xs[..., None, None] * wx + psi
    )  # (H, W, C, K)
    return 0.5 + jnp.sum(amp * jnp.cos(phase), axis=-1)


def translation_case(
    h: int = 256, w: int = 256, shift: Tuple[float, float] = (2.5, 4.0),
    seed: int = 0, channels: int = 3,
) -> GoldenCase:
    """I1(q) = tex(q - 2u): true v = u, true midpoint M(q) = tex(q - u)."""
    key = jax.random.PRNGKey(seed)
    uy, ux = float(shift[0]), float(shift[1])
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.ones((h, 1), jnp.float32) * jnp.arange(w, dtype=jnp.float32)[None, :]
    i0 = _texture(key, ys, xs, channels)
    i1 = _texture(key, ys - 2.0 * uy, xs - 2.0 * ux, channels)
    mid = _texture(key, ys - uy, xs - ux, channels)
    v_true = jnp.broadcast_to(jnp.asarray([uy, ux], jnp.float32), (h, w, 2))
    crop = int(np.ceil(2 * max(abs(uy), abs(ux)))) + 12
    return GoldenCase(i0=i0, i1=i1, mid_true=mid, v_true=v_true, crop=crop)


def rotation_case(
    h: int = 256, w: int = 256, theta: float = 0.04, seed: int = 1,
    channels: int = 3,
) -> GoldenCase:
    """I1 = I0 rotated by 2*theta about the center; arcs pass through the
    theta-rotation at t = 0.5 (see module docstring for the derivation)."""
    key = jax.random.PRNGKey(seed)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.ones((h, 1), jnp.float32) * jnp.arange(w, dtype=jnp.float32)[None, :]
    ry, rx = ys - cy, xs - cx

    def rot_coords(a):
        c, s = float(np.cos(a)), float(np.sin(a))
        # rotate the SAMPLING coordinates by -a to rotate the image by +a
        return cy + c * ry + s * rx, cx - s * ry + c * rx

    i0 = _texture(key, ys, xs, channels)
    i1 = _texture(key, *rot_coords(2.0 * theta), channels)
    mid = _texture(key, *rot_coords(theta), channels)
    # phi0(p) = (cos t I - S)(p-c)/cos t with S the sampling rotation above;
    # v = p - phi0 gives v_y = -tan(t) rx, v_x = +tan(t) ry
    t = float(np.tan(theta))
    v_true = jnp.stack([-t * rx, t * ry], axis=-1)
    max_disp = 2.0 * abs(theta) * float(np.hypot(cy, cx))
    crop = int(np.ceil(max_disp)) + 12
    return GoldenCase(i0=i0, i1=i1, mid_true=mid, v_true=v_true, crop=crop)


def scale_case(
    h: int = 256, w: int = 256, k: float = 1.1, seed: int = 2,
    channels: int = 3,
) -> GoldenCase:
    """I1 is I0 zoomed by factor ``k`` about the center — a DIVERGENT true
    field, complementing translation (constant) and rotation (solenoidal).

    Derivation: the zoom correspondence is x1 = c + k (x0 - c). The halfway
    point is p = (x0 + x1)/2 = c + (1+k)/2 (x0 - c), so

        v(p) = (x1 - x0)/2 = ((k-1)/(k+1)) (p - c),
        phi0(p) = c + 2/(k+1) (p - c),   phi1(p) = c + 2k/(k+1) (p - c).

    With I0(q) = tex(q) and I1(q) = tex(c + (q - c)/k), both warped sources
    evaluate to tex(c + 2/(k+1)(q - c)) at the halfway point — the exact
    midpoint frame. Zoom trajectories are straight lines (points move
    radially), so the linear-path midpoint IS the truth and the quadratic
    bulge of a curl-free field should vanish — this case catches a bulge
    solver that hallucinates rotation from divergence.
    """
    key = jax.random.PRNGKey(seed)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.ones((h, 1), jnp.float32) * jnp.arange(w, dtype=jnp.float32)[None, :]
    ry, rx = ys - cy, xs - cx

    i0 = _texture(key, ys, xs, channels)
    i1 = _texture(key, cy + ry / k, cx + rx / k, channels)
    a_mid = 2.0 / (k + 1.0)
    mid = _texture(key, cy + a_mid * ry, cx + a_mid * rx, channels)
    alpha = (k - 1.0) / (k + 1.0)
    v_true = jnp.stack([alpha * ry, alpha * rx], axis=-1)
    max_disp = abs(k - 1.0) * float(np.hypot(cy, cx))
    crop = int(np.ceil(max_disp)) + 12
    return GoldenCase(i0=i0, i1=i1, mid_true=mid, v_true=v_true, crop=crop)


def ssim(a: jnp.ndarray, b: jnp.ndarray, crop: int = 0) -> float:
    from videomorphing_tpu.ops.ssim import dssim_map

    if crop:
        sl = (slice(crop, -crop), slice(crop, -crop))
        a, b = a[sl], b[sl]
    return 1.0 - float(jnp.mean(dssim_map(a, b)))


def run_golden(
    case: str = "translation",
    hw: Tuple[int, int] = (256, 256),
    mp=None,
    sp=None,
    seed: int = 0,
) -> dict:
    """Solve + render t=0.5 on a golden case; report SSIM vs the analytic
    midpoint and the field error vs the analytic field.

    Returns ``{"ssim_mid": ..., "v_err_mean": ..., "v_err_p99": ...,
    "case": ..., "crop": ...}``. The BASELINE gate analogue is
    ``ssim_mid >= 0.99``.
    """
    from videomorphing_tpu import api
    from videomorphing_tpu.config import MorphParams, SynthParams
    from videomorphing_tpu.models.image_morph import ImageMorpher

    mp = mp if mp is not None else MorphParams()
    sp = sp if sp is not None else SynthParams()
    h, w = hw
    if case == "translation":
        g = translation_case(h, w, seed=seed)
    elif case == "rotation":
        g = rotation_case(h, w, seed=seed)
    elif case == "scale":
        g = scale_case(h, w, seed=seed)
    else:
        raise ValueError(f"unknown golden case {case!r}")

    from videomorphing_tpu.ops.ssim import dssim_map
    from videomorphing_tpu.synth.render import render_frame

    morpher = ImageMorpher(mp, sp)
    art = morpher.solve(g.i0, g.i1)

    c = g.crop

    # render + metrics under ONE jit: the eager form pays ~30 ms tunnel
    # latency per op on this backend (PERF.md methodology) and takes minutes
    @jax.jit
    def measure(i0, i1, v, b, mid_true, v_true):
        frame = render_frame(i0, i1, v, b, 0.5, sp)
        sl = (slice(c, -c), slice(c, -c))
        s = 1.0 - jnp.mean(dssim_map(frame[sl], mid_true[sl]))
        err = jnp.linalg.norm(v[sl] - v_true[sl], axis=-1)
        return s, jnp.mean(err), jnp.percentile(err, 99.0)

    b = art.b if art.b is not None else jnp.zeros_like(art.v)
    s, e_mean, e_p99 = measure(g.i0, g.i1, art.v, b, g.mid_true, g.v_true)
    return {
        "case": case,
        "ssim_mid": round(float(s), 5),
        "v_err_mean": round(float(e_mean), 4),
        "v_err_p99": round(float(e_p99), 4),
        "crop": c,
    }
