"""The morph energy E(v) on the halfway domain.

E(v) = mean_p E_SIM(p)                       [TOG14 s3.1]
     + lambda_tps * mean_p E_TPS(p)          [TOG14 s3.2]
     + gamma_ui   * mean_p w_ui |v - v_ui|^2 [TOG14 s3.3]
     + beta_tc    * mean_p w_tc |v - v_tc|^2 [EGSR14 s4]

with the halfway warp w0(p) = I0(p - v(p)), w1(p) = I1(p + v(p)). All terms
are pixel-means so weights transfer unchanged across pyramid levels.

This module is pure jnp and fully differentiable: ``jax.grad(total_energy)``
is the oracle gradient the fast analytic path (and the Pallas sweep) are
tested against (SURVEY.md section 5 "Kernel equivalence").
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.ops.resample import bilinear_sample, grid_coords
from videomorphing_tpu.ops.ssim import dssim_map


class LevelData(NamedTuple):
    """Per-pyramid-level inputs of the optimization (all device arrays).

    The reference keeps the analogous buffers resident on the GPU across
    sweeps (SURVEY.md section 4 stack B); here they live in one pytree that
    stays on-device through the jitted level solve.
    """

    i0: jnp.ndarray     # (H, W, C) image 0 at this level
    i1: jnp.ndarray     # (H, W, C) image 1
    ui_w: jnp.ndarray   # (H, W, 1) user-constraint weight map
    ui_v: jnp.ndarray   # (H, W, 2) user-constraint target field
    tc_w: jnp.ndarray   # (H, W, 1) temporal-coherence weight map (video)
    tc_v: jnp.ndarray   # (H, W, 2) temporally propagated target field


def make_level_data(i0, i1, ui_w=None, ui_v=None, tc_w=None, tc_v=None) -> LevelData:
    h, w = i0.shape[0], i0.shape[1]
    dt = i0.dtype
    z1 = jnp.zeros((h, w, 1), dt)
    z2 = jnp.zeros((h, w, 2), dt)
    return LevelData(
        i0=i0,
        i1=i1,
        ui_w=z1 if ui_w is None else ui_w,
        ui_v=z2 if ui_v is None else ui_v,
        tc_w=z1 if tc_w is None else tc_w,
        tc_v=z2 if tc_v is None else tc_v,
    )


def warp_pair(i0: jnp.ndarray, i1: jnp.ndarray, v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Halfway warps: w0(p) = I0(p - v(p)), w1(p) = I1(p + v(p)) [TOG14 s3]."""
    g = grid_coords(i0.shape[0], i0.shape[1], dtype=v.dtype)
    return bilinear_sample(i0, g - v), bilinear_sample(i1, g + v)


def tps_maps(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Second-difference maps (vxx, vxy, vyy), zero where the stencil leaves
    the domain. Each is (H, W, 2)."""
    h, w = v.shape[0], v.shape[1]

    vxx = jnp.zeros_like(v)
    vxx = vxx.at[:, 1:-1].set(v[:, 2:] - 2.0 * v[:, 1:-1] + v[:, :-2])
    vyy = jnp.zeros_like(v)
    vyy = vyy.at[1:-1, :].set(v[2:] - 2.0 * v[1:-1] + v[:-2])
    vxy = jnp.zeros_like(v)
    vxy = vxy.at[1:-1, 1:-1].set(
        0.25 * (v[2:, 2:] - v[2:, :-2] - v[:-2, 2:] + v[:-2, :-2])
    )
    return vxx, vxy, vyy


def tps_energy_map(v: jnp.ndarray) -> jnp.ndarray:
    """E_TPS(p) = |v_xx|^2 + 2 |v_xy|^2 + |v_yy|^2, (H, W) [TOG14 s3.2]."""
    vxx, vxy, vyy = tps_maps(v)
    return jnp.sum(vxx * vxx + 2.0 * vxy * vxy + vyy * vyy, axis=-1)


def energy_terms(v: jnp.ndarray, data: LevelData, p: MorphParams) -> Dict[str, jnp.ndarray]:
    """All energy terms as scalars (each already weight-multiplied)."""
    w0, w1 = warp_pair(data.i0, data.i1, v)
    e_sim = jnp.mean(
        dssim_map(
            w0,
            w1,
            window=p.ssim_window,
            sigma=p.ssim_sigma,
            c1=p.ssim_c1,
            c2=p.ssim_c2,
            use_luminance=p.ssim_use_luminance,
        )
    )
    e_tps = p.lambda_tps * jnp.mean(tps_energy_map(v))
    dv_ui = v - data.ui_v
    e_ui = p.gamma_ui * jnp.mean(data.ui_w * jnp.sum(dv_ui * dv_ui, axis=-1, keepdims=True))
    dv_tc = v - data.tc_v
    e_tc = p.beta_tc * jnp.mean(data.tc_w * jnp.sum(dv_tc * dv_tc, axis=-1, keepdims=True))
    return dict(sim=e_sim, tps=e_tps, ui=e_ui, tc=e_tc)


def total_energy(v: jnp.ndarray, data: LevelData, p: MorphParams) -> jnp.ndarray:
    t = energy_terms(v, data, p)
    return t["sim"] + t["tps"] + t["ui"] + t["tc"]
