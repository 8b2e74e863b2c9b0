"""Per-level descent: multi-color preconditioned updates with line search.

TPU-native counterpart of the reference's CUDA multi-color Gauss-Seidel
sweeps with per-pixel line search and foldover clamp (SURVEY.md sections 1.3
and 3 "GPU morph core"). Design mapping:

- the reference updates one checkerboard color at a time so neighbors never
  move together -> here each iteration masks the preconditioned descent
  direction to one color (``n_colors`` configurable; 1 = plain Jacobi);
- the reference's per-pixel 1-D line search -> a Gauss-Newton-style diagonal
  preconditioner (per-pixel, per-component step scaling) plus ONE global
  Armijo backtracking on the total energy, which guarantees monotone descent
  — a scalar ``lax.while_loop``, no data-dependent shapes;
- the foldover clamp [TOG14 s3.4] bounds each pixel's move to a fraction
  (< 1/2) of the current gap to its neighbors in BOTH warps, so two pixels
  moving simultaneously cannot cross.

Everything is static-shape jnp: one jit per pyramid-level shape, iterations
via ``lax.while_loop`` — the whole level solve stays on-device, matching the
HBM-residency requirement of BASELINE.json's north star.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.ops.resample import bilinear_sample_with_grad, grid_coords
from videomorphing_tpu.ops.ssim import dssim_grad_bundle
from videomorphing_tpu.ops.windows import gaussian_kernel_1d, separable_filter
from videomorphing_tpu.solver.energy import LevelData


class LevelStats(NamedTuple):
    """Per-level observability record (SURVEY.md section 6 metrics/logging)."""

    e0: jnp.ndarray              # initial energy
    e_final: jnp.ndarray         # final energy
    iters: jnp.ndarray           # iterations actually run
    step: jnp.ndarray            # final trust step
    energy_history: jnp.ndarray  # (max_iters,) energy after each iter (nan-padded)


def boundary_mask(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) mask locking v_x on left/right edges and v_y on top/bottom.

    This keeps boundary points sliding along their edge, the discrete form of
    the edge-to-edge boundary condition [TOG14 s3.4].
    """
    m = jnp.ones((h, w, 2), dtype)
    m = m.at[0, :, 0].set(0.0).at[-1, :, 0].set(0.0)     # vy locked on top/bottom
    m = m.at[:, 0, 1].set(0.0).at[:, -1, 1].set(0.0)     # vx locked on left/right
    return m


def color_mask(h: int, w: int, color: jnp.ndarray, n_colors: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 1) checkerboard mask for the given color index (traced ok)."""
    if n_colors == 1:
        return jnp.ones((h, w, 1), dtype)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if n_colors == 2:
        idx = (ys + xs) % 2
    elif n_colors == 4:
        idx = (ys % 2) * 2 + (xs % 2)
    else:
        raise ValueError("n_colors must be 1, 2 or 4")
    return (idx == color).astype(dtype)[..., None]


def _neighbor_gaps(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min gap (over both warps and both directions) per pixel and axis.

    For warp phi1 = p + v the x-gap to the right neighbor is
    ``1 + vx(y, x+1) - vx(y, x)``; for phi0 = p - v it is ``1 - (...)``.
    Folding means a gap reaching 0. Returns (m_y, m_x), each (H, W), >= 0.
    """
    vy = v[..., 0]
    vx = v[..., 1]

    def axis_gaps(comp, axis):
        fwd = jnp.diff(comp, axis=axis)                      # neighbor - self
        pad_lo = [(0, 0), (0, 0)]
        pad_hi = [(0, 0), (0, 0)]
        pad_lo[axis] = (1, 0)
        pad_hi[axis] = (0, 1)
        # replicate 0-diff at domain edges (no neighbor there)
        d_r = jnp.pad(fwd, pad_hi)                           # diff to next
        d_l = jnp.pad(fwd, pad_lo)                           # diff from prev
        g = jnp.minimum(
            jnp.minimum(1.0 + d_r, 1.0 - d_r),
            jnp.minimum(1.0 + d_l, 1.0 - d_l),
        )
        return jnp.maximum(g, 0.0)

    return axis_gaps(vy, 0), axis_gaps(vx, 1)


def foldover_scale(v: jnp.ndarray, d: jnp.ndarray, margin: float) -> jnp.ndarray:
    """Clamp a step ``d`` so ``v + d`` cannot fold either warp.

    Each pixel may cover at most ``margin`` (< 0.5) of its current minimum
    neighbor gap per axis; since any neighbor moving toward it obeys the same
    bound, the two together cover < 1 gap and cannot cross [TOG14 s3.4;
    SURVEY.md section 1.1].
    """
    m_y, m_x = _neighbor_gaps(v)
    tiny = jnp.asarray(1e-12, v.dtype)
    s_y = jnp.minimum(1.0, margin * m_y / (jnp.abs(d[..., 0]) + tiny))
    s_x = jnp.minimum(1.0, margin * m_x / (jnp.abs(d[..., 1]) + tiny))
    return jnp.stack([d[..., 0] * s_y, d[..., 1] * s_x], axis=-1)


class WarpBundle(NamedTuple):
    """Warp linearization point: warped images + interpolant derivatives.

    The XLA gather ``I(p -/+ v)`` is the priciest op on TPU (no texture
    units), so the solver re-warps only every ``MorphParams.relin_every``
    iterations and runs inner iterations on the first-order expansion
    ``w0 - dw0 (v - v_lin)`` / ``w1 + dw1 (v - v_lin)`` — the classic
    warping-scheme structure of TV-L1/Horn-Schunck solvers, applied to the
    halfway-domain energy (SURVEY.md section 1.3; the reference re-fetches
    textures every sweep because GPU texture fetches are ~free).
    """

    v_lin: jnp.ndarray  # (H, W, 2) linearization point
    w0: jnp.ndarray     # (H, W, C) I0(p - v_lin)
    dw0: jnp.ndarray    # (H, W, C, 2) exact interpolant derivative
    w1: jnp.ndarray     # (H, W, C) I1(p + v_lin)
    dw1: jnp.ndarray    # (H, W, C, 2)


def warp_bundle(v: jnp.ndarray, data: LevelData) -> WarpBundle:
    """Re-warp both images at ``v`` (the expensive XLA gather)."""
    g = grid_coords(data.i0.shape[0], data.i0.shape[1], dtype=v.dtype)
    w0, dw0 = bilinear_sample_with_grad(data.i0, g - v)
    w1, dw1 = bilinear_sample_with_grad(data.i1, g + v)
    return WarpBundle(v_lin=v, w0=w0, dw0=dw0, w1=w1, dw1=dw1)


def warp_bundle_fused(v: jnp.ndarray, src0, src1, prescreen: bool = False) -> WarpBundle:
    """Re-warp via the fused Pallas warp kernel (pallas.warp), with the
    exact XLA gather as automatic fallback for wild fields."""
    from videomorphing_tpu.pallas.warp import fused_warp_pair

    w0, dw0, w1, dw1 = fused_warp_pair(src0, src1, v, prescreen=prescreen)
    return WarpBundle(v_lin=v, w0=w0, dw0=dw0, w1=w1, dw1=dw1)


def linearized_warps(wb: WarpBundle, v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-order warped images at ``v`` around ``wb.v_lin`` (exact at v_lin)."""
    dv = v - wb.v_lin
    w0 = wb.w0 - jnp.einsum("hwck,hwk->hwc", wb.dw0, dv)
    w1 = wb.w1 + jnp.einsum("hwck,hwk->hwc", wb.dw1, dv)
    return w0, w1


def total_energy_planes(w0, w1, v, data: LevelData, p: MorphParams) -> jnp.ndarray:
    """Total energy from precomputed (possibly linearized) warp planes.

    jnp oracle of ``pallas.sweep.fused_total_energy_planes``; equals
    ``solver.energy.total_energy`` when ``(w0, w1)`` are exact warps at v.
    """
    from videomorphing_tpu.ops.ssim import dssim_map
    from videomorphing_tpu.solver.energy import tps_energy_map

    e_sim = jnp.mean(
        dssim_map(
            w0, w1,
            window=p.ssim_window, sigma=p.ssim_sigma,
            c1=p.ssim_c1, c2=p.ssim_c2, use_luminance=p.ssim_use_luminance,
        )
    )
    e_tps = p.lambda_tps * jnp.mean(tps_energy_map(v))
    dv_ui = v - data.ui_v
    e_ui = p.gamma_ui * jnp.mean(data.ui_w * jnp.sum(dv_ui * dv_ui, -1, keepdims=True))
    dv_tc = v - data.tc_v
    e_tc = p.beta_tc * jnp.mean(data.tc_w * jnp.sum(dv_tc * dv_tc, -1, keepdims=True))
    return e_sim + e_tps + e_ui + e_tc


def energy_value_grad_precond(
    v: jnp.ndarray, data: LevelData, p: MorphParams
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Analytic E(v), dE/dv and a diagonal preconditioner, in one pass.

    Chain rule through the halfway warp: with w0 = I0(p - v), w1 = I1(p + v),

        dE/dv(p) = -sum_c g0(p,c) * dI0/d(y,x)|_{p-v}  +  sum_c g1(p,c) * dI1|_{p+v}
                   + TPS adjoint + quadratic (UI/TC) terms,

    where g0/g1 are the analytic SSIM image-gradients (ops.ssim) and dI/d(y,x)
    the exact bilinear-interpolant derivative (ops.resample). Tested against
    ``jax.grad(total_energy)`` in tests/test_solver.py.

    The preconditioner is a Gauss-Newton diagonal: data curvature
    ~ 2|dI|^2 / (var0+var1+c2) window-averaged, plus the exact diagonals of
    the TPS/UI/TC quadratic forms. This is the rebuild of the reference's
    per-pixel step scaling (SURVEY.md section 1.3).
    """
    h, w = data.i0.shape[0], data.i0.shape[1]
    g = grid_coords(h, w, dtype=v.dtype)
    w0, dw0 = bilinear_sample_with_grad(data.i0, g - v)   # dw0: (H, W, C, 2)
    w1, dw1 = bilinear_sample_with_grad(data.i1, g + v)
    return value_grad_precond_planes(w0, dw0, w1, dw1, v, data, p)


def value_grad_precond_planes(
    w0, dw0, w1, dw1, v: jnp.ndarray, data: LevelData, p: MorphParams
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(E, dE/dv, precond) from precomputed warp planes.

    jnp oracle of ``pallas.sweep.fused_value_grad_precond_planes``.
    """
    h, w, c = data.i0.shape
    npix = h * w

    bundle = dssim_grad_bundle(
        w0, w1,
        window=p.ssim_window, sigma=p.ssim_sigma,
        c1=p.ssim_c1, c2=p.ssim_c2, use_luminance=p.ssim_use_luminance,
    )

    # --- data gradient: chain through the two warps --------------------
    g_sim = (
        -jnp.einsum("hwc,hwck->hwk", bundle.g0, dw0)
        + jnp.einsum("hwc,hwck->hwk", bundle.g1, dw1)
    )

    # --- TPS gradient (adjoint of the second-difference maps) -----------
    lam_n = p.lambda_tps / npix
    g_tps = lam_n * _tps_grad_unnormalized(v)

    # --- quadratic terms -------------------------------------------------
    g_ui = (2.0 * p.gamma_ui / npix) * data.ui_w * (v - data.ui_v)
    g_tc = (2.0 * p.beta_tc / npix) * data.tc_w * (v - data.tc_v)

    grad = g_sim + g_tps + g_ui + g_tc

    # --- diagonal preconditioner ----------------------------------------
    k = gaussian_kernel_1d(p.ssim_window, p.ssim_sigma, dtype=v.dtype)
    inv_b2 = 1.0 / bundle.b2                                # (H, W, C)
    curv_y = jnp.sum((dw0[..., 0] ** 2 + dw1[..., 0] ** 2) * inv_b2, axis=-1)
    curv_x = jnp.sum((dw0[..., 1] ** 2 + dw1[..., 1] ** 2) * inv_b2, axis=-1)
    curv = jnp.stack([curv_y, curv_x], axis=-1)             # (H, W, 2)
    curv = separable_filter(curv, k, k, mode="same_zero")
    p_sim = (2.0 / (npix * c)) * curv
    p_tps = lam_n * 25.0                                    # biharmonic diag
    p_quad = (2.0 / npix) * (p.gamma_ui * data.ui_w + p.beta_tc * data.tc_w)
    precond = p_sim + p_tps + p_quad + p.precond_eps / npix

    # energy value (reuses bundle)
    e_sim = bundle.energy
    from videomorphing_tpu.solver.energy import tps_energy_map  # local to avoid cycle

    e_tps = p.lambda_tps * jnp.mean(tps_energy_map(v))
    dv_ui = v - data.ui_v
    e_ui = p.gamma_ui * jnp.mean(data.ui_w * jnp.sum(dv_ui * dv_ui, -1, keepdims=True))
    dv_tc = v - data.tc_v
    e_tc = p.beta_tc * jnp.mean(data.tc_w * jnp.sum(dv_tc * dv_tc, -1, keepdims=True))
    energy = e_sim + e_tps + e_ui + e_tc
    return energy, grad, precond


def tps_adj_xx(a):
    """Self-adjoint second-difference stencil in x (shared with the
    row-sharded solver — parallel/spatial.py imports these three so the
    sharded and single-device TPS gradients can never drift apart)."""
    out = jnp.zeros_like(a)
    out = out.at[:, 1:].add(a[:, :-1])
    out = out.at[:, :].add(-2.0 * a)
    out = out.at[:, :-1].add(a[:, 1:])
    return out


def tps_adj_yy(a):
    out = jnp.zeros_like(a)
    out = out.at[1:, :].add(a[:-1, :])
    out = out.at[:, :].add(-2.0 * a)
    out = out.at[:-1, :].add(a[1:, :])
    return out


def tps_adj_xy(a):
    out = jnp.zeros_like(a)
    out = out.at[1:, 1:].add(0.25 * a[:-1, :-1])
    out = out.at[1:, :-1].add(-0.25 * a[:-1, 1:])
    out = out.at[:-1, 1:].add(-0.25 * a[1:, :-1])
    out = out.at[:-1, :-1].add(0.25 * a[1:, 1:])
    return out


def _tps_grad_unnormalized(v: jnp.ndarray) -> jnp.ndarray:
    """d/dv of sum_p (|vxx|^2 + 2|vxy|^2 + |vyy|^2) — self-adjoint stencils."""
    from videomorphing_tpu.solver.energy import tps_maps

    vxx, vxy, vyy = tps_maps(v)
    return 2.0 * tps_adj_xx(vxx) + 4.0 * tps_adj_xy(vxy) + 2.0 * tps_adj_yy(vyy)


def _resolve_backend(p: MorphParams, h: int, w: int) -> bool:
    """True -> fused Pallas kernels; False -> plain jnp (the oracle path)."""
    if p.backend == "jnp":
        return False
    if p.backend == "pallas":
        return True
    if p.backend != "auto":
        raise ValueError(f"unknown backend {p.backend!r}")
    import jax as _jax

    return _jax.default_backend() == "tpu" and h * w >= p.pallas_min_pixels


def make_level_solver(p: MorphParams, n_iters: int):
    """Build the jitted per-level solve: ``(v, data) -> (v', LevelStats)``.

    One compilation per level shape; the ``lax.while_loop`` keeps all state
    (field, warp planes, step, energy) device-resident for the whole level
    (SURVEY.md section 4, stack B). Structure per iteration:

    1. every ``p.relin_every`` iterations: re-warp I0/I1 at the current v
       (XLA gather) -> :class:`WarpBundle`;
    2. evaluate energy/gradient/preconditioner on the (linearized) warp
       planes — fused Pallas kernel on TPU, jnp twin elsewhere;
    3. masked preconditioned step (checkerboard color + boundary lock),
       foldover clamp, Armijo backtracking on the linearized energy.
    """

    def solve(v: jnp.ndarray, data: LevelData):
        h, w = v.shape[0], v.shape[1]
        C = data.i0.shape[-1]
        use_pallas = _resolve_backend(p, h, w)

        bmask = boundary_mask(h, w, v.dtype)
        hist0 = jnp.full((n_iters,), jnp.nan, v.dtype)
        if use_pallas and p.fused_warp:
            from videomorphing_tpu.pallas.warp import make_warp_source

            src0 = make_warp_source(data.i0)
            src1 = make_warp_source(data.i1)
            rewarp = lambda v_: warp_bundle_fused(v_, src0, src1, p.warp_prescreen)
        else:
            rewarp = lambda v_: warp_bundle(v_, data)

        # state = everything derived from the linearization point. Pallas:
        # ONE static packed plane stack per re-warp (both kernels read it;
        # per call only the 2 v planes repack — the XLA-side pack used to
        # cost ~half of each 1080p iteration). jnp oracle: the WarpBundle.
        if use_pallas:
            from videomorphing_tpu.pallas.sweep import (
                fused_total_energy_pack,
                fused_total_energy_split,
                fused_value_grad_precond_pack,
                fused_value_grad_precond_split,
                make_const_pack,
                make_sweep_pack,
                make_sweep_pack_planes,
                pack_v,
            )

            from videomorphing_tpu.pallas.sweep import quantize_v_lin

            packed_geom = None
            if p.fused_warp and p.warp_into_pack:
                from videomorphing_tpu.pallas.warp import packed_plane_geometry

                packed_geom = packed_plane_geometry(p, h, w)

            if packed_geom is not None:
                # split-pack mode: the warp kernel emits its planes straight
                # into the pack layout — per relin only the tiny v_lin pack
                # is rebuilt in XLA, the const planes pack once per level
                from videomorphing_tpu.pallas.warp import fused_warp_planes_packed

                x_const = make_const_pack(data, p)

                def make_state(v_):
                    v_q = quantize_v_lin(v_, p)
                    return (
                        fused_warp_planes_packed(src0, src1, v_q, p),
                        pack_v(v_q, p),
                    )

                grad_eval = lambda st_, v_: fused_value_grad_precond_split(
                    st_[0], st_[1], x_const, v_, (h, w), C, p
                )
                energy_eval = lambda st_, v_: fused_total_energy_split(
                    st_[0], st_[1], x_const, v_, (h, w), C, p
                )
            else:
                if p.fused_warp:
                    from videomorphing_tpu.pallas.warp import fused_warp_planes

                    def make_state(v_):
                        # bf16 packs: warp AT the rounded linearization point
                        # so the stored planes and stored v_lin stay
                        # consistent (quantize_v_lin is a no-op for f32)
                        v_q = quantize_v_lin(v_, p)
                        planes = fused_warp_planes(
                            src0, src1, v_q, prescreen=p.warp_prescreen
                        )
                        return make_sweep_pack_planes(planes, v_q, data, p)
                else:
                    def make_state(v_):
                        wb = rewarp(quantize_v_lin(v_, p))
                        return make_sweep_pack(wb.w0, wb.dw0, wb.w1, wb.dw1, wb.v_lin, data, p)

                grad_eval = lambda st_, v_: fused_value_grad_precond_pack(st_, v_, (h, w), C, p)
                energy_eval = lambda st_, v_: fused_total_energy_pack(st_, v_, (h, w), C, p)
        else:
            make_state = rewarp

            def grad_eval(wb_, v_):
                w0e, w1e = linearized_warps(wb_, v_)
                return value_grad_precond_planes(w0e, wb_.dw0, w1e, wb_.dw1, v_, data, p)

            def energy_eval(wb_, v_):
                w0e, w1e = linearized_warps(wb_, v_)
                return total_energy_planes(w0e, w1e, v_, data, p)

        if n_iters <= 0:
            # degenerate static case: no iterations — report the energy at
            # the initial field and return it unchanged
            st0 = make_state(v)
            e0 = energy_eval(st0, v)
            return v, LevelStats(
                e0=e0, e_final=e0, iters=jnp.int32(0),
                step=jnp.asarray(p.init_step, v.dtype), energy_history=hist0,
            )

        relin = max(int(p.relin_every), 1)

        def cond(state):
            v_, step_, e_, stall_, it_, _hist, _e0 = state
            return (it_ < n_iters) & (stall_ <= p.n_colors) & (step_ > p.min_step)

        # Two-level loop: the OUTER body rebuilds the linearization state
        # once per block of ``relin`` iterations; the INNER loop closes
        # over it. Keeping the (large) state out of the inner carry matters:
        # carrying it through a per-iteration relin cond made XLA copy the
        # whole packed stack every iteration (~2.4 ms at 1080p, traced).
        def body_iter(st_, state):
            v_, step_, e_, stall_, it_, hist, e0_ = state
            e_cur, grad, precond = grad_eval(st_, v_)
            # the pre-iteration energy at the initial field, recorded on the
            # first iteration (grad_eval returns the energy at the current
            # linearization point — at it_ == 0 that IS e0). Capturing it
            # here lets the level run without an eager pre-loop make_state +
            # energy_eval: one less energy kernel per level and no ~150 MB
            # plane stack alive outside the loop (measured wall-neutral on
            # chip — XLA had already deduplicated the eager state; PERF.md
            # round 5 second session).
            e0_ = jnp.where(it_ == 0, e_cur, e0_)

            cmask = color_mask(h, w, it_ % p.n_colors, p.n_colors, v_.dtype)
            d = (-grad / precond) * cmask * bmask
            d = foldover_scale(v_, d, p.fold_margin)
            gd = jnp.sum(grad * d)  # directional derivative (<= 0)

            def try_energy(alpha):
                return energy_eval(st_, v_ + alpha * d)

            def ls_cond(ls):
                alpha, e_try, tries = ls
                insufficient = e_try > e_cur + p.armijo_c * alpha * gd
                return insufficient & (tries < p.max_backtracks) & (alpha > p.min_step)

            def ls_body(ls):
                alpha, _e_try, tries = ls
                alpha = alpha * p.step_shrink
                return alpha, try_energy(alpha), tries + 1

            alpha0 = step_
            alpha, e_try, tries = jax.lax.while_loop(
                ls_cond, ls_body, (alpha0, try_energy(alpha0), jnp.int32(0))
            )
            accepted = e_try <= e_cur + p.armijo_c * alpha * gd
            v_new = jnp.where(accepted, v_ + alpha * d, v_)
            e_new = jnp.where(accepted, e_try, e_cur)
            step_new = jnp.where(
                accepted & (tries == 0),
                alpha * p.step_grow,
                jnp.where(accepted, alpha, alpha * p.step_shrink),
            )
            rel_dec = (e_cur - e_new) / jnp.maximum(jnp.abs(e_cur), 1e-12)
            stall_new = jnp.where(rel_dec < p.tol, stall_ + 1, 0)
            hist = hist.at[it_].set(e_new)
            return v_new, step_new, e_new, stall_new, it_ + 1, hist, e0_

        def outer_body(state):
            it0 = state[4]
            v_blk = state[0]
            if p.relin_median:
                # Sun-Roth-Black outlier rejection at the warp update: 3x3
                # per-component median of the field before re-linearizing
                # (config.relin_median). Locked boundary components are
                # held (bmask); skipped at it0 == 0 so st0 stays the state
                # of the INITIAL field. Energy bookkeeping needs no fixup:
                # body_iter re-evaluates e_cur from (st_, v_) anyway.
                from videomorphing_tpu.ops.windows import median3x3

                v_med = v_blk + (median3x3(v_blk) - v_blk) * bmask
                v_blk = jnp.where(it0 > 0, v_med, v_blk)
                state = (v_blk,) + state[1:]
            # unconditional: at it0 == 0 this is the initial linearization
            # (v_blk == v — the median above is skipped there), at later
            # blocks the relin. Replaces a lax.cond(it0 > 0, ...) over an
            # EAGER pre-loop st0; measured wall-neutral on chip (XLA had
            # already deduplicated the eager state into the loop) but the
            # graph is smaller and the loop-invariant stack no longer has
            # an eager twin (PERF.md round 5 second session).
            st_ = make_state(v_blk)

            def inner_cond(s):
                return cond(s) & (s[4] < it0 + relin)

            return jax.lax.while_loop(
                inner_cond, lambda s: body_iter(st_, s), state
            )

        zero_e = jnp.zeros((), v.dtype)
        state0 = (
            v, jnp.asarray(p.init_step, v.dtype), zero_e,
            jnp.int32(0), jnp.int32(0), hist0, zero_e,
        )
        v_f, step_f, e_f, _stall, it_f, hist_f, e0_f = jax.lax.while_loop(
            cond, outer_body, state0
        )
        return v_f, LevelStats(e0=e0_f, e_final=e_f, iters=it_f, step=step_f, energy_history=hist_f)

    return solve
