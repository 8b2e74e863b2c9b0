"""Fused sweep kernels: SSIM stats + analytic gradient + TPS stencil +
preconditioner + energy partials in single VMEM-resident Pallas passes.

The reference's CUDA `morph.cu` sweep gathers two warped SSIM windows, the
TPS stencil and the constraint terms per pixel and updates the field in one
kernel (SURVEY.md sections 1.3, 3, 4 stack B). The TPU rebuild splits at the
natural XLA boundary (SURVEY.md section 8 stage 4):

- the arbitrary-displacement warp ``I(p +/- v)`` stays an XLA gather
  (``ops.resample`` — TPUs have no texture units; the gather is a 1-D
  row-lookup XLA lowers well), producing warped images ``w0, w1`` and their
  exact interpolant derivatives ``dw0, dw1``;
- EVERYTHING windowed/stenciled/elementwise after the warp — 29 separable
  5-tap convolutions plus ~60 elementwise maps per gradient evaluation in
  the jnp oracle — is fused here into ONE pass over (TH, TW) VMEM tiles
  with halo reads, writing only the gradient, the preconditioner and four
  per-tile energy partial sums back to HBM.

Tiles are read with a halo of ``2*r`` pixels (r = window radius: stats need
r, the transpose convolution another r) via manual async DMA from an
HBM-resident packed plane stack; outputs are non-overlapping blocks. Zero
padding of the packed planes reproduces the oracle's `same_zero` window
sums exactly, and a separable ``1/n`` normalization plane (zeroed outside
the true domain) makes out-of-image window centers contribute exactly
nothing — matching the global computation bit-for-bit in structure.

Oracles (tests/test_pallas.py): ``solver.descent.energy_value_grad_precond``
and ``solver.energy.total_energy``.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.ops.resample import bilinear_sample, bilinear_sample_with_grad, grid_coords
from videomorphing_tpu.ops.windows import gaussian_kernel_1d
from videomorphing_tpu.solver.energy import LevelData

LANE = 128


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


def _auto_interpret(interpret):
    if interpret is not None:
        return bool(interpret)
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _tile_shape(h: int, w: int, halo: int) -> Tuple[int, int]:
    """Pick (TH, TW) so the haloed compute tile fills whole 128-lane vregs.

    The last (lane) dimension of the haloed tile is padded by Mosaic to a
    multiple of 128 — choosing TW = k*128 - 2*halo makes that padding free.
    """
    if w + 2 * halo <= LANE:
        tw = w
    else:
        tw = 2 * LANE - 2 * halo
    th = min(64, _round_up(h, 8))
    return th, tw


def _pack_dtype(p: MorphParams):
    """Storage dtype of the static pack (``MorphParams.pack_dtype``)."""
    if p.pack_dtype == "bfloat16":
        return jnp.bfloat16
    if p.pack_dtype == "float32":
        return jnp.float32
    raise ValueError(f"unknown pack_dtype {p.pack_dtype!r}")


def quantize_v_lin(v: jnp.ndarray, p: MorphParams) -> jnp.ndarray:
    """Round the linearization point to the pack's storage grid.

    In bf16 mode the warp MUST be evaluated at the rounded point so the
    stored warp planes and the stored ``v_lin`` describe the same point —
    the correction ``dv = v - v_lin`` (computed f32, per call) then absorbs
    the rounding exactly and the linearized model stays exact to first
    order. No-op in f32 mode.
    """
    dt = _pack_dtype(p)
    if dt == jnp.float32:
        return v
    return v.astype(dt).astype(v.dtype)


def _taps(p: MorphParams) -> List[float]:
    from videomorphing_tpu.ops.windows import _gaussian_np

    return [float(t) for t in _gaussian_np(int(p.ssim_window), float(p.ssim_sigma))]


def _invn_plane(h: int, w: int, p: MorphParams, dtype) -> jnp.ndarray:
    """1/n with n = separable zero-pad window sum of ones (== ops.ssim n)."""
    k = gaussian_kernel_1d(p.ssim_window, p.ssim_sigma, dtype=dtype)
    ny = jnp.convolve(jnp.ones((h,), dtype), k, mode="same")
    nx = jnp.convolve(jnp.ones((w,), dtype), k, mode="same")
    return 1.0 / (ny[:, None] * nx[None, :])


def _pack(planes: Sequence[jnp.ndarray], gy: int, gx: int, th: int, tw: int, halo: int) -> jnp.ndarray:
    """Stack planes, zero-pad, and materialize column groups.

    Mosaic requires HBM DMA slice offsets in the lane dimension to be
    128-aligned, so overlapping column windows cannot be sliced directly.
    Instead each tile's haloed column window (width tw + 2*halo, a multiple
    of 128 when gx > 1) is materialized contiguously by a single gather that
    XLA fuses with the pad — ~2*halo/tw (~3%) extra storage. Row halos stay
    implicit: row offsets i*th are 8-aligned, so rows are DMA-sliced.
    """
    h, w = planes[0].shape
    x = jnp.stack(planes, 0)
    x = jnp.pad(x, ((0, 0), (halo, gy * th - h + halo), (halo, gx * tw - w + halo)))
    if gx > 1:
        # concat of overlapping static slices, NOT jnp.take: gathers are
        # index-count bound on this TPU (~40-50 ms per 2M indices, PERF.md)
        # and the take lowered as a column gather — it was most of the
        # ~75 ms re-linearization pack at 1080p. Slices+concat is a pure
        # copy pipeline XLA lowers at HBM bandwidth.
        cg = tw + 2 * halo
        x = jnp.concatenate([x[:, :, i * tw : i * tw + cg] for i in range(gx)], axis=2)
    return x


# ----------------------------------------------------------------------------
# in-kernel tile math (all static-shape value ops on (hh, ww) f32 arrays)
# ----------------------------------------------------------------------------

def _wsum_tile(a, taps):
    """Separable zero-halo window sum; shrinks the halo by r on each side."""
    r = (len(taps) - 1) // 2
    hh, ww = a.shape
    acc = None
    for t, kt in enumerate(taps):
        sl = a[t : t + hh - 2 * r, :] * kt
        acc = sl if acc is None else acc + sl
    out = None
    for t, kt in enumerate(taps):
        sl = acc[:, t : t + ww - 2 * r] * kt
        out = sl if out is None else out + sl
    return out


def _mk_slicers(th: int, tw: int):
    def shift(a, m_from, m_to, dy=0, dx=0):
        oy = m_from - m_to + dy
        ox = m_from - m_to + dx
        return a[oy : oy + th + 2 * m_to, ox : ox + tw + 2 * m_to]

    def crop(a, m_from, m_to):
        return shift(a, m_from, m_to)

    return shift, crop


def _tps_maps_tile(V, M, shift, crop, r_from, m_out):
    """Second-difference maps (vxx, vyy, vxy) at halo ``m_out``.

    ``V``/``M``: field component / in-domain mask at halo ``r_from``
    (needs ``r_from >= m_out + 1``). Maps are masked to zero where the
    stencil crosses the true domain edge, matching
    ``solver.energy.tps_maps`` (M is a box indicator, so a product of
    shifted M equals the stencil-in-domain condition).
    """
    m_c = crop(M, r_from, m_out)
    m_l = shift(M, r_from, m_out, 0, -1)
    m_r = shift(M, r_from, m_out, 0, 1)
    m_u = shift(M, r_from, m_out, -1, 0)
    m_d = shift(M, r_from, m_out, 1, 0)
    m_ul = shift(M, r_from, m_out, -1, -1)
    m_ur = shift(M, r_from, m_out, -1, 1)
    m_dl = shift(M, r_from, m_out, 1, -1)
    m_dr = shift(M, r_from, m_out, 1, 1)

    v_c = crop(V, r_from, m_out)
    vxx = (shift(V, r_from, m_out, 0, 1) - 2.0 * v_c + shift(V, r_from, m_out, 0, -1)) * (m_l * m_c * m_r)
    vyy = (shift(V, r_from, m_out, 1, 0) - 2.0 * v_c + shift(V, r_from, m_out, -1, 0)) * (m_u * m_c * m_d)
    vxy = 0.25 * (
        shift(V, r_from, m_out, 1, 1)
        - shift(V, r_from, m_out, 1, -1)
        - shift(V, r_from, m_out, -1, 1)
        + shift(V, r_from, m_out, -1, -1)
    ) * (m_ul * m_ur * m_dl * m_dr)
    return vxx, vyy, vxy


def _tps_grad_tile(V, M, shift, crop, r2):
    """(grad_tps_unnormalized, tps_energy_map) for one field component.

    ``V``/``M`` at halo ``r2`` (>= 3). Maps at halo 2, then the
    self-adjoint stencils bring them to halo 0
    (``solver.descent._tps_grad_unnormalized``).
    """
    vxx, vyy, vxy = _tps_maps_tile(V, M, shift, crop, r2, 2)

    def st(a, dy, dx):
        return shift(a, 2, 0, dy, dx)

    adj_xx = st(vxx, 0, -1) - 2.0 * crop(vxx, 2, 0) + st(vxx, 0, 1)
    adj_yy = st(vyy, -1, 0) - 2.0 * crop(vyy, 2, 0) + st(vyy, 1, 0)
    adj_xy = 0.25 * (st(vxy, -1, -1) - st(vxy, -1, 1) - st(vxy, 1, -1) + st(vxy, 1, 1))
    grad = 2.0 * adj_xx + 4.0 * adj_xy + 2.0 * adj_yy

    e_map = crop(vxx, 2, 0) ** 2 + 2.0 * crop(vxy, 2, 0) ** 2 + crop(vyy, 2, 0) ** 2
    return grad, e_map


def _ssim_stats(a0, a1, inv_n, taps, c1, c2, use_lum):
    """Window stats -> per-pixel SSIM maps + gradient coefficient maps.

    Input arrays at halo m; outputs at halo m - r. Mirrors
    ``ops.ssim._dssim_grad_impl`` exactly (including the var clamp).
    """
    mu0 = _wsum_tile(a0, taps) * inv_n
    mu1 = _wsum_tile(a1, taps) * inv_n
    e00 = _wsum_tile(a0 * a0, taps) * inv_n
    e11 = _wsum_tile(a1 * a1, taps) * inv_n
    e01 = _wsum_tile(a0 * a1, taps) * inv_n
    var0 = jnp.maximum(e00 - mu0 * mu0, 0.0)
    var1 = jnp.maximum(e11 - mu1 * mu1, 0.0)
    cov = e01 - mu0 * mu1

    a2t = 2.0 * cov + c2
    b2t = var0 + var1 + c2
    if use_lum:
        a1t = 2.0 * mu0 * mu1 + c1
        b1t = mu0 * mu0 + mu1 * mu1 + c1
    else:
        a1t = jnp.ones_like(a2t)
        b1t = jnp.ones_like(a2t)
    denom = b1t * b2t
    s = (a1t * a2t) / denom

    ds_da2 = a1t / denom
    ds_db2 = -s / b2t
    if use_lum:
        ds_da1 = a2t / denom
        ds_db1 = -s / b1t
        c_mu0 = 2.0 * (ds_da1 * mu1 + ds_db1 * mu0)
        c_mu1 = 2.0 * (ds_da1 * mu0 + ds_db1 * mu1)
    else:
        c_mu0 = jnp.zeros_like(s)
        c_mu1 = jnp.zeros_like(s)
    c_var = ds_db2
    c_cov = 2.0 * ds_da2
    return dict(
        mu0=mu0, mu1=mu1, b2=b2t, s=s,
        c_mu0=c_mu0, c_mu1=c_mu1, c_var=c_var, c_cov=c_cov,
    )


# ----------------------------------------------------------------------------
# kernel builders
# ----------------------------------------------------------------------------

def _sweep_geometry(p: MorphParams, h: int, w: int):
    """Shared tile geometry of the grad + energy kernels (one static pack
    serves both: the pack is built once per re-linearization, not per
    call — see ``make_sweep_pack``)."""
    taps = _taps(p)
    r = (len(taps) - 1) // 2
    # stats need r, the transpose conv another r; rounded up to a multiple
    # of 4 so the DMA'd row count th + 2*halo stays 8-aligned
    halo = _round_up(2 * r, 4)
    th, tw = _tile_shape(h, w, halo)
    gy, gx = _cdiv(h, th), _cdiv(w, tw)
    return taps, r, halo, th, tw, gy, gx


def _build_grad_call(
    C: int, h: int, w: int, p: MorphParams, interpret: bool, split: bool = False,
    npix_global: int = 0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    taps, r, halo, th, tw, gy, gx = _sweep_geometry(p, h, w)
    # npix_global: the row-sharded solver (parallel/spatial.py) evaluates on
    # a LOCAL (bh, w) block but must normalize every gradient/preconditioner
    # term by the GLOBAL pixel count so the psum'd line search sees the
    # global energy's gradient; 0 = single-device (npix = h*w).
    npix = npix_global or (h * w)
    lam_n = p.lambda_tps / npix
    P = 6 * C + 11
    i_w0, i_w1, i_dw0, i_dw1 = 0, C, 2 * C, 4 * C
    i_v, i_uiw, i_uiv, i_tcw, i_tcv, i_invn, i_mask, i_ew = (
        6 * C, 6 * C + 2, 6 * C + 3, 6 * C + 5, 6 * C + 6, 6 * C + 8, 6 * C + 9,
        6 * C + 10,
    )
    shift, crop = _mk_slicers(th, tw)
    hh, ww = th + 2 * halo, tw + 2 * halo
    ow = ww if gx > 1 else tw  # output column-group width (128-aligned)

    def kernel(*refs):
        # split mode: the static pack arrives as THREE refs (warp planes
        # emitted directly by the packed warp kernel, the per-relin v_lin
        # pack, the per-level const pack); X(q) routes the SAME global
        # plane indices to the right tile so the math body is mode-blind
        if split:
            xw_hbm, xvl_hbm, xc_hbm, v_hbm, g_out, part_out = refs[:6]
            xwt, xvlt, xct, xvt, sem = refs[6:]
        else:
            x_hbm, v_hbm, g_out, part_out, xt, xvt, sem = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        # every ref shares the row mapping pack_row = image_row + halo, so
        # one (i*th, j*ww) window slice serves all of them
        win = lambda ref: ref.at[:, pl.ds(i * th, hh), pl.ds(j * ww, ww)]
        if split:
            for src, dst in ((xw_hbm, xwt), (xvl_hbm, xvlt), (xc_hbm, xct)):
                cp = pltpu.make_async_copy(win(src), dst, sem)
                cp.start()
                cp.wait()
        else:
            cp = pltpu.make_async_copy(win(x_hbm), xt, sem)
            cp.start()
            cp.wait()
        cp2 = pltpu.make_async_copy(win(v_hbm), xvt, sem)
        cp2.start()
        cp2.wait()

        # upcast-on-read: the static pack may be stored bf16 (pack_dtype);
        # every use converts to f32 so ALL arithmetic stays f32 (no-op
        # when the pack is f32)
        if split:

            def X(q):
                if q < 6 * C:
                    return xwt[q].astype(jnp.float32)
                if q < 6 * C + 2:
                    return xvlt[q - 6 * C].astype(jnp.float32)
                return xct[q - 6 * C - 2].astype(jnp.float32)

        else:

            def X(q):
                return xt[q].astype(jnp.float32)

        # linearize the warps IN VMEM around the packed v_lin: the static
        # pack stays valid for every iteration and line-search trial until
        # the next re-warp, so XLA repacks only the 2 v planes per call
        dvy = xvt[0] - X(i_v)
        dvx = xvt[1] - X(i_v + 1)

        hs = halo - r  # halo level of the window statistics
        inv2 = crop(X(i_invn), halo, hs)
        # energy-accounting weight: equals the domain mask on a single
        # device; on a row shard it is the interior-crop indicator so halo
        # rows (owned by the neighbor shard) are not double-counted in the
        # psum'd partial sums, while the domain MASK (X(i_mask)) stays the
        # global-validity plane the TPS stencils need
        ew0 = crop(X(i_ew), halo, 0)
        scale = -1.0 / (npix * C)

        def ar(a):  # stats level -> transpose-conv input level (halo r)
            return crop(a, hs, r)

        gs_y = jnp.zeros((th, tw), jnp.float32)
        gs_x = jnp.zeros((th, tw), jnp.float32)
        curv_y = jnp.zeros((th + 2 * r, tw + 2 * r), jnp.float32)
        curv_x = jnp.zeros((th + 2 * r, tw + 2 * r), jnp.float32)
        e_sim = jnp.float32(0.0)

        for c in range(C):
            a0 = X(i_w0 + c) - (X(i_dw0 + 2 * c) * dvy + X(i_dw0 + 2 * c + 1) * dvx)
            a1 = X(i_w1 + c) + (X(i_dw1 + 2 * c) * dvy + X(i_dw1 + 2 * c + 1) * dvx)
            st = _ssim_stats(a0, a1, inv2, taps, p.ssim_c1, p.ssim_c2, p.ssim_use_luminance)

            t1 = _wsum_tile(ar(scale * st["c_var"] * inv2), taps)
            t2 = _wsum_tile(ar(scale * st["c_cov"] * inv2), taps)
            t00 = _wsum_tile(
                ar(scale * (st["c_mu0"] - 2.0 * st["mu0"] * st["c_var"] - st["mu1"] * st["c_cov"]) * inv2),
                taps,
            )
            t01 = _wsum_tile(
                ar(scale * (st["c_mu1"] - 2.0 * st["mu1"] * st["c_var"] - st["mu0"] * st["c_cov"]) * inv2),
                taps,
            )
            w0c = crop(a0, halo, 0)
            w1c = crop(a1, halo, 0)
            g0 = t00 + 2.0 * w0c * t1 + w1c * t2
            g1 = t01 + 2.0 * w1c * t1 + w0c * t2

            d0y = X(i_dw0 + 2 * c)
            d0x = X(i_dw0 + 2 * c + 1)
            d1y = X(i_dw1 + 2 * c)
            d1x = X(i_dw1 + 2 * c + 1)
            gs_y += -g0 * crop(d0y, halo, 0) + g1 * crop(d1y, halo, 0)
            gs_x += -g0 * crop(d0x, halo, 0) + g1 * crop(d1x, halo, 0)

            ib2 = ar(1.0 / st["b2"])
            curv_y += (crop(d0y, halo, r) ** 2 + crop(d1y, halo, r) ** 2) * ib2
            curv_x += (crop(d0x, halo, r) ** 2 + crop(d1x, halo, r) ** 2) * ib2

            e_sim += jnp.sum((1.0 - crop(st["s"], hs, 0)) * ew0)

        pc_y = (2.0 / (npix * C)) * _wsum_tile(curv_y, taps)
        pc_x = (2.0 / (npix * C)) * _wsum_tile(curv_x, taps)
        ui_w = crop(X(i_uiw), halo, 0)
        tc_w = crop(X(i_tcw), halo, 0)
        p_quad = (2.0 / npix) * (p.gamma_ui * ui_w + p.beta_tc * tc_w)
        p_rest = lam_n * 25.0 + p_quad + p.precond_eps / npix

        M = X(i_mask)
        e_tps = jnp.float32(0.0)
        e_ui = jnp.float32(0.0)
        e_tc = jnp.float32(0.0)
        g_yx = []
        for k in range(2):
            V = xvt[k]
            gt, et_map = _tps_grad_tile(V, M, shift, crop, halo)
            v0 = crop(V, halo, 0)
            dv_ui = v0 - crop(X(i_uiv + k), halo, 0)
            dv_tc = v0 - crop(X(i_tcv + k), halo, 0)
            gq = (2.0 * p.gamma_ui / npix) * ui_w * dv_ui + (2.0 * p.beta_tc / npix) * tc_w * dv_tc
            gs = gs_y if k == 0 else gs_x
            g_yx.append(gs + lam_n * gt + gq)
            e_tps += jnp.sum(et_map * ew0)
            e_ui += jnp.sum(ew0 * ui_w * dv_ui * dv_ui)
            e_tc += jnp.sum(ew0 * tc_w * dv_tc * dv_tc)

        def put(q, val):
            if ow > tw:
                # only the first tw columns of the block are meaningful; the
                # group-padding columns are dropped by the caller's unpack
                g_out[q, :, :tw] = val
            else:
                g_out[q] = val

        put(0, g_yx[0])
        put(1, g_yx[1])
        put(2, pc_y + p_rest)
        put(3, pc_x + p_rest)

        @pl.when((i == 0) & (j == 0))
        def _init():
            for q in range(4):
                part_out[0, q] = jnp.float32(0.0)

        part_out[0, 0] += e_sim
        part_out[0, 1] += e_tps
        part_out[0, 2] += e_ui
        part_out[0, 3] += e_tc

    if split:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 4
        scratch = [
            pltpu.VMEM((6 * C, hh, ww), _pack_dtype(p)),   # warp planes
            pltpu.VMEM((2, hh, ww), jnp.float32),          # v_lin
            pltpu.VMEM((9, hh, ww), _pack_dtype(p)),       # const planes
            pltpu.VMEM((2, hh, ww), jnp.float32),          # per-call v
            pltpu.SemaphoreType.DMA,
        ]
    else:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
        scratch = [
            pltpu.VMEM((P, hh, ww), _pack_dtype(p)),
            pltpu.VMEM((2, hh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    call = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((4, th, ow), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, gy * th, gx * ow), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )
    return call, (gy, gx, th, tw, ow, halo, P)


def _build_energy_call(
    C: int, h: int, w: int, p: MorphParams, interpret: bool, split: bool = False,
    npix_global: int = 0,
):
    """Line-search energy kernel over the SAME static pack as the grad
    kernel (same geometry, same plane layout): per trial only the 2 v
    planes repack, and the linearized warps are formed in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    taps, r, halo, th, tw, gy, gx = _sweep_geometry(p, h, w)
    npix = npix_global or (h * w)
    P = 6 * C + 11
    i_w0, i_w1, i_dw0, i_dw1 = 0, C, 2 * C, 4 * C
    i_v, i_uiw, i_uiv, i_tcw, i_tcv, i_invn, i_mask, i_ew = (
        6 * C, 6 * C + 2, 6 * C + 3, 6 * C + 5, 6 * C + 6, 6 * C + 8, 6 * C + 9,
        6 * C + 10,
    )
    shift, crop = _mk_slicers(th, tw)
    hh, ww = th + 2 * halo, tw + 2 * halo

    def kernel(*refs):
        if split:  # see _build_grad_call: 3 static refs + per-call v
            xw_hbm, xvl_hbm, xc_hbm, v_hbm, part_out = refs[:5]
            xwt, xvlt, xct, xvt, sem = refs[5:]
        else:
            x_hbm, v_hbm, part_out, xt, xvt, sem = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        win = lambda ref: ref.at[:, pl.ds(i * th, hh), pl.ds(j * ww, ww)]
        if split:
            for src, dst in ((xw_hbm, xwt), (xvl_hbm, xvlt), (xc_hbm, xct)):
                cp = pltpu.make_async_copy(win(src), dst, sem)
                cp.start()
                cp.wait()
        else:
            cp = pltpu.make_async_copy(win(x_hbm), xt, sem)
            cp.start()
            cp.wait()
        cp2 = pltpu.make_async_copy(win(v_hbm), xvt, sem)
        cp2.start()
        cp2.wait()

        if split:

            def X(q):  # upcast-on-read, routed across the split refs
                if q < 6 * C:
                    return xwt[q].astype(jnp.float32)
                if q < 6 * C + 2:
                    return xvlt[q - 6 * C].astype(jnp.float32)
                return xct[q - 6 * C - 2].astype(jnp.float32)

        else:

            def X(q):  # upcast-on-read (bf16 pack support; no-op for f32)
                return xt[q].astype(jnp.float32)

        dvy = xvt[0] - X(i_v)
        dvx = xvt[1] - X(i_v + 1)

        inv0 = crop(X(i_invn), halo, halo - r)  # stats: halo -> halo - r
        ew0 = crop(X(i_ew), halo, 0)  # energy-accounting weight (see grad)

        e_sim = jnp.float32(0.0)
        for c in range(C):
            a0 = X(i_w0 + c) - (X(i_dw0 + 2 * c) * dvy + X(i_dw0 + 2 * c + 1) * dvx)
            a1 = X(i_w1 + c) + (X(i_dw1 + 2 * c) * dvy + X(i_dw1 + 2 * c + 1) * dvx)
            st = _ssim_stats(
                a0, a1, inv0, taps,
                p.ssim_c1, p.ssim_c2, p.ssim_use_luminance,
            )
            e_sim += jnp.sum((1.0 - crop(st["s"], halo - r, 0)) * ew0)

        ui_w = crop(X(i_uiw), halo, 0)
        tc_w = crop(X(i_tcw), halo, 0)
        M = X(i_mask)
        e_tps = jnp.float32(0.0)
        e_ui = jnp.float32(0.0)
        e_tc = jnp.float32(0.0)
        for k in range(2):
            V = xvt[k]
            vxx, vyy, vxy = _tps_maps_tile(V, M, shift, crop, halo, 0)
            et_map = vxx * vxx + 2.0 * vxy * vxy + vyy * vyy
            v0 = crop(V, halo, 0)
            dv_ui = v0 - crop(X(i_uiv + k), halo, 0)
            dv_tc = v0 - crop(X(i_tcv + k), halo, 0)
            e_tps += jnp.sum(et_map * ew0)
            e_ui += jnp.sum(ew0 * ui_w * dv_ui * dv_ui)
            e_tc += jnp.sum(ew0 * tc_w * dv_tc * dv_tc)

        @pl.when((i == 0) & (j == 0))
        def _init():
            for q in range(4):
                part_out[0, q] = jnp.float32(0.0)

        part_out[0, 0] += e_sim
        part_out[0, 1] += e_tps
        part_out[0, 2] += e_ui
        part_out[0, 3] += e_tc

    if split:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 4
        scratch = [
            pltpu.VMEM((6 * C, hh, ww), _pack_dtype(p)),
            pltpu.VMEM((2, hh, ww), jnp.float32),
            pltpu.VMEM((9, hh, ww), _pack_dtype(p)),
            pltpu.VMEM((2, hh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
        scratch = [
            pltpu.VMEM((P, hh, ww), _pack_dtype(p)),
            pltpu.VMEM((2, hh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    call = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 4), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )
    return call, (gy, gx, th, tw, halo, P)


# builders keyed by static signature so repeated traces reuse the pallas_call
_grad_call_cached = functools.lru_cache(maxsize=None)(_build_grad_call)
_energy_call_cached = functools.lru_cache(maxsize=None)(_build_energy_call)


def _combine_parts(parts: jnp.ndarray, p: MorphParams, npix: int, C: int) -> jnp.ndarray:
    ps = parts.astype(jnp.float32).reshape(4)
    return (
        ps[0] / (npix * C)
        + p.lambda_tps * ps[1] / npix
        + p.gamma_ui * ps[2] / npix
        + p.beta_tc * ps[3] / npix
    )


def _common_planes(v, data: LevelData):
    return [
        v[..., 0], v[..., 1],
        data.ui_w[..., 0], data.ui_v[..., 0], data.ui_v[..., 1],
        data.tc_w[..., 0], data.tc_v[..., 0], data.tc_v[..., 1],
    ]


def make_sweep_pack(
    w0, dw0, w1, dw1, v_lin, data: LevelData, p: MorphParams
) -> jnp.ndarray:
    """Build the STATIC packed plane stack shared by both sweep kernels.

    Packed once per re-linearization (``relin_every``): the warp planes,
    their derivatives, the linearization point and the constant data
    planes. Every grad/energy call until the next re-warp reuses it and
    repacks only the 2 current-``v`` planes (``pack_v``) — the XLA-side
    pack used to cost ~7 ms/iteration at 1080p, ~half the iteration.
    """
    h, w, C = data.i0.shape
    _taps_, _r, halo, th, tw, gy, gx = _sweep_geometry(p, h, w)
    planes = [w0[..., c] for c in range(C)] + [w1[..., c] for c in range(C)]
    for src in (dw0, dw1):
        for c in range(C):
            planes += [src[..., c, 0], src[..., c, 1]]
    planes += _common_planes(v_lin, data)
    ones = jnp.ones((h, w), v_lin.dtype)
    # mask + energy-accounting weight: identical (the padded-ones domain
    # indicator) on a single device; they differ only on row shards
    planes += [_invn_plane(h, w, p, v_lin.dtype), ones, ones]
    dt = _pack_dtype(p)
    return _pack([pl_.astype(dt) for pl_ in planes], gy, gx, th, tw, halo)


def make_sweep_pack_planes(
    warp_planes: jnp.ndarray, v_lin, data: LevelData, p: MorphParams
) -> jnp.ndarray:
    """:func:`make_sweep_pack` from a raw (6C, H, W) warp plane stack
    (``pallas.warp.fused_warp_planes`` emits exactly this layout) — skips
    the channel-major round trip of the bundle API."""
    h, w = v_lin.shape[0], v_lin.shape[1]
    _taps_, _r, halo, th, tw, gy, gx = _sweep_geometry(p, h, w)
    ones = jnp.ones((h, w), v_lin.dtype)
    common = _common_planes(v_lin, data) + [
        _invn_plane(h, w, p, v_lin.dtype), ones, ones
    ]
    planes = [warp_planes[k] for k in range(warp_planes.shape[0])] + common
    dt = _pack_dtype(p)
    return _pack([pl_.astype(dt) for pl_ in planes], gy, gx, th, tw, halo)


def make_const_pack(data: LevelData, p: MorphParams) -> jnp.ndarray:
    """Per-LEVEL constant planes (constraints, 1/n, domain mask) in pack
    layout — built once per level solve, shared by every re-linearization
    (split-pack mode, see fused_value_grad_precond_split)."""
    h, w, _C = data.i0.shape
    _taps_, _r, halo, th, tw, gy, gx = _sweep_geometry(p, h, w)
    dtype = jnp.float32
    ones = jnp.ones((h, w), dtype)
    planes = [
        data.ui_w[..., 0], data.ui_v[..., 0], data.ui_v[..., 1],
        data.tc_w[..., 0], data.tc_v[..., 0], data.tc_v[..., 1],
        _invn_plane(h, w, p, dtype), ones, ones,
    ]
    dt = _pack_dtype(p)
    return _pack([pl_.astype(dt) for pl_ in planes], gy, gx, th, tw, halo)


def fused_value_grad_precond_split(
    x_warp, x_vlin, x_const, v, hw, C: int, p: MorphParams, *, interpret=None
):
    """(energy, grad, precond) at ``v`` from the SPLIT static pack.

    ``x_warp``: (6C, (gy+1)*th, gx*cg) emitted directly by
    ``pallas.warp.fused_warp_planes_packed`` (no XLA repack of the warp
    planes per re-linearization); ``x_vlin``: ``pack_v`` of the (quantized)
    linearization point, rebuilt per relin; ``x_const``:
    ``make_const_pack``, built once per level. Math and outputs are
    identical to :func:`fused_value_grad_precond_pack` (same kernel body —
    only the DMA routing differs); jnp twin:
    ``solver.descent.energy_value_grad_precond``.
    """
    h, w = hw
    interpret = _auto_interpret(interpret)
    call, (gy, gx, th, tw, ow, halo, _P) = _grad_call_cached(
        C, h, w, p, interpret, True
    )
    xv = pack_v(v, p)
    out, parts = call(x_warp, x_vlin, x_const, xv)
    if gx > 1:
        out = out.reshape(4, gy * th, gx, ow)[..., :tw].reshape(4, gy * th, gx * tw)
    grad = jnp.moveaxis(out[:2, :h, :w], 0, -1).astype(v.dtype)
    precond = jnp.moveaxis(out[2:4, :h, :w], 0, -1).astype(v.dtype)
    energy = _combine_parts(parts, p, h * w, C).astype(v.dtype)
    return energy, grad, precond


def fused_total_energy_split(
    x_warp, x_vlin, x_const, v, hw, C: int, p: MorphParams, *, interpret=None
):
    """Total energy at ``v`` from the split static pack (line search)."""
    h, w = hw
    interpret = _auto_interpret(interpret)
    call, _geom = _energy_call_cached(C, h, w, p, interpret, True)
    (parts,) = call(x_warp, x_vlin, x_const, pack_v(v, p))
    return _combine_parts(parts, p, h * w, C).astype(v.dtype)


def pack_v(v: jnp.ndarray, p: MorphParams) -> jnp.ndarray:
    """Pack just the (H, W, 2) field with the sweep geometry (per call)."""
    h, w = v.shape[0], v.shape[1]
    _taps_, _r, halo, th, tw, gy, gx = _sweep_geometry(p, h, w)
    return _pack(
        [v[..., 0].astype(jnp.float32), v[..., 1].astype(jnp.float32)],
        gy, gx, th, tw, halo,
    )


def fused_value_grad_precond_pack(
    x_static, v, hw, C: int, p: MorphParams, *, interpret=None
):
    """(energy, grad, precond) at ``v`` from a prebuilt static pack."""
    h, w = hw
    interpret = _auto_interpret(interpret)
    call, (gy, gx, th, tw, ow, halo, _P) = _grad_call_cached(C, h, w, p, interpret)
    xv = pack_v(v, p)
    out, parts = call(x_static, xv)
    if gx > 1:
        out = out.reshape(4, gy * th, gx, ow)[..., :tw].reshape(4, gy * th, gx * tw)
    grad = jnp.moveaxis(out[:2, :h, :w], 0, -1).astype(v.dtype)
    precond = jnp.moveaxis(out[2:4, :h, :w], 0, -1).astype(v.dtype)
    energy = _combine_parts(parts, p, h * w, C).astype(v.dtype)
    return energy, grad, precond


def fused_total_energy_pack(x_static, v, hw, C: int, p: MorphParams, *, interpret=None):
    """Total energy at ``v`` from a prebuilt static pack (line search)."""
    h, w = hw
    interpret = _auto_interpret(interpret)
    call, _geom = _energy_call_cached(C, h, w, p, interpret)
    (parts,) = call(x_static, pack_v(v, p))
    return _combine_parts(parts, p, h * w, C).astype(v.dtype)


def fused_value_grad_precond_planes(
    w0, dw0, w1, dw1, v, data: LevelData, p: MorphParams, *, interpret=None
):
    """Fused (energy, grad, precond) from precomputed warp planes.

    ``w0/w1``: (H, W, C) warped (or linearized) images; ``dw0/dw1``:
    (H, W, C, 2) interpolant derivatives at the linearization point.
    Compatibility wrapper over the pack-based path with ``v_lin = v``
    (zero in-kernel correction — planes are used exactly as given).
    jnp twin: ``solver.descent.value_grad_precond_planes``.
    """
    h, w, C = data.i0.shape
    x = make_sweep_pack(w0, dw0, w1, dw1, v, data, p)
    return fused_value_grad_precond_pack(x, v, (h, w), C, p, interpret=interpret)


def fused_value_grad_precond(v, data: LevelData, p: MorphParams, *, interpret=None):
    """Pallas twin of ``solver.descent.energy_value_grad_precond``.

    Returns ``(energy, grad, precond)`` with identical semantics; the warp
    and its derivative stay in XLA, the rest is one fused kernel pass.
    """
    g = grid_coords(data.i0.shape[0], data.i0.shape[1], v.dtype)
    w0, dw0 = bilinear_sample_with_grad(data.i0, g - v)
    w1, dw1 = bilinear_sample_with_grad(data.i1, g + v)
    return fused_value_grad_precond_planes(
        w0, dw0, w1, dw1, v, data, p, interpret=interpret
    )


def fused_total_energy_planes(w0, w1, v, data: LevelData, p: MorphParams, *, interpret=None):
    """Fused total energy from precomputed (or linearized) warp planes.

    Compatibility wrapper: the energy kernel reads the grad-layout static
    pack, so the missing derivative planes are zeros and ``v_lin = v``
    (zero in-kernel correction). jnp twin:
    ``solver.descent.total_energy_planes``.
    """
    h, w, C = data.i0.shape
    zd = jnp.zeros((h, w, C, 2), v.dtype)
    x = make_sweep_pack(w0, zd, w1, zd, v, data, p)
    return fused_total_energy_pack(x, v, (h, w), C, p, interpret=interpret)


def fused_total_energy(v, data: LevelData, p: MorphParams, *, interpret=None):
    """Pallas twin of ``solver.energy.total_energy`` (line-search path)."""
    g = grid_coords(data.i0.shape[0], data.i0.shape[1], v.dtype)
    w0 = bilinear_sample(data.i0, g - v)
    w1 = bilinear_sample(data.i1, g + v)
    return fused_total_energy_planes(w0, w1, v, data, p, interpret=interpret)


# ----------------------------------------------------------------------------
# row-shard entry points (the spatially sharded solver, parallel/spatial.py)
# ----------------------------------------------------------------------------
#
# Same kernels, different pack construction: each device evaluates its own
# (bh, w) row block, but the pack's halo ring is SLICED from the real
# neighbor rows (the ppermute halo exchange) instead of zero-padded, so the
# interior gradient equals the global one; the ``ew`` plane confines the
# energy partial sums to the device's own rows (psum'd by the caller), and
# ``npix_global`` makes every normalization constant global. The kernels
# themselves are untouched — SP inherits the single-device fused sweep
# (SURVEY.md section 8 stage 4; VERDICT round 3 missing #2).


def sweep_row_halo(p: MorphParams) -> int:
    """Rows of REAL neighbor data the shard pack needs above/below the
    block: stats reach r + transpose-conv r (rounded for DMA alignment).
    Always <= the spatial solver's exchange halo (2r + 2)."""
    r = (int(p.ssim_window) - 1) // 2
    return _round_up(2 * r, 4)


def _pack_shard(planes, row_halo: int, gy, gx, th, tw, halo):
    """:func:`_pack` for an extended row block.

    ``planes``: (bh + 2*row_halo, W) arrays whose rows [row_halo,
    row_halo + bh) are the device's interior and the rest real neighbor
    rows (zeros beyond the global domain — halo_exchange_rows semantics).
    Requires ``row_halo >= halo``. Columns are true domain edges and pad
    with zeros exactly like :func:`_pack`.
    """
    he, w = planes[0].shape
    assert row_halo >= halo, (row_halo, halo)
    x = jnp.stack(planes, 0)
    x = x[:, row_halo - halo :, :]
    rows = halo + gy * th + halo
    x = x[:, :rows]
    x = jnp.pad(
        x, ((0, 0), (0, rows - x.shape[1]), (halo, gx * tw - w + halo))
    )
    if gx > 1:
        cg = tw + 2 * halo
        x = jnp.concatenate([x[:, :, i * tw : i * tw + cg] for i in range(gx)], axis=2)
    return x


def make_sweep_pack_shard(
    w0, dw0, w1, dw1, v_lin_ext,
    ui_w, ui_v, tc_w, tc_v,
    invn_ext, mask_ext, ew_ext,
    p: MorphParams, row_halo: int,
) -> jnp.ndarray:
    """Static pack for one row shard.

    ``w0/w1`` (He, W, C), ``dw0/dw1`` (He, W, C, 2), ``v_lin_ext`` (He, W, 2)
    live on the EXTENDED block (He = bh + 2*row_halo) and must already be
    zeroed on out-of-domain rows; ``ui_*/tc_*`` are interior (bh, W, .)
    maps (their halo values never reach an interior output — zero-extended
    here); ``invn_ext``/``mask_ext``/``ew_ext`` are (He, W) planes the
    caller builds from GLOBAL row coordinates.
    """
    he, w, C = w0.shape
    bh = he - 2 * row_halo
    _taps_, _r, halo, th, tw, gy, gx = _sweep_geometry(p, bh, w)

    def ext0(a):
        return jnp.pad(a, ((row_halo, row_halo), (0, 0)))

    planes = [w0[..., c] for c in range(C)] + [w1[..., c] for c in range(C)]
    for src in (dw0, dw1):
        for c in range(C):
            planes += [src[..., c, 0], src[..., c, 1]]
    planes += [
        v_lin_ext[..., 0], v_lin_ext[..., 1],
        ext0(ui_w[..., 0]), ext0(ui_v[..., 0]), ext0(ui_v[..., 1]),
        ext0(tc_w[..., 0]), ext0(tc_v[..., 0]), ext0(tc_v[..., 1]),
        invn_ext, mask_ext, ew_ext,
    ]
    dt = _pack_dtype(p)
    return _pack_shard([pl_.astype(dt) for pl_ in planes], row_halo, gy, gx, th, tw, halo)


def pack_v_shard(v_ext: jnp.ndarray, row_halo: int, p: MorphParams) -> jnp.ndarray:
    """Per-call v pack for one row shard (extended (He, W, 2) field)."""
    he, w = v_ext.shape[0], v_ext.shape[1]
    bh = he - 2 * row_halo
    _taps_, _r, halo, th, tw, gy, gx = _sweep_geometry(p, bh, w)
    return _pack_shard(
        [v_ext[..., 0].astype(jnp.float32), v_ext[..., 1].astype(jnp.float32)],
        row_halo, gy, gx, th, tw, halo,
    )


def fused_grad_parts_shard(
    x_static, xv, hw, C: int, p: MorphParams, npix_global: int, *, interpret=None
):
    """Per-shard (parts (4,), grad, precond) at the packed ``xv``.

    ``parts`` are this shard's RAW energy partial sums (sim, tps, ui, tc) —
    psum them over the row axis and feed :func:`combine_energy_parts` with
    the GLOBAL pixel count. ``grad``/``precond`` are already normalized by
    ``npix_global`` (the kernel constant), local rows only.
    """
    h, w = hw
    interpret = _auto_interpret(interpret)
    call, (gy, gx, th, tw, ow, halo, _P) = _grad_call_cached(
        C, h, w, p, interpret, False, npix_global
    )
    out, parts = call(x_static, xv)
    if gx > 1:
        out = out.reshape(4, gy * th, gx, ow)[..., :tw].reshape(4, gy * th, gx * tw)
    grad = jnp.moveaxis(out[:2, :h, :w], 0, -1)
    precond = jnp.moveaxis(out[2:4, :h, :w], 0, -1)
    return parts.reshape(4), grad, precond


def fused_energy_parts_shard(
    x_static, xv, hw, C: int, p: MorphParams, npix_global: int, *, interpret=None
):
    """Per-shard raw energy partial sums (4,) at the packed ``xv``."""
    h, w = hw
    interpret = _auto_interpret(interpret)
    call, _geom = _energy_call_cached(C, h, w, p, interpret, False, npix_global)
    (parts,) = call(x_static, xv)
    return parts.reshape(4)


def combine_energy_parts(parts, p: MorphParams, npix: int, C: int) -> jnp.ndarray:
    """Weighted total energy from (psum'd) raw partials — the public twin of
    the in-file :func:`_combine_parts` for the sharded solver."""
    return _combine_parts(parts, p, npix, C)
