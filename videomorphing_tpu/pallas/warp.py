"""Fused bilinear warp kernel: both halfway warps + interpolant derivatives.

The reference fetches ``I(p -/+ v)`` through CUDA texture units for free;
TPUs have none, and XLA lowers the per-pixel gather to ~38 ms per 1080p
image regardless of field smoothness (measured; index-count bound, not
bandwidth). This kernel is the TPU-native replacement for the solver's
re-warp step.

Strategy — exploit that the halfway field varies slowly within a tile:

1. XLA precomputes, per image, integer tap rows/cols and fractional weights,
   then per (64, 256) output tile the minimum of ``iy - row_in_tile``
   (resp. ``ix - col_in_tile``). Each tile's source pixels then live in a
   fixed (72, 512) window, and the REMAINING per-pixel displacement
   ``dev = iy - base - row_in_tile`` is a small non-negative integer
   (< 6 for any smooth field).
2. Mosaic requires 8/128-aligned HBM slice offsets and miscompiles dynamic
   sublane rolls, so the row alignment fraction is removed by DMA-ing from
   one of EIGHT row-phase-shifted padded copies of the image (built once
   per level solve — ``make_warp_source``; the phase index is a dynamic
   leading-dim index, which has no tiling constraint). The column fraction
   is removed with one dynamic lane ``pltpu.roll`` (which compiles fine).
3. The warp then resolves by enumerating the (D=6) x (DX=6) residual
   integer offsets: each combination is a STATIC 2-D shifted slice of the
   window, selected per pixel by an equality mask, accumulated in vector
   registers (no control flow — predication makes branches pointless), and
   combined with the bilinear weights once at the end.
4. If a tile's variation exceeds the budget, its horizontal BAND
   (``_row_bands``: <= 4 bands of tile rows per frame) routes to the exact
   XLA gather path — the kernel is a fast path, never an approximation,
   and a wild region only slows its own band (measured: converged fields
   bust the budget in ~19% of tiles, localized). Outputs are
   bit-equivalent to ``ops.resample.bilinear_sample_with_grad``
   (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from videomorphing_tpu.pallas.sweep import _auto_interpret, _cdiv
from videomorphing_tpu.ops.resample import bilinear_sample_with_grad, grid_coords

TH, TW = 64, 256         # output tile
D, DX = 6, 6             # enumerated residual row/col offsets
RW, WC = 72, 512         # source window (rows: TH + D + pad; cols: TW + 128 frac + pad)
OFFY, OFFX = 64, 256     # top/left EDGE-REPLICATED padding of the source images
N_PHASE = 8
# Extended tap range: coords may run this far outside the image before the
# prep clamps them. The padding is edge-replicated, so interpolating between
# two replicated rows/cols reproduces ``bilinear_sample``'s edge clamp
# EXACTLY — and, critically, the per-tile residual ``dev`` stays smooth
# where content moves off-frame. With a hard [0, h-1] clamp, any clamped
# run made ``iy`` locally constant, so ``dev`` grew by 1 per row and busted
# the residual budget for every band touching a border — on real morphs
# (content moving off-frame at t near 0/1) the fast path almost never
# engaged. Margins are sized so ``fits=True`` implies the DMA offsets stay
# in range: by_al >= 8*floor((-MY-(D-1))/8) = -64 = -OFFY, and
# bx_al >= 128*floor((-MX-(DX_SAMPLE-1))/128) = -256 = -OFFX.
MY, MX = 56, 128


class WarpSource(NamedTuple):
    """An image prepared for :func:`fused_warp_pair`.

    ``phases[k]`` is the zero-padded (C, Hp, Wp) image shifted DOWN by k
    rows, so a window whose true start row is ``8m + k`` can be DMA'd from
    ``phases[k]`` at the 8-aligned offset ``8m`` (Mosaic constraint). Built
    once per image per level (``make_warp_source``), reused across all
    solver iterations and line-search warps of that level.
    """

    img: jnp.ndarray      # (H, W, C) original, for the XLA fallback path
    phases: jnp.ndarray   # (8, C, Hp, Wp)


def make_warp_source(img: jnp.ndarray) -> WarpSource:
    h, w, c = img.shape
    chw = jnp.moveaxis(img, -1, 0).astype(jnp.float32)
    hp = _cdiv(OFFY + h + MY + RW + N_PHASE, 8) * 8
    wp = _cdiv(OFFX + w + MX + WC, 128) * 128
    # EDGE padding (not zeros): out-of-image taps land on replicated border
    # rows/cols, so unclamped coords within [-MY, h-1+MY] x [-MX, w-1+MX]
    # sample exactly what the clamp-based XLA path would (module constants).
    phases = jnp.stack(
        [
            jnp.pad(
                chw,
                ((0, 0), (OFFY - k, hp - h - OFFY + k), (OFFX, wp - w - OFFX)),
                mode="edge",
            )
            for k in range(N_PHASE)
        ],
        axis=0,
    )
    return WarpSource(img=img, phases=phases)


def _prep_image(
    coords_y, coords_x, h, w, gy, gx,
    d_budget: int = D, dx_budget: int = DX, th: int = TH, tw: int = TW,
    valid=None,
):
    """Per-image tap indices, weights, per-tile bases and the budget check.

    Returns (dev, devx, fy, fx, oky, okx, row_start, phase, col_start,
    bx_frac, fits): dev/devx are the per-pixel residual offsets relative to
    each tile's base; planes are (gy*TH, gx*TW); bases are (gy, gx).

    ``h, w`` are the SOURCE image bounds (clipping); the coords arrays may
    cover only a horizontal band of the output (``gy`` tile rows worth) —
    the per-band fallback dispatch slices coords to tile-row bands so a
    wild region routes only its own band to the XLA path.
    """
    hb, wb = coords_y.shape
    # Clip to the EXTENDED tap range, not the image: the sources are
    # edge-replicated by (MY, MX), so out-of-image taps reproduce the edge
    # clamp exactly while ``iy/ix`` stay smooth functions of the coords —
    # no budget-busting dev kinks along borders (module constants).
    y = jnp.clip(coords_y, -float(MY), h - 1.0 + MY)
    x = jnp.clip(coords_x, -float(MX), w - 1.0 + MX)
    iy = jnp.clip(jnp.floor(y), -float(MY), h - 2.0 + MY)
    ix = jnp.clip(jnp.floor(x), -float(MX), w - 2.0 + MX)
    fy = y - iy
    fx = x - ix
    oky = ((coords_y > 0.0) & (coords_y < h - 1.0)).astype(y.dtype)
    okx = ((coords_x > 0.0) & (coords_x < w - 1.0)).astype(y.dtype)
    iy = iy.astype(jnp.int32)
    ix = ix.astype(jnp.int32)

    hp, wp = gy * th, gx * tw
    row_in = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) % th
    col_in = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1) % tw

    def pad_to(a, fill):
        return jnp.pad(a, ((0, hp - hb), (0, wp - wb)), constant_values=fill)

    big = jnp.int32(1 << 28)
    rel_y = pad_to(iy, big) - row_in
    rel_x = pad_to(ix, big) - col_in
    if valid is not None:
        # packed layouts (fused_warp_planes_packed) carry interior padding
        # positions whose coords are meaningless — exclude them from the
        # tile bases and the budget check exactly like the edge padding
        # (``big`` rel makes them match no residual offset -> output 0)
        vz = pad_to((valid > 0).astype(jnp.int32), 0)
        rel_y = jnp.where(vz > 0, rel_y, big)
        rel_x = jnp.where(vz > 0, rel_x, big)

    by_raw = jnp.min(rel_y.reshape(gy, th, gx, tw), axis=(1, 3))   # (gy, gx)
    bx_raw = jnp.min(rel_x.reshape(gy, th, gx, tw), axis=(1, 3))
    # a tile with NO valid positions keeps its ``big`` min — clamp its base
    # to 0 so the window DMA offset stays in range (its outputs are all
    # zeroed by the no-match enumeration anyway)
    by_raw = jnp.where(by_raw >= big // 2, 0, by_raw)
    bx_raw = jnp.where(bx_raw >= big // 2, 0, bx_raw)
    phase = by_raw % 8                  # row fraction -> phase-copy index
    by_al = by_raw - phase
    bx_al = (bx_raw // 128) * 128
    bx_frac = bx_raw - bx_al

    rep_y = jnp.repeat(jnp.repeat(by_raw, th, 0), tw, 1)
    rep_x = jnp.repeat(jnp.repeat(bx_raw, th, 0), tw, 1)
    dev = jnp.where(rel_y >= big // 2, 0, rel_y - rep_y)
    devx = jnp.where(rel_x >= big // 2, 0, rel_x - rep_x)
    if valid is not None:
        # invalid positions must produce ZERO in the (uncropped) packed
        # output: give them an offset the kernel's residual enumeration
        # never matches (dev = 0 would sample real values there)
        dev = jnp.where(vz > 0, dev, d_budget)
        devx = jnp.where(vz > 0, devx, dx_budget)

    inside = (
        pad_to(jnp.ones((hb, wb), jnp.int32), 0) if valid is None else vz
    )
    fits = (
        jnp.max(jnp.where(inside > 0, dev, 0)) <= d_budget - 1
    ) & (jnp.max(jnp.where(inside > 0, devx, 0)) <= dx_budget - 1)

    # window origin in the padded phase copy: phases[k][r] = img[r - OFFY + k]
    # and the true start is by_al + k, so the aligned DMA offset is
    row_start = by_al + OFFY
    col_start = bx_al + OFFX
    # the OFFY/OFFX margin proof (module constants) assumes every tile has
    # a valid sample at row_in/col_in 0; PACKED layouts break that — their
    # top halo rows are invalid, so the first valid row is row_in = halo
    # and ``by_al`` can undershoot -OFFY (verified: top-edge content
    # displaced ~60 px up passes the dev budget yet lands row_start = -8,
    # an out-of-bounds DMA). Gate the fast path on in-range offsets; the
    # rare offending band takes the per-band XLA fallback instead.
    fits = (
        fits & (jnp.min(row_start) >= 0) & (jnp.min(col_start) >= 0)
    )
    return (
        dev, devx, pad_to(fy, 0.0), pad_to(fx, 0.0),
        pad_to(oky, 0.0), pad_to(okx, 0.0),
        row_start, phase, col_start, bx_frac, fits,
    )


def _build_warp_call(C: int, gy: int, gx: int, interpret: bool, out_dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_out = 6 * C  # w0(C), w1(C), dw0(2C), dw1(2C)
    i_w0, i_w1, i_dw0, i_dw1 = 0, C, 2 * C, 4 * C
    cast = (lambda a: a) if out_dtype == jnp.float32 else (lambda a: a.astype(out_dtype))

    def roll_lanes(a, sx):
        # logical col q maps to source col q + sx (jnp.roll with -sx). Only
        # the LANE axis rolls dynamically: Mosaic's dynamic_rotate
        # miscompiles sublane rolls of multi-vreg windows on this target.
        if interpret:
            return jnp.roll(a, -sx, axis=2)
        return pltpu.roll(a, -sx, axis=2)

    def kernel(bases, ph0_hbm, ph1_hbm, idxi, idxf, out, win, sem):
        ti = pl.program_id(0)
        tj = pl.program_id(1)

        for im, src in ((0, ph0_hbm), (1, ph1_hbm)):
            rs = pl.multiple_of(bases[ti, tj, 4 * im + 0], 8)
            ph = bases[ti, tj, 4 * im + 1]
            cs = pl.multiple_of(bases[ti, tj, 4 * im + 2], 128)
            cp = pltpu.make_async_copy(
                src.at[ph, :, pl.ds(rs, RW), pl.ds(cs, WC)],
                win.at[pl.ds(C * im, C)],
                sem,
            )
            cp.start()
            cp.wait()

        for im in range(2):
            xf = bases[ti, tj, 4 * im + 3]
            dev = idxi[2 * im]                       # (TH, TW) int32
            devx = idxi[2 * im + 1]
            fy = idxf[4 * im]
            fx = idxf[4 * im + 1]
            oky = idxf[4 * im + 2]
            okx = idxf[4 * im + 3]
            w_win = roll_lanes(win[C * im : C * im + C], xf)  # (C, RW, WC)

            # residual-offset enumeration, fully unrolled on vector values:
            # accumulate the four bilinear taps, combine once at the end
            z = jnp.zeros((C, TH, TW), jnp.float32)
            t00 = t01 = t10 = t11 = z
            for d in range(D):
                rows0 = w_win[:, d : d + TH]
                rows1 = w_win[:, d + 1 : d + 1 + TH]
                my = dev == d
                for dx in range(DX):
                    m = (my & (devx == dx)).astype(jnp.float32)
                    t00 += m * rows0[:, :, dx : dx + TW]
                    t01 += m * rows0[:, :, dx + 1 : dx + 1 + TW]
                    t10 += m * rows1[:, :, dx : dx + TW]
                    t11 += m * rows1[:, :, dx + 1 : dx + 1 + TW]

            top = t00 + (t01 - t00) * fx
            bot = t10 + (t11 - t10) * fx
            base_w = i_w0 if im == 0 else i_w1
            base_d = i_dw0 if im == 0 else i_dw1
            out[base_w : base_w + C] = cast(top + (bot - top) * fy)
            dys = (bot - top) * oky
            dxs = ((t01 - t00) * (1.0 - fy) + (t11 - t10) * fy) * okx
            for c in range(C):
                out[base_d + 2 * c] = cast(dys[c])
                out[base_d + 2 * c + 1] = cast(dxs[c])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, TH, TW), lambda i, j, *_: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TH, TW), lambda i, j, *_: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((6 * C, TH, TW), lambda i, j, *_: (0, i, j), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * C, RW, WC), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_out, gy * TH, gx * TW), out_dtype)],
        interpret=interpret,
    )


_warp_call_cached = functools.lru_cache(maxsize=None)(_build_warp_call)


# Sampler tile geometry: narrower tiles than the solver warp (TW_S=128 vs
# 256) both shrink scoped VMEM (a wide-budget 256-lane variant exceeded the
# 16 MB limit) and halve the per-tile coordinate extent, so the same D/DX
# budget tolerates ~2x steeper coordinate maps — render fields vary several
# px per tile.
TH_S, TW_S = 64, 128
DX_SAMPLE = 8


def _build_sample_call(
    c_blk: int, nc: int, n_imgs: int, gy: int, gx: int, interpret: bool
):
    """Values-only variant of :func:`_build_warp_call` for ARBITRARY smooth
    coordinate maps (no interpolant derivatives): the renderer's backward
    warps sample ``I(phi(q))`` where ``phi`` is not the halfway form
    ``g -/+ v``. Channels run as the innermost grid axis in blocks of
    ``c_blk`` (keeps scoped VMEM flat in C — a monolithic C=4 variant blew
    the 16 MB scoped-vmem limit), and the lane-residual budget is
    ``DX_SAMPLE`` instead of ``DX``."""
    th, tw = TH_S, TW_S
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def roll_lanes(a, sx):
        if interpret:
            return jnp.roll(a, -sx, axis=2)
        return pltpu.roll(a, -sx, axis=2)

    def kernel(bases, *refs):
        phs = refs[:n_imgs]
        idxi, idxf, out, win, sem = refs[n_imgs:]
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        tk = pl.program_id(2)

        for im in range(n_imgs):
            rs = pl.multiple_of(bases[ti, tj, 4 * im + 0], 8)
            ph = bases[ti, tj, 4 * im + 1]
            cs = pl.multiple_of(bases[ti, tj, 4 * im + 2], 128)
            cp = pltpu.make_async_copy(
                phs[im].at[ph, pl.ds(tk * c_blk, c_blk), pl.ds(rs, RW), pl.ds(cs, WC)],
                win.at[pl.ds(c_blk * im, c_blk)],
                sem,
            )
            cp.start()
            cp.wait()

        for im in range(n_imgs):
            xf = bases[ti, tj, 4 * im + 3]
            dev = idxi[2 * im]
            devx = idxi[2 * im + 1]
            fy = idxf[2 * im]
            fx = idxf[2 * im + 1]
            w_win = roll_lanes(win[c_blk * im : c_blk * im + c_blk], xf)

            z = jnp.zeros((c_blk, th, tw), jnp.float32)
            t00 = t01 = t10 = t11 = z
            for d in range(D):
                rows0 = w_win[:, d : d + th]
                rows1 = w_win[:, d + 1 : d + 1 + th]
                my = dev == d
                for dx in range(DX_SAMPLE):
                    m = (my & (devx == dx)).astype(jnp.float32)
                    t00 += m * rows0[:, :, dx : dx + tw]
                    t01 += m * rows0[:, :, dx + 1 : dx + 1 + tw]
                    t10 += m * rows1[:, :, dx : dx + tw]
                    t11 += m * rows1[:, :, dx + 1 : dx + 1 + tw]

            top = t00 + (t01 - t00) * fx
            bot = t10 + (t11 - t10) * fx
            out[0, c_blk * im : c_blk * im + c_blk] = top + (bot - top) * fy

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_imgs
        + [
            pl.BlockSpec((2 * n_imgs, th, tw), lambda i, j, k, *_: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n_imgs, th, tw), lambda i, j, k, *_: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, n_imgs * c_blk, th, tw),
                lambda i, j, k, *_: (k, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_imgs * c_blk, RW, WC), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nc, n_imgs * c_blk, gy * th, gx * tw), jnp.float32)
        ],
        interpret=interpret,
    )


_sample_call_cached = functools.lru_cache(maxsize=None)(_build_sample_call)


def _variation_screen(dy, dx, th, tw, d_budget, dx_budget):
    """Cheap SUFFICIENT condition for a band to fit the residual budget.

    ``dy/dx``: displacement planes (clipped coords minus the output grid).
    A tile's residual extent is bounded by its within-tile displacement
    variation, itself bounded by ``th * max|row-diff| + tw * max|col-diff|``
    (plus 1 for the floor). Four diff+max reductions versus
    :func:`_prep_image`'s full per-tile min/max machinery — used to skip
    straight to the XLA path on wild bands without paying the prep.
    Conservative: a False here does NOT imply the exact ``fits`` check
    would fail, so screening trades fast-path coverage for prep savings.
    Opt-in everywhere and OFF by default — ``warp_prescreen`` config for
    the warp (measured -1% on chip), ``VMORPH_SAMPLE_PRESCREEN`` env for
    the sampler (:func:`_sample_prescreen`: the band-wide max-row-diff
    bound misreads ~0.5 px solver noise as wildness and was locking
    every realistic converged-field render out of the fast path).
    """
    dy_r = jnp.max(jnp.abs(jnp.diff(dy, axis=0)))
    dy_c = jnp.max(jnp.abs(jnp.diff(dy, axis=1)))
    dx_r = jnp.max(jnp.abs(jnp.diff(dx, axis=0)))
    dx_c = jnp.max(jnp.abs(jnp.diff(dx, axis=1)))
    ok_r = th * dy_r + tw * dy_c <= d_budget - 2
    ok_c = th * dx_r + tw * dx_c <= dx_budget - 2
    return ok_r & ok_c


def _sample_prescreen() -> bool:
    """Variation pre-screen in :func:`fused_sample` (``VMORPH_SAMPLE_PRESCREEN=1``
    restores it; default OFF). The screen bounds a tile's residual spread by
    ``th * max|row-diff|`` over the whole band, so ~0.5 px of SOLVER NOISE
    anywhere inflates to ``64 * 0.5 = 32`` ≫ budget and throws the band to
    the XLA gather even though the exact per-tile check passes — measured
    on the 4K converged field (relin_median on, exact busted tiles 0.3%):
    2.28 s/frame with the screen vs the smooth-field 0.14 s/frame floor.
    The exact ``_prep_image`` fits-check costs two reduction passes over
    the coord maps (~ms at 4K) — three orders cheaper than one wrongly
    screened-out frame, so the default pays prep always and lets the exact
    check dispatch."""
    return os.environ.get("VMORPH_SAMPLE_PRESCREEN", "0") not in ("", "0", "false")


# Measured on the chip at the north star (round 5, quarter-res inversion
# in): sample cap 0.4375 -> 7.06 s wall, 0.3125 -> 6.50 s (render 2.54 ->
# 2.06, the warm scan's advect samples ride along 3.03 -> 2.95), 0.25 ->
# 8.89 s and 0.1875 -> 9.17 s (frames tip over the cap and pay the FULL
# gather). Warp: with the PER-IMAGE fit masks (each image fills its own
# busted set instead of the union's), 0.4375 -> 6.53 s, 0.3125 -> 6.14 s
# (warm scan 2.98 -> 2.66, cold 0.55 -> 0.49), 0.25 -> 7.98 s (over-cap
# full gathers) — per-image busted fractions sit between 0.25 and 0.31
# on converged north-star fields (the union needed 7/16). The 5/16 warp
# cap is 1080p-CLASS ONLY: the same A/B at 4K went 26.8 -> 35.4 s
# (field displacement values scale with resolution, so within-tile tap
# spread doubles and 4K warps tip over 5/16); above ~1080p tile counts
# BOTH sites keep 7/16 — the sampler tips at 4K too (quiet-machine 4K
# bench: sample cap 5/16 -> 26.54 s, 7/16 -> 17.32 s; the warm scan's
# advect samples on mid-convergence 4K fields bust past 5/16 and pay
# ~0.6 s full-frame 4K gathers).
_MIXED_CAP_DEFAULTS = {"warp": 0.3125, "sample": 0.3125}
_MIXED_CAP_HIRES = {"warp": 0.4375, "sample": 0.4375}
# per-kind 1080p-class tile-count thresholds: warp tiles are (64,256)
# (17x8 = 136 at 1080p, 510 at 4K), sampler tiles (64,128) (17x15 = 255
# at 1080p, 1020 at 4K)
_MIXED_CAP_NT_1080P = {"warp": 160, "sample": 320}


def _mixed_cap(n_tiles: int, kind: str = "warp") -> int:
    """Static busted-tile budget of the mixed dispatch's compact fallback.

    The compact gather is sized for K tiles whether or not they are all
    busted (static shapes), so K trades headroom against fallback cost:
    too small -> frames with more busted tiles than K take the full-frame
    gather; too large -> every mixed-path frame pays a K-tile gather.
    diag_blocks (round 5, north-star converged fields): 20-28% of tiles
    bust the v1 budgets roughly independent of granularity (the moving
    blob's tap scatter is intrinsic). The cap is PER SITE (``kind``):
    the halfway-warp pair busts on the union of both images' coordinate
    maps at (64,256) tiles, and a 0.3125 cap measurably tipped north-star
    warm/cold frames over it (warm scan 3.03 -> 4.56 s, full-gather
    fallback) — the warp keeps 7/16; the one-coord-map sampler at
    (64,128) tiles stays under smaller caps (render 2.76 -> 2.39 s at
    0.3125, same A/B). ``VMORPH_MIXED_CAP_WARP`` / ``VMORPH_MIXED_CAP_SAMPLE``
    env (float fraction) override per site, ``VMORPH_MIXED_CAP`` both;
    read at trace time.
    """
    env = os.environ.get("VMORPH_MIXED_CAP_" + kind.upper()) or os.environ.get(
        "VMORPH_MIXED_CAP"
    )
    if env:
        frac = float(env)
    elif n_tiles <= _MIXED_CAP_NT_1080P[kind]:
        frac = _MIXED_CAP_DEFAULTS[kind]
    else:
        frac = _MIXED_CAP_HIRES[kind]
    return max(1, min(n_tiles, int(-(-n_tiles * frac // 1))))


def _tile_max(plane: jnp.ndarray, gy: int, gx: int, th: int, tw: int):
    """Per-tile max of an (gy*th, gx*tw) int plane -> (gy, gx)."""
    return jnp.max(plane.reshape(gy, th, gx, tw), axis=(1, 3))


def _to_tiles(a: jnp.ndarray, gy: int, gx: int, th: int, tw: int):
    """(..., gy*th, gx*tw) -> (gy*gx, ..., th, tw) tile-major blocks."""
    lead = a.shape[:-2]
    n = len(lead)
    a = a.reshape(lead + (gy, th, gx, tw))
    a = jnp.moveaxis(a, (n, n + 2), (0, 1))        # (gy, gx, ..., th, tw)
    return a.reshape((gy * gx,) + lead + (th, tw))


def _from_tiles(t: jnp.ndarray, gy: int, gx: int, th: int, tw: int):
    """Inverse of :func:`_to_tiles`."""
    lead = t.shape[1:-2]
    n = len(lead)
    t = t.reshape((gy, gx) + lead + (th, tw))
    t = jnp.moveaxis(t, (0, 1), (n, n + 2))        # (..., gy, th, gx, tw)
    return t.reshape(lead + (gy * th, gx * tw))


def _pad_coords_tiles(co: jnp.ndarray, hp: int, wp: int):
    """Edge-pad an (h, w, 2) coord map to full tiles (padded values are
    only ever sampled for tiles whose real rows busted; results there are
    cropped away)."""
    h, w = co.shape[:2]
    return jnp.pad(co, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")


def _mixed_select(prep, fit_t, gy: int, gx: int, th: int, tw: int):
    """Sentinel a prep's planes/bases so the kernel writes ZEROS on busted
    tiles and their window DMAs stay in range: dev/devx get the no-match
    residual (>= budget), bases clamp to offset 0 (valid memory — the
    same clamp ``_prep_image`` applies to empty tiles)."""
    dev, devx, fy, fx, oky, okx, row_start, phase, col_start, bx_frac, _f = prep
    fit_px = jnp.repeat(jnp.repeat(fit_t, th, 0), tw, 1)
    dev = jnp.where(fit_px, dev, jnp.int32(1 << 20))
    devx = jnp.where(fit_px, devx, jnp.int32(1 << 20))
    z = jnp.zeros_like(row_start)
    row_start = jnp.where(fit_t, row_start, z)
    phase = jnp.where(fit_t, phase, z)
    col_start = jnp.where(fit_t, col_start, z)
    bx_frac = jnp.where(fit_t, bx_frac, z)
    return dev, devx, fy, fx, oky, okx, row_start, phase, col_start, bx_frac


def _tile_fits(prep, d_budget: int, dx_budget: int, gy: int, gx: int,
               th: int, tw: int):
    """Per-tile fit mask (gy, gx) from a whole-frame ``_prep_image``."""
    dev, devx = prep[0], prep[1]
    row_start, col_start = prep[6], prep[8]
    return (
        (_tile_max(dev, gy, gx, th, tw) <= d_budget - 1)
        & (_tile_max(devx, gy, gx, th, tw) <= dx_budget - 1)
        & (row_start >= 0)
        & (col_start >= 0)
    )


def _topk_busted(busted_flat: jnp.ndarray, k: int):
    """(ids_clamped, ids_scatter) of up to ``k`` busted tiles.

    ``ids_clamped`` is safe for ``jnp.take`` (padding entries point at
    tile 0 — sampled then dropped); ``ids_scatter`` sends padding to
    ``n_tiles`` so ``.at[].set(mode='drop')`` discards it.
    """
    nt = busted_flat.shape[0]
    flags, ids = jax.lax.top_k(busted_flat.astype(jnp.int32), k)
    ids_c = jnp.minimum(ids, nt - 1)
    ids_s = jnp.where(flags > 0, ids, nt)
    return ids_c, ids_s


# Default sampler dispatch: "mixed" since round 5 — the render phase at
# the north star dropped 4.65 -> 2.76 s in the on-chip A/B (the VERDICT
# r4 #1 "break the XLA-gather floor" target: busted tiles now cost
# ~their-fraction of a gather instead of poisoning whole bands); exact,
# all gates unchanged (PERF.md round 5).
_SAMPLE_DISPATCH_DEFAULT = "mixed"


def _sample_dispatch_mode() -> str:
    """Resolve :func:`fused_sample` dispatch: ``band`` / ``map`` /
    ``mixed`` (``VMORPH_SAMPLE_DISPATCH`` env overrides; trace time)."""
    env = os.environ.get("VMORPH_SAMPLE_DISPATCH")
    if env in ("band", "map", "mixed"):
        return env
    return _SAMPLE_DISPATCH_DEFAULT


N_FALLBACK_BANDS = 4


def _fallback_bands(gy: int = 0) -> int:
    """Band count for fast/fallback dispatch (``VMORPH_FALLBACK_BANDS`` env
    overrides — an on-chip A/B knob: more bands = finer dispatch, so
    localized wild regions poison less of the frame, at the price of a
    bigger compiled program; read at trace time, so set it before jit).

    Auto (no env): 4 bands up to ~1080p, 16 above. At 4K the XLA-gather
    fallback degrades to ~70 ns/index (vs ~18 at 1080p) because random
    taps across a 133 MB source lose all DRAM locality; narrower output
    bands bound each gather's source working set and win ~10% end-to-end
    (round-4 A/B: 19.53 -> 17.65 s on the 4-frame 4K profile, render
    7.78 -> 6.90 s). At <=1080p finer bands measured neutral — the
    source already has enough locality — so the smaller program wins."""
    env = os.environ.get("VMORPH_FALLBACK_BANDS")
    if env:
        return int(env)
    return N_FALLBACK_BANDS if gy <= 20 else 16


def _row_bands(gy: int, h: int, th: int, n_bands: int | None = None):
    """Split ``gy`` tile rows into <= n_bands contiguous bands.

    Returns [(tile_row_start, tile_row_end, px_row_start, px_row_end)].
    The fast-path/fallback decision is taken PER BAND instead of per frame:
    converged fields typically bust the residual budget in a few localized
    tiles (measured 19% of tiles at the finest level on a rotational field;
    profile_4k round 3: 2.09 s/frame on a busted converged field vs
    0.14 s/frame on a smooth one — 15x, so dispatch granularity matters),
    and an all-or-nothing dispatch was throwing the whole frame to the XLA
    gather path for them.
    """
    n = min(n_bands if n_bands is not None else _fallback_bands(gy), gy)
    bands = []
    for k in range(n):
        t0 = (k * gy) // n
        t1 = ((k + 1) * gy) // n
        bands.append((t0, t1, t0 * th, min(t1 * th, h)))
    return bands


def fused_warp_planes(src0, src1, v, *, interpret=None, prescreen=False) -> jnp.ndarray:
    """Both halfway warps + derivatives as a RAW plane stack (6C, H, W).

    Plane order matches ``sweep.make_sweep_pack``'s layout exactly —
    w0 (C), w1 (C), dw0 (y,x per channel), dw1 — so the solver's
    re-linearization feeds the kernel output STRAIGHT into the static pack
    with no channel-major round trip (the (H, W, C, 2) moveaxis pair cost
    several ms per re-warp at 1080p).

    Fast/fallback dispatch is per horizontal band (``_row_bands``): only
    bands whose tiles bust the residual budget pay the XLA gather path.
    With ``prescreen`` (config ``warp_prescreen``), a cheap sufficient
    variation screen runs first and a wild band skips the per-tile prep
    entirely; outputs are identical either way.
    """
    if not isinstance(src0, WarpSource):
        src0 = make_warp_source(src0)
    if not isinstance(src1, WarpSource):
        src1 = make_warp_source(src1)
    i0, i1 = src0.img, src1.img
    h, w, C = i0.shape
    interpret = _auto_interpret(interpret)
    gy, gx = _cdiv(h, TH), _cdiv(w, TW)
    g = grid_coords(h, w, v.dtype)

    c0 = g - v
    c1 = g + v

    mode = _warp_dispatch_mode()
    if mode == "mixed":
        return _fused_warp_planes_mixed(src0, src1, c0, c1, interpret)
    if mode == "map" and gy > 1:
        return _fused_warp_planes_map(src0, src1, c0, c1, interpret)

    outs = []
    for (t0, t1, rs, re) in _row_bands(gy, h, TH):
        bt = t1 - t0
        c0b, c1b = c0[rs:re], c1[rs:re]

        def xla_path(_, c0b=c0b, c1b=c1b):
            w0, dw0 = bilinear_sample_with_grad(i0, c0b)
            w1, dw1 = bilinear_sample_with_grad(i1, c1b)
            planes = [w0[..., c] for c in range(C)] + [w1[..., c] for c in range(C)]
            for src in (dw0, dw1):
                for c in range(C):
                    planes += [src[..., c, 0], src[..., c, 1]]
            return jnp.stack(planes, 0)

        def prep_dispatch(_, c0b=c0b, c1b=c1b, bt=bt, rs=rs, re=re, xla_path=xla_path):
            p0 = _prep_image(c0b[..., 0], c0b[..., 1], h, w, bt, gx)
            p1 = _prep_image(c1b[..., 0], c1b[..., 1], h, w, bt, gx)
            fits = p0[-1] & p1[-1]

            def pallas_path(_, p0=p0, p1=p1):
                call = _warp_call_cached(C, bt, gx, interpret)
                bases = jnp.stack(
                    [p0[6], p0[7], p0[8], p0[9], p1[6], p1[7], p1[8], p1[9]], axis=-1
                ).astype(jnp.int32)
                idxi = jnp.stack([p0[0], p0[1], p1[0], p1[1]], 0).astype(jnp.int32)
                idxf = jnp.stack(
                    [p0[2], p0[3], p0[4], p0[5], p1[2], p1[3], p1[4], p1[5]], 0
                ).astype(jnp.float32)
                (out,) = call(bases, src0.phases, src1.phases, idxi, idxf)
                return out[:, : re - rs, :w].astype(v.dtype)

            return jax.lax.cond(fits, pallas_path, xla_path, None)

        # single-row/col bands have empty diffs (jnp.max of a zero-size
        # array is an error) — skip the screen there, mirroring the packed
        # variant's guard
        if prescreen and re - rs >= 2 and w >= 2:
            gb = g[rs:re]

            def screen_of(cb, gb=gb):
                y = jnp.clip(cb[..., 0], -float(MY), h - 1.0 + MY) - gb[..., 0]
                x = jnp.clip(cb[..., 1], -float(MX), w - 1.0 + MX) - gb[..., 1]
                return _variation_screen(y, x, TH, TW, D, DX)

            tame = screen_of(c0b) & screen_of(c1b)
            outs.append(jax.lax.cond(tame, prep_dispatch, xla_path, None))
        else:
            outs.append(prep_dispatch(None))

    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _fused_warp_planes_mixed(src0, src1, c0, c1, interpret: bool) -> jnp.ndarray:
    """MIXED per-tile dispatch body of :func:`fused_warp_planes` (round 5).

    diag_blocks (north-star converged fields) killed the premise of both
    the band and map dispatches: ~75% of (8,128)-and-coarser blocks are
    dead smooth (p50 residual spread <= 1) while ~25% are intrinsically
    scattered (spread 18-88 at ANY granularity — the moving content's tap
    scatter is real, not base-granularity artifact), and they are spread
    widely enough that every band/tile-row contains some. All-or-nothing
    dispatch at any granularity therefore degenerates to ~all-gather.

    This path instead runs the Pallas kernel over the WHOLE frame with
    busted tiles sentineled to produce zeros, then fills ONLY the busted
    tiles through the exact XLA gather, compacted tile-wise: whole (64,
    256) tiles ride single gather/scatter indices (gathers on this
    hardware are index-count bound — payload rides free), so the fallback
    pays ~busted-fraction of a full-frame gather instead of all of it.
    The compact buffer is statically sized (``_mixed_cap``); frames with
    more busted tiles than the cap take the full-frame gather (exact
    either way). Outputs are bit-identical to the band path — fit tiles
    come from the same kernel, busted tiles from the same XLA sampler.
    """
    i0, i1 = src0.img, src1.img
    h, w, C = i0.shape
    gy, gx = _cdiv(h, TH), _cdiv(w, TW)
    hp, wp = gy * TH, gx * TW
    nt = gy * gx
    dt = c0.dtype

    p0 = _prep_image(c0[..., 0], c0[..., 1], h, w, gy, gx)
    p1 = _prep_image(c1[..., 0], c1[..., 1], h, w, gy, gx)
    # PER-IMAGE fit masks (round 5, second session): the two coordinate
    # maps bust different tiles, and the UNION fraction on converged
    # north-star fields sits between 0.31 and 0.44 while each image's own
    # fraction is smaller — a joint mask forced the 7/16 cap on both
    # fills. The kernel sentinels per prep, so a tile can take kernel
    # values for one image and the XLA fill for the other.
    fit0 = _tile_fits(p0, D, DX, gy, gx, TH, TW)
    fit1 = _tile_fits(p1, D, DX, gy, gx, TH, TW)
    s0 = _mixed_select(p0, fit0, gy, gx, TH, TW)
    s1 = _mixed_select(p1, fit1, gy, gx, TH, TW)

    call = _warp_call_cached(C, gy, gx, interpret)
    bases = jnp.stack(
        [s0[6], s0[7], s0[8], s0[9], s1[6], s1[7], s1[8], s1[9]], axis=-1
    ).astype(jnp.int32)
    idxi = jnp.stack([s0[0], s0[1], s1[0], s1[1]], 0).astype(jnp.int32)
    idxf = jnp.stack(
        [s0[2], s0[3], s0[4], s0[5], s1[2], s1[3], s1[4], s1[5]], 0
    ).astype(jnp.float32)
    (out,) = call(bases, src0.phases, src1.phases, idxi, idxf)
    out = out.astype(dt)  # (6C, hp, wp); zeros on busted tiles

    k_cap = _mixed_cap(nt, "warp")

    def _img_stack(wi, dwi):
        """One image's plane stack in per-image order: C warped channels
        then C (y, x) gradient pairs -> (3C, ..., ...)."""
        planes = [wi[..., c] for c in range(C)]
        for c in range(C):
            planes += [dwi[..., c, 0], dwi[..., c, 1]]
        return jnp.stack(planes, 0)

    def _img_plane_ids(im: int):
        """This image's plane rows in the canonical (6C, ...) stack
        (w0 C, w1 C, dw0 2C, dw1 2C)."""
        return list(range(im * C, (im + 1) * C)) + list(
            range(2 * C + im * 2 * C, 2 * C + (im + 1) * 2 * C)
        )

    def _image_result(im, img, co, fit_i):
        """(3C, h, w) planes for one image: kernel output on fit tiles,
        compact XLA fill (or over-cap full gather) on its own busted set."""
        fast_i = out[jnp.asarray(_img_plane_ids(im))]   # (3C, hp, wp)
        busted_i = ~fit_i.reshape(-1)
        n_b = jnp.sum(busted_i.astype(jnp.int32))

        def fast_path(_):
            return fast_i[:, :h, :w]

        def compact_path(_):
            ids_c, ids_s = _topk_busted(busted_i, k_cap)
            ct = _to_tiles(
                jnp.moveaxis(_pad_coords_tiles(co, hp, wp), -1, 0), gy, gx, TH, TW
            )  # (nt, 2, TH, TW)
            sub_co = jnp.moveaxis(
                jnp.take(ct, ids_c, axis=0), 1, -1
            ).reshape(k_cap * TH, TW, 2)
            wi, dwi = bilinear_sample_with_grad(img, sub_co)
            sub = _img_stack(wi, dwi)                   # (3C, K*TH, TW)
            sub = jnp.moveaxis(sub.reshape(3 * C, k_cap, TH, TW), 0, 1)
            fast_t = _to_tiles(fast_i, gy, gx, TH, TW)  # (nt, 3C, TH, TW)
            filled = fast_t.at[ids_s].set(sub.astype(dt), mode="drop")
            return _from_tiles(filled, gy, gx, TH, TW)[:, :h, :w]

        def full_path(_):
            wi, dwi = bilinear_sample_with_grad(img, co)
            return _img_stack(wi, dwi)

        return jax.lax.cond(
            n_b == 0,
            fast_path,
            lambda op: jax.lax.cond(n_b <= k_cap, compact_path, full_path, op),
            None,
        )

    r0 = _image_result(0, i0, c0, fit0)
    r1 = _image_result(1, i1, c1, fit1)
    # back to the canonical order: w0 C, w1 C, dw0 2C, dw1 2C
    return jnp.concatenate(
        [r0[:C], r1[:C], r0[C : 3 * C], r1[C : 3 * C]], axis=0
    )


def _warp_dispatch_map() -> bool:
    """Per-tile-row dispatch for :func:`fused_warp_planes`
    (``VMORPH_WARP_DISPATCH``: ``map`` forces it on, ``band`` forces the
    unrolled band path, unset = default band — the round-4 on-chip A/B
    measured map neutral-to-worse at the north star because the TPS-spread
    field gradients bust the budget frame-wide, leaving no fit/bust
    boundary for finer dispatch to exploit; see PERF.md round 4).

    Rationale (round-4 device trace + diag_bands): on realistic converged
    1080p fields the within-tile coordinate variation busts the residual
    budget in the tile rows covering the moving content, and a <=4-band
    dispatch throws a quarter of the FRAME to the index-count-bound XLA
    gather for each of them (51 ms per re-linearization at 1080p, the warm
    scan's single largest op). Per-tile-row granularity confines the
    gather to the 64-row strips that actually bust; the compiled program
    contains ONE copy of the body (same trick as ``_fused_sample_map``).
    """
    env = os.environ.get("VMORPH_WARP_DISPATCH")
    if env == "map":
        return True
    if env == "band":
        return False
    return _WARP_DISPATCH_MAP_DEFAULT


# Flipped by the round-4 on-chip measurement once recorded in PERF.md;
# the env var above is the per-run override either way.
_WARP_DISPATCH_MAP_DEFAULT = False

# Default warp dispatch: "mixed" since round 5 — on-chip A/B at the north
# star: total 10.82 -> 7.33 s single-rep (cold solve 0.77 -> 0.55, warm
# scan 4.44 -> 3.08), bench 3-rep 7.17 s / 4.18 f/s at 0.0% spread with
# all gates unchanged (PERF.md round 5). Dispatch is exact — "band"/"map"
# remain as env escapes.
_WARP_DISPATCH_DEFAULT = "mixed"


def _warp_dispatch_mode() -> str:
    """Resolve the fused-warp dispatch: ``band`` (unrolled row bands, the
    round-1..4 path), ``map`` (per-tile-row lax.map), or ``mixed``
    (whole-frame kernel + compact per-tile gather fill — round 5).
    ``VMORPH_WARP_DISPATCH`` env overrides; read at trace time."""
    env = os.environ.get("VMORPH_WARP_DISPATCH")
    if env in ("band", "map", "mixed"):
        return env
    return _WARP_DISPATCH_DEFAULT


def _fused_warp_planes_map(src0, src1, c0, c1, interpret: bool) -> jnp.ndarray:
    """Per-tile-row dispatch body of :func:`fused_warp_planes`.

    One ``lax.map`` over ``gy`` single-tile-row bands of the halfway warp
    coords; each row independently takes the Pallas warp kernel or the
    exact XLA gather. Bit-identical to the band path (both are exact —
    tests/test_pallas.py warp dispatch invariance)."""
    i0, i1 = src0.img, src1.img
    h, w, C = i0.shape
    gy, gx = _cdiv(h, TH), _cdiv(w, TW)
    hp = gy * TH

    def pad_rows(co):
        # replicate the last row: identical rows add zero variation, so the
        # padding never busts the final row's budget; outputs are cropped
        return jnp.concatenate([co, jnp.repeat(co[-1:], hp - h, axis=0)], 0)

    co_rows = jnp.concatenate(
        [
            pad_rows(c0).reshape(gy, TH, w, 2),
            pad_rows(c1).reshape(gy, TH, w, 2),
        ],
        axis=1,
    )  # (gy, 2*TH, w, 2) — c0 rows then c1 rows per band

    def row_body(cb_all):
        cb0 = cb_all[:TH]
        cb1 = cb_all[TH:]

        def xla_path(_):
            w0, dw0 = bilinear_sample_with_grad(i0, cb0)
            w1, dw1 = bilinear_sample_with_grad(i1, cb1)
            planes = [w0[..., c] for c in range(C)] + [w1[..., c] for c in range(C)]
            for src in (dw0, dw1):
                for c in range(C):
                    planes += [src[..., c, 0], src[..., c, 1]]
            return jnp.stack(planes, 0)

        def prep_dispatch(_):
            p0 = _prep_image(cb0[..., 0], cb0[..., 1], h, w, 1, gx)
            p1 = _prep_image(cb1[..., 0], cb1[..., 1], h, w, 1, gx)
            fits = p0[-1] & p1[-1]

            def pallas_path(_):
                call = _warp_call_cached(C, 1, gx, interpret)
                bases = jnp.stack(
                    [p0[6], p0[7], p0[8], p0[9], p1[6], p1[7], p1[8], p1[9]],
                    axis=-1,
                ).astype(jnp.int32)
                idxi = jnp.stack([p0[0], p0[1], p1[0], p1[1]], 0).astype(jnp.int32)
                idxf = jnp.stack(
                    [p0[2], p0[3], p0[4], p0[5], p1[2], p1[3], p1[4], p1[5]], 0
                ).astype(jnp.float32)
                (out,) = call(bases, src0.phases, src1.phases, idxi, idxf)
                return out[:, :TH, :w].astype(cb0.dtype)

            return jax.lax.cond(fits, pallas_path, xla_path, None)

        return prep_dispatch(None)

    outs = jax.lax.map(row_body, co_rows)  # (gy, 6C, TH, w)
    return jnp.moveaxis(outs, 0, 1).reshape(6 * C, hp, w)[:, :h]


def packed_plane_geometry(p, h: int, w: int):
    """Geometry of the sweep static-pack layout IF this kernel can emit it
    directly: ``(halo, th, tw, gy, gx, rows, cols)`` or ``None``.

    Compatibility requires the sweep tile (th, tw + 2*halo) to equal this
    kernel's (TH, TW) tile and materialized column groups (gx > 1); small
    levels fall back to :func:`fused_warp_planes` + ``make_sweep_pack_planes``.
    The packed layout adds one extra tile row: packed row r holds image row
    r - halo (the shift keeps tile-row write offsets 8-aligned), so image
    rows [gy*th - halo, h) land beyond row gy*th.
    """
    from videomorphing_tpu.pallas.sweep import _sweep_geometry

    _taps, _r, halo, th, tw, gy, gx = _sweep_geometry(p, h, w)
    if gx <= 1 or th != TH or tw + 2 * halo != TW:
        return None
    return halo, th, tw, gy, gx, (gy + 1) * th, gx * TW


def _pack_plane(a, halo: int, th: int, tw: int, gy: int, gx: int):
    """(H, W) image plane -> ((gy+1)*th, gx*(tw+2*halo)) packed layout.

    Mirrors ``sweep._pack``'s zero pad + materialized column groups, with
    the packed-warp row shift (packed row r = image row r - halo)."""
    h, w = a.shape
    cg = tw + 2 * halo
    ap = jnp.pad(a, ((halo, (gy + 1) * th - h - halo), (halo, gx * tw - w + halo)))
    return jnp.concatenate([ap[:, j * tw : j * tw + cg] for j in range(gx)], axis=1)


def fused_warp_planes_packed(src0, src1, v, p, *, interpret=None) -> jnp.ndarray:
    """Both halfway warps + derivatives emitted DIRECTLY in the sweep
    static-pack layout (TODO.md perf rank 1: "warp directly into the
    sweep-pack layout").

    :func:`fused_warp_planes` + ``sweep.make_sweep_pack_planes`` rebuilds
    the packed plane stack through an XLA stack/pad/column-group copy
    pipeline EVERY re-linearization. Here the pack layout is instead baked
    into the COORDINATE planes once (2 small planes per image), and both
    the Pallas kernel and the per-band XLA fallback evaluate the sampling
    straight into pack positions — the 6C output planes never exist in
    image layout at all. Padding positions carry a no-match residual
    sentinel (kernel path) / a zero mask (XLA path), reproducing
    ``sweep._pack``'s zero padding exactly.

    Returns the (6C, (gy+1)*th, gx*(tw+2*halo)) static WARP pack consumed
    by ``sweep.fused_value_grad_precond_split`` (paired with the per-level
    const pack and the per-relinearization v_lin pack). jnp twin for
    tests: ``make_sweep_pack_planes(fused_warp_planes(...))`` restricted
    to the first 6C planes (up to the row shift).
    """
    if not isinstance(src0, WarpSource):
        src0 = make_warp_source(src0)
    if not isinstance(src1, WarpSource):
        src1 = make_warp_source(src1)
    i0, i1 = src0.img, src1.img
    h, w, C = i0.shape
    interpret = _auto_interpret(interpret)
    geom = packed_plane_geometry(p, h, w)
    assert geom is not None, "packed_plane_geometry must be checked by the caller"
    halo, th, tw, gy, gx, rows, cols = geom
    from videomorphing_tpu.pallas.sweep import _pack_dtype

    dt = _pack_dtype(p)

    g = grid_coords(h, w, v.dtype)
    c0 = g - v
    c1 = g + v
    pk = lambda a: _pack_plane(a, halo, th, tw, gy, gx)
    c0y, c0x = pk(c0[..., 0]), pk(c0[..., 1])
    c1y, c1x = pk(c1[..., 0]), pk(c1[..., 1])
    mask = pk(jnp.ones((h, w), v.dtype))

    n_rows = gy + 1
    outs = []
    for (t0, t1, rs, re) in _row_bands(n_rows, n_rows * th, th):
        bt = t1 - t0
        sl = slice(rs, re)
        mb = mask[sl]

        def xla_path(_, sl=sl, mb=mb):
            cb0 = jnp.stack([c0y[sl], c0x[sl]], -1)
            cb1 = jnp.stack([c1y[sl], c1x[sl]], -1)
            w0, dw0 = bilinear_sample_with_grad(i0, cb0)
            w1, dw1 = bilinear_sample_with_grad(i1, cb1)
            m = mb.astype(w0.dtype)
            planes = [w0[..., c] * m for c in range(C)] + [
                w1[..., c] * m for c in range(C)
            ]
            for src in (dw0, dw1):
                for c in range(C):
                    planes += [src[..., c, 0] * m, src[..., c, 1] * m]
            return jnp.stack(planes, 0).astype(dt)

        def prep_dispatch(_, sl=sl, mb=mb, bt=bt, xla_path=xla_path):
            p0 = _prep_image(c0y[sl], c0x[sl], h, w, bt, gx, th=th, tw=TW, valid=mb)
            p1 = _prep_image(c1y[sl], c1x[sl], h, w, bt, gx, th=th, tw=TW, valid=mb)
            fits = p0[-1] & p1[-1]

            def pallas_path(_, p0=p0, p1=p1):
                call = _warp_call_cached(C, bt, gx, interpret, dt)
                bases = jnp.stack(
                    [p0[6], p0[7], p0[8], p0[9], p1[6], p1[7], p1[8], p1[9]], axis=-1
                ).astype(jnp.int32)
                idxi = jnp.stack([p0[0], p0[1], p1[0], p1[1]], 0).astype(jnp.int32)
                idxf = jnp.stack(
                    [p0[2], p0[3], p0[4], p0[5], p1[2], p1[3], p1[4], p1[5]], 0
                ).astype(jnp.float32)
                (out,) = call(bases, src0.phases, src1.phases, idxi, idxf)
                return out  # already pack-layout, nothing to crop

            return jax.lax.cond(fits, pallas_path, xla_path, None)

        # Pre-screen in IMAGE layout (config warp_prescreen): pack band
        # rows [rs, re) hold image rows [rs - halo, re - halo); a pack
        # tile's samples come from a (th, TW)-extent image window, so the
        # image-layout variation bound covers the pack-layout tiles. The
        # pack's zero-padding positions never enter (they'd fake huge
        # diffs); bands with < 2 valid image rows skip the screen.
        img_lo, img_hi = max(0, rs - halo), min(h, re - halo)
        if p.warp_prescreen and img_hi - img_lo >= 2 and w >= 2:
            gb = g[img_lo:img_hi]

            def screen_of(cimg, gb=gb, sl_i=slice(img_lo, img_hi)):
                y = jnp.clip(cimg[sl_i, :, 0], -float(MY), h - 1.0 + MY) - gb[..., 0]
                x = jnp.clip(cimg[sl_i, :, 1], -float(MX), w - 1.0 + MX) - gb[..., 1]
                return _variation_screen(y, x, th, TW, D, DX)

            tame = screen_of(c0) & screen_of(c1)
            outs.append(jax.lax.cond(tame, prep_dispatch, xla_path, None))
        else:
            outs.append(prep_dispatch(None))

    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def fused_sample(srcs, coords, *, interpret=None):
    """Bilinearly sample each image at its own smooth coordinate map.

    ``srcs``: sequence of :class:`WarpSource` (or raw (H, W, C) images, all
    the same shape); ``coords``: matching sequence of (H, W, 2) maps in
    (y, x). Returns a list of (H, W, C) sample planes. Twin of
    ``[bilinear_sample(img_k, coords_k)]`` (same edge-clamp semantics);
    Pallas-fast per horizontal band when that band's coordinate variation
    fits the residual budget, exact-XLA fallback per band otherwise
    (``_row_bands`` — converged render fields bust the budget in localized
    regions, not frame-wide).

    Dispatch granularity (profile_4k round 3: a converged field busted
    enough scattered tiles to throw ~every band to the gather path —
    2.09 s/frame vs 0.14 on a smooth field): ``VMORPH_SAMPLE_DISPATCH=map``
    switches to a ``lax.map`` over single tile rows with the fast/fallback
    ``cond`` INSIDE the body — per-tile-row granularity at CONSTANT
    compiled-program size (one shared body instead of N unrolled bands).
    """
    srcs = [s if isinstance(s, WarpSource) else make_warp_source(s) for s in srcs]
    n_imgs = len(srcs)
    assert n_imgs == len(coords) and n_imgs >= 1
    h, w, C = srcs[0].img.shape
    for s in srcs:
        assert s.img.shape == (h, w, C), "all sources must share (H, W, C)"
    assert C in (1, 2, 3, 4), f"fused_sample supports C<=4, got {C}"
    c_blk, nc = (C, 1) if C <= 3 else (2, 2)
    interpret = _auto_interpret(interpret)
    gy, gx = _cdiv(h, TH_S), _cdiv(w, TW_S)

    smode = _sample_dispatch_mode()
    if smode == "mixed":
        return _fused_sample_mixed(srcs, coords, c_blk, nc, interpret)
    if smode == "map" and gy > 1:
        return _fused_sample_map(srcs, coords, c_blk, nc, interpret)

    g = grid_coords(h, w, coords[0].dtype)

    band_outs = []
    for (t0, t1, rs, re) in _row_bands(gy, h, TH_S):
        bt = t1 - t0
        cb = [co[rs:re] for co in coords]
        gb = g[rs:re]

        # Cheap sufficient pre-screen BEFORE the expensive per-tile prep:
        # the per-tile residual is bounded by the clamped displacement's
        # variation, variation <= th*max|d_y row-diff| + tw*max|d_x
        # col-diff|. When a band is wild this skips straight to the XLA
        # path instead of paying the min-reduction prep only to cond it
        # away.
        def _screen(co):
            # clip to the same EXTENDED range as _prep_image so smooth maps
            # running off-frame are not misread as wild (see MY/MX comment)
            y = jnp.clip(co[..., 0], -float(MY), h - 1.0 + MY) - gb[..., 0]
            x = jnp.clip(co[..., 1], -float(MX), w - 1.0 + MX) - gb[..., 1]
            return _variation_screen(y, x, TH_S, TW_S, D, DX_SAMPLE)

        def xla_path(_, cb=cb):
            from videomorphing_tpu.ops.resample import bilinear_sample

            return tuple(
                bilinear_sample(s.img, co) for s, co in zip(srcs, cb)
            )

        def pallas_prep_path(_, cb=cb, bt=bt, rs=rs, re=re, xla_path=xla_path):
            preps = [
                _prep_image(
                    co[..., 0], co[..., 1], h, w, bt, gx,
                    dx_budget=DX_SAMPLE, th=TH_S, tw=TW_S,
                )
                for co in cb
            ]
            fits = preps[0][-1]
            for p_ in preps[1:]:
                fits = fits & p_[-1]

            def kernel_path(_):
                call = _sample_call_cached(c_blk, nc, n_imgs, bt, gx, interpret)
                bases = jnp.stack(
                    [p_[i] for p_ in preps for i in (6, 7, 8, 9)], axis=-1
                ).astype(jnp.int32).reshape(bt, gx, 4 * n_imgs)
                idxi = jnp.stack(
                    [p_[i] for p_ in preps for i in (0, 1)], 0
                ).astype(jnp.int32)
                idxf = jnp.stack(
                    [p_[i] for p_ in preps for i in (2, 3)], 0
                ).astype(jnp.float32)
                (out,) = call(bases, *[s.phases for s in srcs], idxi, idxf)
                out = out[:, :, : re - rs, :w]
                return tuple(
                    jnp.moveaxis(
                        jnp.concatenate(
                            [out[k, c_blk * im : c_blk * (im + 1)] for k in range(nc)], 0
                        ),
                        0, -1,
                    ).astype(cb[im].dtype)
                    for im in range(n_imgs)
                )

            return jax.lax.cond(fits, kernel_path, xla_path, None)

        if _sample_prescreen():
            tame = _screen(cb[0])
            for co in cb[1:]:
                tame = tame & _screen(co)
            band_outs.append(jax.lax.cond(tame, pallas_prep_path, xla_path, None))
        else:
            band_outs.append(pallas_prep_path(None))

    if len(band_outs) == 1:
        return list(band_outs[0])
    return [
        jnp.concatenate([b[im] for b in band_outs], axis=0)
        for im in range(n_imgs)
    ]


def _fused_sample_mixed(srcs, coords, c_blk: int, nc: int, interpret: bool):
    """MIXED per-tile dispatch body of :func:`fused_sample` (round 5).

    Same construction as :func:`_fused_warp_planes_mixed` (see its
    docstring for the diag_blocks rationale): one whole-frame kernel call
    with busted tiles sentineled to zeros, then per image a compact
    tile-gather -> exact XLA bilinear -> tile-scatter fill of only the
    busted tiles. Per-image fit masks (each image has its own coordinate
    map, unlike the halfway warp pair).
    """
    from videomorphing_tpu.ops.resample import bilinear_sample

    n_imgs = len(srcs)
    h, w, C = srcs[0].img.shape
    th, tw = TH_S, TW_S
    gy, gx = _cdiv(h, th), _cdiv(w, tw)
    hp, wp = gy * th, gx * tw
    nt = gy * gx
    dt = coords[0].dtype

    preps = [
        _prep_image(
            co[..., 0], co[..., 1], h, w, gy, gx,
            dx_budget=DX_SAMPLE, th=th, tw=tw,
        )
        for co in coords
    ]
    fits = [_tile_fits(p, D, DX_SAMPLE, gy, gx, th, tw) for p in preps]
    sels = [_mixed_select(p, f, gy, gx, th, tw) for p, f in zip(preps, fits)]

    call = _sample_call_cached(c_blk, nc, n_imgs, gy, gx, interpret)
    bases = jnp.stack(
        [s[i] for s in sels for i in (6, 7, 8, 9)], axis=-1
    ).astype(jnp.int32).reshape(gy, gx, 4 * n_imgs)
    idxi = jnp.stack([s[i] for s in sels for i in (0, 1)], 0).astype(jnp.int32)
    idxf = jnp.stack([s[i] for s in sels for i in (2, 3)], 0).astype(jnp.float32)
    (out,) = call(bases, *[s.phases for s in srcs], idxi, idxf)
    # (nc, n_imgs*c_blk, hp, wp)

    k_cap = _mixed_cap(nt, "sample")
    res = []
    for im in range(n_imgs):
        fast = jnp.moveaxis(
            jnp.concatenate(
                [out[k, c_blk * im : c_blk * (im + 1)] for k in range(nc)], 0
            ),
            0, -1,
        ).astype(dt)  # (hp, wp, C); zeros on this image's busted tiles
        busted = ~fits[im].reshape(-1)
        n_b = jnp.sum(busted.astype(jnp.int32))
        img = srcs[im].img
        co = coords[im]

        def fast_path(_, fast=fast):
            return fast[:h, :w]

        def compact_path(_, fast=fast, busted=busted, img=img, co=co):
            ids_c, ids_s = _topk_busted(busted, k_cap)
            ct = _to_tiles(
                jnp.moveaxis(_pad_coords_tiles(co, hp, wp), -1, 0), gy, gx, th, tw
            )
            sub = jnp.moveaxis(jnp.take(ct, ids_c, axis=0), 1, -1)
            vals = bilinear_sample(img, sub.reshape(k_cap * th, tw, 2))
            vals = jnp.moveaxis(
                vals.reshape(k_cap, th, tw, C), -1, 1
            )  # (K, C, th, tw)
            fast_t = _to_tiles(jnp.moveaxis(fast, -1, 0), gy, gx, th, tw)
            filled = fast_t.at[ids_s].set(vals.astype(dt), mode="drop")
            return jnp.moveaxis(_from_tiles(filled, gy, gx, th, tw), 0, -1)[:h, :w]

        def full_path(_, img=img, co=co):
            return bilinear_sample(img, co)

        res.append(
            jax.lax.cond(
                n_b == 0,
                fast_path,
                lambda op, c=compact_path, f=full_path, n=n_b: jax.lax.cond(
                    n <= k_cap, c, f, op
                ),
                None,
            )
        )
    return res


def _fused_sample_map(srcs, coords, c_blk: int, nc: int, interpret: bool):
    """Per-tile-row dispatch body of :func:`fused_sample`
    (``VMORPH_SAMPLE_DISPATCH=map``).

    One ``lax.map`` over ``gy`` single-tile-row bands; each iteration
    screens its own row and takes the Pallas kernel or the exact XLA
    gather. vs the unrolled band loop: the program contains ONE copy of
    the body (constant compile size at any granularity) and a wild tile
    row only ever sends ITSELF to the gather path. Sequential over rows,
    which costs nothing here — a single TPU core runs the band programs
    sequentially either way. Outputs are bit-identical to the band path
    (both are exact; tests/test_pallas.py band_count_invariant family).
    """
    n_imgs = len(srcs)
    h, w, C = srcs[0].img.shape
    gy, gx = _cdiv(h, TH_S), _cdiv(w, TW_S)
    hp = gy * TH_S
    g = grid_coords(h, w, coords[0].dtype)

    # pad coords to full tile rows by REPLICATING the last row: identical
    # rows have zero within-tile variation, so padding never busts a row's
    # budget, and the padded outputs are cropped off below
    def pad_rows(co):
        return jnp.concatenate([co, jnp.repeat(co[-1:], hp - h, axis=0)], 0)

    co_rows = jnp.stack(
        [pad_rows(co).reshape(gy, TH_S, w, 2) for co in coords], 1
    )  # (gy, n_imgs, TH_S, w, 2)
    g_rows = pad_rows(g).reshape(gy, TH_S, w, 2)

    def row_body(xs):
        cb_all, gb = xs  # (n_imgs, TH_S, w, 2), (TH_S, w, 2)
        cb = [cb_all[im] for im in range(n_imgs)]

        def _screen(co):
            y = jnp.clip(co[..., 0], -float(MY), h - 1.0 + MY) - gb[..., 0]
            x = jnp.clip(co[..., 1], -float(MX), w - 1.0 + MX) - gb[..., 1]
            return _variation_screen(y, x, TH_S, TW_S, D, DX_SAMPLE)

        def xla_path(_):
            from videomorphing_tpu.ops.resample import bilinear_sample

            return tuple(
                bilinear_sample(s.img, co) for s, co in zip(srcs, cb)
            )

        def pallas_prep_path(_):
            preps = [
                _prep_image(
                    co[..., 0], co[..., 1], h, w, 1, gx,
                    dx_budget=DX_SAMPLE, th=TH_S, tw=TW_S,
                )
                for co in cb
            ]
            fits = preps[0][-1]
            for p_ in preps[1:]:
                fits = fits & p_[-1]

            def kernel_path(_):
                call = _sample_call_cached(c_blk, nc, n_imgs, 1, gx, interpret)
                bases = jnp.stack(
                    [p_[i] for p_ in preps for i in (6, 7, 8, 9)], axis=-1
                ).astype(jnp.int32).reshape(1, gx, 4 * n_imgs)
                idxi = jnp.stack(
                    [p_[i] for p_ in preps for i in (0, 1)], 0
                ).astype(jnp.int32)
                idxf = jnp.stack(
                    [p_[i] for p_ in preps for i in (2, 3)], 0
                ).astype(jnp.float32)
                (out,) = call(bases, *[s.phases for s in srcs], idxi, idxf)
                out = out[:, :, :TH_S, :w]
                return tuple(
                    jnp.moveaxis(
                        jnp.concatenate(
                            [out[k, c_blk * im : c_blk * (im + 1)] for k in range(nc)], 0
                        ),
                        0, -1,
                    ).astype(cb[im].dtype)
                    for im in range(n_imgs)
                )

            return jax.lax.cond(fits, kernel_path, xla_path, None)

        if _sample_prescreen():
            tame = _screen(cb[0])
            for co in cb[1:]:
                tame = tame & _screen(co)
            return jax.lax.cond(tame, pallas_prep_path, xla_path, None)
        return pallas_prep_path(None)

    outs = jax.lax.map(row_body, (co_rows, g_rows))  # each (gy, TH_S, w, C)
    return [outs[im].reshape(hp, w, C)[:h] for im in range(n_imgs)]


def fused_warp_pair(src0, src1, v, *, interpret=None, prescreen=False):
    """Both halfway warps with derivatives: Pallas-fast per band when the
    field is tame there, exact-XLA per band otherwise.

    ``src0/src1``: :class:`WarpSource` (preferred — build once per level) or
    raw (H, W, C) images. Twin of ``(bilinear_sample_with_grad(i0, g - v),
    bilinear_sample_with_grad(i1, g + v))``; returns (w0, dw0, w1, dw1).
    Thin unpacking wrapper over :func:`fused_warp_planes` (shares its
    per-band fallback dispatch).
    """
    if not isinstance(src0, WarpSource):
        src0 = make_warp_source(src0)
    if not isinstance(src1, WarpSource):
        src1 = make_warp_source(src1)
    h, w, C = src0.img.shape
    out = fused_warp_planes(src0, src1, v, interpret=interpret, prescreen=prescreen)
    w0 = jnp.moveaxis(out[0:C], 0, -1)
    w1 = jnp.moveaxis(out[C : 2 * C], 0, -1)
    dw0 = jnp.moveaxis(out[2 * C : 4 * C].reshape(C, 2, h, w), (0, 1), (2, 3))
    dw1 = jnp.moveaxis(out[4 * C : 6 * C].reshape(C, 2, h, w), (0, 1), (2, 3))
    return w0, dw0, w1, dw1


