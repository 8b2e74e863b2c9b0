"""Profile the 4K pair solve (VERDICT r1 weak #2: ~3x off the pixel-scaling law).

Run from /root/repo on the TPU:  python scripts/profile_4k.py [--trace DIR]

Phases:
 1. synthesize a 4K pair ON DEVICE (PERF.md methodology — never ship pixels
    through the ~10 MB/s tunnel, never reuse input content across runs);
 2. steady-state timing of the full solve (2nd call), per-level stats;
 3. diagnostic: at the converged field of each fine level, does
    fused_warp_planes take the Pallas path (fits=True) or the XLA fallback?
    Same question for the renderer's fused_sample pre-screen;
 4. optional jax.profiler trace of one steady solve.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.ops.pyramid import auto_n_levels, gaussian_pyramid, pyramid_shapes
from videomorphing_tpu.solver.ctf import optimize_pair, resample_field
from videomorphing_tpu.utils.cache import enable_compile_cache


def fetch(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))  # tunnel-safe barrier


from scripts.synth_workload import make_pair  # noqa: E402  (shared workload)


def fits_diagnostics(v, th, tw, d_budget, dx_budget):
    """Per-tile residual-budget stats for a (th, tw) tile geometry at field v.

    Returns (all_fit, frac_tiles_busted, max_dev, max_devx) — mirrors
    pallas/warp._prep_image's budget arithmetic: per-tile dev spread =
    max - min over the tile of (tap_index - position_in_tile)."""
    h, w = v.shape[:2]
    gy, gx = -(-h // th), -(-w // tw)

    @jax.jit
    def diag(v):
        from videomorphing_tpu.ops.resample import grid_coords
        from videomorphing_tpu.pallas.warp import MX, MY

        g = grid_coords(h, w, v.dtype)
        stats = []
        for c in (g - v, g + v):
            # mirror _prep_image's EXTENDED clip (warp.py: sources are
            # edge-replicated by (MY, MX), so off-frame taps within the
            # margins stay on the fast path — the old hard [0, h-1] clamp
            # here reported fits=False for fields the kernel accepts)
            y = jnp.clip(c[..., 0], -float(MY), h - 1.0 + MY)
            x = jnp.clip(c[..., 1], -float(MX), w - 1.0 + MX)
            iy = jnp.clip(jnp.floor(y), -float(MY), h - 2.0 + MY).astype(jnp.int32)
            ix = jnp.clip(jnp.floor(x), -float(MX), w - 2.0 + MX).astype(jnp.int32)
            hp, wp = gy * th, gx * tw
            row_in = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) % th
            col_in = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1) % tw
            big = jnp.int32(1 << 28)
            pad = lambda a: jnp.pad(a, ((0, hp - h), (0, wp - w)), constant_values=big)
            rel_y = (pad(iy) - row_in).reshape(gy, th, gx, tw)
            rel_x = (pad(ix) - col_in).reshape(gy, th, gx, tw)
            # masked min/max over each tile (padding -> big, excluded via min)
            mn_y = jnp.min(rel_y, (1, 3))
            mx_y = jnp.max(jnp.where(rel_y >= big // 2, jnp.int32(-(1 << 28)), rel_y), (1, 3))
            mn_x = jnp.min(rel_x, (1, 3))
            mx_x = jnp.max(jnp.where(rel_x >= big // 2, jnp.int32(-(1 << 28)), rel_x), (1, 3))
            dev = jnp.maximum(mx_y - mn_y, 0)
            devx = jnp.maximum(mx_x - mn_x, 0)
            stats.append((dev, devx))
        dev = jnp.maximum(stats[0][0], stats[1][0])
        devx = jnp.maximum(stats[0][1], stats[1][1])
        busted = (dev > d_budget - 1) | (devx > dx_budget - 1)
        return (~jnp.any(busted), jnp.mean(busted.astype(jnp.float32)),
                jnp.max(dev), jnp.max(devx))

    ok, frac, md, mdx = jax.device_get(diag(v))
    return bool(ok), float(frac), int(md), int(mdx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--median", action="store_true",
                    help="relin_median: 3x3 field median at each relin")
    args = ap.parse_args()

    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices())
    h, w = args.h, args.w

    i0, i1, v_true = make_pair(h, w, int(time.time_ns()) % (1 << 31))
    fetch(i0)
    print(f"pair ready {h}x{w}, |v_true| max={fetch(jnp.max(jnp.abs(v_true))):.1f}")

    mp = MorphParams()
    if args.median:
        import dataclasses

        mp = dataclasses.replace(mp, relin_median=True)
    n_levels = auto_n_levels(h, w, mp.min_level_size)
    print("n_levels:", n_levels)

    res = None
    for rep in range(args.reps):
        if rep:  # fresh content per rep (runtime result-caches identical inputs)
            i0, i1, v_true = make_pair(h, w, int(time.time_ns()) % (1 << 31))
            fetch(i0)
        t0 = time.perf_counter()
        res = optimize_pair(i0, i1, params=mp)
        fetch(res.v)
        dt = time.perf_counter() - t0
        print(f"solve rep {rep}: {dt:.2f}s")

    # i0(p)=img(p-d), i1(p)=img(p+d) with phi0=p-v, phi1=p+v  =>  v ~ -d
    err = jnp.linalg.norm(res.v + v_true, axis=-1)
    print(
        f"v err vs truth: mean={fetch(jnp.mean(err)):.3f} "
        f"p99={fetch(jnp.percentile(err, 99)):.3f} max={fetch(jnp.max(err)):.3f} px"
    )

    # render timing (the other half of the 'solve+render' PERF numbers)
    from videomorphing_tpu.config import SynthParams
    from videomorphing_tpu.synth.paths import jitted_bulge_field
    from videomorphing_tpu.synth.render import jitted_render_clip

    sp = SynthParams()
    render_clip = lambda i0_, i1_, v_, b_, ts_, _sp: jitted_render_clip(_sp)(i0_, i1_, v_, b_, ts_)
    b = jitted_bulge_field(sp)(res.v)
    n_rf = 4
    ts = jnp.linspace(0.15, 0.85, n_rf)
    for rep in range(args.reps):
        # PERF.md methodology: the runtime result-caches identical
        # (executable, inputs) pairs — nudge ts per rep so every timed call
        # computes for real (same shapes, fresh values)
        ts_r = ts + 1e-4 * (rep + 1)
        t0 = time.perf_counter()
        frames = render_clip(i0, i1, res.v, b, ts_r, sp)
        fetch(frames)
        dt = time.perf_counter() - t0
        print(f"render {n_rf} frames rep {rep}: {dt:.2f}s ({dt / n_rf:.2f}s/frame)")

    # same render driven by the analytically-true SMOOTH field — separates
    # "render cost on a realistic converged field" from "render cost on a
    # wild field that busts every fused-path budget"
    v_s = -v_true
    b_s = jitted_bulge_field(sp)(v_s)
    for rep in range(args.reps):
        ts_r = ts + 1e-4 * (rep + 1)  # fresh values: defeat result-caching
        t0 = time.perf_counter()
        frames = render_clip(i0, i1, v_s, b_s, ts_r, sp)
        fetch(frames)
        dt = time.perf_counter() - t0
        print(f"render(true v) rep {rep}: {dt:.2f}s ({dt / n_rf:.2f}s/frame)")
    for lv, st in enumerate(res.level_stats):
        print(
            f"  level {lv}: e0={fetch(st.e0):.4f} ef={fetch(st.e_final):.4f} "
            f"iters={fetch(st.iters):.0f}"
        )

    # fits diagnostics at converged fields per level (downsample the final v)
    from videomorphing_tpu.pallas.warp import D, DX, DX_SAMPLE, TH, TH_S, TW, TW_S

    shapes = pyramid_shapes(h, w, n_levels)
    v = res.v
    for lv in range(min(4, n_levels)):
        hw = shapes[lv]
        v_l = v if lv == 0 else resample_field(v, hw)  # rescales magnitudes itself
        ok, frac, md, mdx = fits_diagnostics(v_l, TH, TW, D, DX)
        ok_s, frac_s, md_s, mdx_s = fits_diagnostics(v_l, TH_S, TW_S, D, DX_SAMPLE)
        print(
            f"  level {lv} {hw}: warp fits={ok} busted_tiles={frac:.3f} "
            f"max_dev=({md},{mdx}) | sampler fits={ok_s} busted={frac_s:.3f} "
            f"max_dev=({md_s},{mdx_s})"
        )

    if args.trace:
        with jax.profiler.trace(args.trace):
            res = optimize_pair(i0, i1, params=mp)
            fetch(res.v)
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
