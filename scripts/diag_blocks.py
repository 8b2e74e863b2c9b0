"""Per-(BH, BW)-block residual-spread diagnostics for the round-5 fine-base
fused warp/sampler design (VERDICT r4 #1).

The round-4 conclusion was that converged north-star fields spread 34-99
rows / 32-94 lanes of tap variation across a (64, 256) warp tile — no
feasible single-base enumeration budget covers it.  The round-5 design
gives each (BH, BW) SUB-BLOCK its own DMA base (rows 8-aligned via the
phase copies, lanes 128-aligned + frac roll), so only the WITHIN-BLOCK
spread must fit the enumeration budget.  This script measures, on the
actual solved north-star fields, the distribution of within-block spreads

    dev spread  = max(iy - row_in_block) - min(...)   per block
    devx spread = max(ix - col_in_block) - min(...)   per block

for candidate block shapes, plus the fraction of blocks/bands fitting
candidate budgets — the data that picks (BH, BW, D2, DX2) before any
kernel is built.

Run on the TPU:  python scripts/diag_blocks.py [--frames 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.config import MorphParams, VideoParams
from videomorphing_tpu.utils.cache import enable_compile_cache
from videomorphing_tpu.video.pipeline import solve_clip_fields

from bench import _make_clips_device


def block_spreads(cy, cx, h, w, bh, bw):
    """(n_blocks,) within-block spreads of the integer tap offsets.

    Mirrors pallas.warp._prep_image: rel = floor(clip(coord)) - in-block
    index; spread = per-block max(rel) - min(rel). The kernel's residual
    budget must cover spread + 1 (the floor tap pair).
    """
    from videomorphing_tpu.pallas.warp import MX, MY

    y = jnp.clip(cy, -float(MY), h - 1.0 + MY)
    x = jnp.clip(cx, -float(MX), w - 1.0 + MX)
    iy = jnp.floor(y).astype(jnp.int32)
    ix = jnp.floor(x).astype(jnp.int32)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    row_in = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % bh
    col_in = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % bw
    rel_y = iy - row_in
    rel_x = ix - col_in

    def pad_edge(a):
        return jnp.pad(a, ((0, hp - h), (0, wp - w)), mode="edge")

    def spread(rel):
        b = pad_edge(rel).reshape(hp // bh, bh, wp // bw, bw)
        return (jnp.max(b, (1, 3)) - jnp.min(b, (1, 3))).reshape(-1)

    return spread(rel_y), spread(rel_x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    t_len, h, w = args.frames, args.h, args.w
    gen = jax.jit(lambda s: _make_clips_device(t_len, h, w, s))
    ca, cb = gen(jnp.int32(7))
    fields, _tr, _fl = solve_clip_fields(ca, cb, mp=MorphParams(), vp=VideoParams())

    g_y = jnp.arange(h, dtype=jnp.float32)[:, None] + jnp.zeros((1, w), jnp.float32)
    g_x = jnp.arange(w, dtype=jnp.float32)[None, :] + jnp.zeros((h, 1), jnp.float32)

    shapes = [(8, 128), (8, 256), (16, 128), (16, 256), (64, 128), (64, 256)]
    budgets = [6, 8, 12, 16, 24, 32, 48]
    frame_idx = sorted({min(t, t_len - 1) for t in (1, t_len // 2, t_len - 1)})

    sp_fn = {}
    for bh, bw in shapes:
        sp_fn[(bh, bw)] = jax.jit(
            lambda cy, cx, bh=bh, bw=bw: block_spreads(cy, cx, h, w, bh, bw)
        )

    report = {}
    for bh, bw in shapes:
        dev_all, devx_all = [], []
        for t in frame_idx:
            v = fields[t]
            for sign in (-1.0, 1.0):
                cy = g_y + sign * v[..., 0]
                cx = g_x + sign * v[..., 1]
                dy, dx = sp_fn[(bh, bw)](cy, cx)
                dev_all.append(np.asarray(dy))
                devx_all.append(np.asarray(dx))
        dev = np.concatenate(dev_all)
        devx = np.concatenate(devx_all)
        ent = {
            "dev": {"p50": int(np.percentile(dev, 50)),
                    "p90": int(np.percentile(dev, 90)),
                    "p99": int(np.percentile(dev, 99)),
                    "max": int(dev.max())},
            "devx": {"p50": int(np.percentile(devx, 50)),
                     "p90": int(np.percentile(devx, 90)),
                     "p99": int(np.percentile(devx, 99)),
                     "max": int(devx.max())},
            # budget b fits a block when spread <= b - 2 (floor pair + the
            # enumeration covering [0, b-1] needs spread + 1 <= b - 1...
            # conservative: mirror _prep_image's  max(dev) <= budget - 1
            # with dev relative to the block min, i.e. spread <= b - 1)
            "fit_frac": {
                str(b): {
                    "blocks": float(np.mean((dev <= b - 1) & (devx <= b - 1))),
                }
                for b in budgets
            },
        }
        report[f"{bh}x{bw}"] = ent
        print(f"block {bh:>3}x{bw:<4} dev p50/p90/p99/max "
              f"{ent['dev']['p50']}/{ent['dev']['p90']}/{ent['dev']['p99']}/{ent['dev']['max']}"
              f"  devx {ent['devx']['p50']}/{ent['devx']['p90']}/{ent['devx']['p99']}/{ent['devx']['max']}"
              f"  fit(16)={ent['fit_frac']['16']['blocks']:.3f}"
              f"  fit(24)={ent['fit_frac']['24']['blocks']:.3f}"
              f"  fit(32)={ent['fit_frac']['32']['blocks']:.3f}",
              flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
