"""Per-band fused-warp/sampler fit diagnostics on the north-star content.

The round-3 warm-scan trace showed ~295 of the 417 ms/frame going to
fused-warp/sampler CONDs taking the XLA-gather fallback (descent.py
relins + advect samples). This script answers, for the actual solved
fields of the bench workload: which dispatch bands bust the residual
budget, on which axis (dev = rows vs devx = lanes), and by how much —
so the fix targets geometry (tile size / enumeration budget) vs field
quality (relin_median) with data.

Two geometries (``--geometry``, default both): ``warp`` = the solver
relin path (TH=64, TW=256, D/DX budgets) evaluated on the g±v warp
coords; ``sampler`` = the fused_sample path (TH_S=64, TW_S=128,
DX_SAMPLE) evaluated on the same coords — the advect inversion and
render samplers read smooth FLOW/SHIFT maps whose variation is bounded
by the same field, so g±v is the conservative stand-in for their coords.

Run on the TPU:  python scripts/diag_bands.py [--frames 6] [--median]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.config import MorphParams, VideoParams
from videomorphing_tpu.utils.cache import enable_compile_cache
from videomorphing_tpu.video.pipeline import solve_clip_fields

from bench import _make_clips_device


def band_stats(coords_y, coords_x, h, w, th, tw, d_budget, dx_budget, n_bands):
    """Replicates pallas.warp._prep_image's per-tile base/residual logic and
    reports per-band (fits, max_dev, max_devx)."""
    from videomorphing_tpu.pallas.warp import _prep_image, _row_bands

    gy = -(-h // th)
    gx = -(-w // tw)
    bands = _row_bands(gy, h, th, n_bands)
    out = []
    for (t0, t1, rs, re) in bands:
        cy = coords_y[rs:re]
        cx = coords_x[rs:re]
        dev, devx, *_rest = _prep_image(
            cy, cx, h, w, t1 - t0, gx, d_budget, dx_budget, th, tw
        )
        fits = _rest[-1]
        md = int(jnp.max(dev))
        mdx = int(jnp.max(devx))
        out.append((rs, re, bool(fits), md, mdx))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--median", action="store_true")
    ap.add_argument("--geometry", choices=("warp", "sampler", "both"), default="both")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compile_cache()

    from videomorphing_tpu.pallas.warp import (
        D, DX, DX_SAMPLE, TH, TH_S, TW, TW_S, _fallback_bands,
    )

    t_len, h, w = args.frames, args.h, args.w
    mp = MorphParams(relin_median=args.median)
    vp = VideoParams()
    gen = jax.jit(lambda s: _make_clips_device(t_len, h, w, s))
    ca, cb = gen(jnp.int32(7))
    fields, _tr, _fl = solve_clip_fields(ca, cb, mp=mp, vp=vp)
    fields = np.asarray(fields)

    g_y = np.arange(h, dtype=np.float32)[:, None] + np.zeros((1, w), np.float32)
    g_x = np.arange(w, dtype=np.float32)[None, :] + np.zeros((h, 1), np.float32)

    nb = _fallback_bands()
    geoms = []
    if args.geometry in ("warp", "both"):
        geoms.append(("warp", TH, TW, D, DX))
    if args.geometry in ("sampler", "both"):
        geoms.append(("sampler", TH_S, TW_S, D, DX_SAMPLE))
    frame_idx = sorted({min(t, t_len - 1) for t in (1, t_len // 2, t_len - 1)})
    for name, th, tw, d_b, dx_b in geoms:
        print(f"{name} geometry: TH={th} TW={tw} D={d_b} DX={dx_b} "
              f"bands={nb} median={args.median}")
        for t in frame_idx:
            v = fields[t]
            for sign, nm in ((-1.0, "phi0"), (1.0, "phi1")):
                cy = jnp.asarray(g_y + sign * v[..., 0])
                cx = jnp.asarray(g_x + sign * v[..., 1])
                st = band_stats(cy, cx, h, w, th, tw, d_b, dx_b, nb)
                row = " ".join(
                    f"[{rs}:{re} {'FIT' if f else 'BUST'} dev={md} devx={mdx}]"
                    for rs, re, f, md, mdx in st
                )
                print(f"frame {t} {nm}: {row}")


if __name__ == "__main__":
    main()
