"""Layered-video scaling: where does per-layer work start to dominate?

VERDICT round 2 weak #7: layered video runs the FULL solve_clip_fields —
including the neutralized clips' own flow phase — once per layer, linear
in L with no sharing. That is correct by construction (a layer's temporal
advection must follow the LAYER's motion, so its flows genuinely differ
from the background's), but nothing measured where the flow phase starts
to dominate. This script times L = 0..3 layers and attributes the growth:

  python scripts/profile_layered.py [--h 240 --w 424 --frames 6]

Per L it reports: total wall, the flow-phase wall (measured standalone on
the same neutralized clips), and the solve+render remainder. The expected
shape is total(L) ~ total(0) + L * (flow + warm-scan + bulge + compose).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.utils.cache import enable_compile_cache
from videomorphing_tpu.utils.stressor import make_stressor
from videomorphing_tpu.video.flow import clip_flows
from videomorphing_tpu.video.layered import (
    VideoLayer,
    _jitted_neutralize,
    _masks_t,
    morph_clips_layered,
)
from videomorphing_tpu.video.pipeline import morph_video


def fetch(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _disk_layer(h, w, t_len, cy, cx, r, dtype=np.float32):
    yy, xx = np.mgrid[0:h, 0:w].astype(dtype)
    m = ((yy - cy) ** 2 + (xx - cx) ** 2 < r**2).astype(dtype)
    return VideoLayer(mask0=jnp.asarray(m), mask1=jnp.asarray(m))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=424)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--max-layers", type=int, default=3)
    ap.add_argument("--platform", default=None,
                    help="cpu/tpu (default: whatever JAX picks)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices())
    mp, sp, vp = MorphParams(), SynthParams(), VideoParams()
    # TWO content sets, same shapes: the TPU runtime result-caches
    # (executable, inputs) pairs, so every timed run must see fresh
    # content while the compile caches stay warm (PERF.md methodology)
    cases = [
        make_stressor(args.frames, args.h, args.w, seed=7 + k)
        for k in (0, 1)
    ]
    fetch(cases[0].clip_a); fetch(cases[1].clip_a)

    # candidate layer masks at different spots (distinct neutralized clips)
    r = 0.12 * min(args.h, args.w)
    spots = [(0.35, 0.3), (0.6, 0.6), (0.4, 0.75)]
    layers_all = [
        _disk_layer(args.h, args.w, args.frames,
                    args.h * fy, args.w * fx, r)
        for fy, fx in spots
    ]

    # standalone flow-phase cost on ONE neutralized clip pair (per layer,
    # the pipeline pays this twice: clip A and clip B)
    neut = _jitted_neutralize()
    flows_j = jax.jit(lambda c: clip_flows(c, vp))
    m0 = _masks_t(layers_all[0].mask0, args.frames)
    fetch(flows_j(neut(cases[0].clip_a, m0))[0])  # compile
    na1 = neut(cases[1].clip_a, m0)
    fetch(na1)
    t0 = time.perf_counter()
    fetch(flows_j(na1)[0])
    t_flow_one_clip = time.perf_counter() - t0

    rows = []
    for L in range(args.max_layers + 1):
        layers = layers_all[:L]

        def run(case):
            if L == 0:
                res = morph_video(case.clip_a, case.clip_b,
                                  mp=mp, sp=sp, vp=vp, render=True)
            else:
                res = morph_clips_layered(case.clip_a, case.clip_b, layers,
                                          mp=mp, sp=sp, vp=vp)
            fetch(res.frames[-1])

        run(cases[0])  # compile
        t0 = time.perf_counter()
        run(cases[1])  # fresh content: no result-cache hit
        wall = time.perf_counter() - t0
        rows.append({
            "layers": L,
            "wall_s": round(wall, 3),
            "flow_share_est": round(
                min(2 * L * t_flow_one_clip / wall, 1.0), 3
            ) if L else 0.0,
        })
        print(json.dumps(rows[-1]))

    # linearity fit: wall(L) ~ a + b*L
    ls = np.array([r["layers"] for r in rows], np.float64)
    ws = np.array([r["wall_s"] for r in rows], np.float64)
    b, a = np.polyfit(ls, ws, 1)
    print(json.dumps({
        "metric": "layered_scaling",
        "h": args.h, "w": args.w, "frames": args.frames,
        "base_wall_s": round(float(a), 3),
        "per_layer_s": round(float(b), 3),
        "flow_per_neutralized_clip_s": round(t_flow_one_clip, 3),
        "flow_share_of_per_layer_cost": round(
            2 * t_flow_one_clip / float(b), 3
        ) if b > 0 else None,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
