"""Block-seam quality probe at north-star resolution (VERDICT r4 #2).

Question: does the blocked clip solve (config 4: frame blocks across
devices, block heads cold-starting) agree with the sequential solve on
REAL north-star-scale fields under the round-4 cadence defaults
(relin_every=8, warm_relin_every=12, warm_levels auto=1)?  The failing
24^2 parity test (tests/test_video_blocks.py::test_blocked_propagate_
flag_honored) could be either test-shape under-convergence or a real
seam regression — this probe decides which at 1080p.

Method: the blocked path's math per device is exactly "cold-solve the
block head + warm-scan the rest of the block with the clip's transition
flows" (parallel/video_blocks.py per_block).  On a one-chip machine we
SIMULATE it by solving each block's sub-clip independently with the
ordinary sequential ``solve_clip_fields`` and concatenating — identical
math (each sub-clip's internal flows are the same transition pairs), at
TPU speed, no mesh needed.  shard_map mechanics themselves are parity-
pinned separately on the 8-virtual-device mesh (tests/test_video_blocks).

Reports per-frame |v_blocked - v_seq| (mean / p99 / max, px) with block
heads marked, for each requested relin cadence, plus the rendered-frame
difference at the worst seam frame.

Usage (on the chip):
    python scripts/probe_seam.py --h 1080 --w 1920 --frames 16 --block 4 \
        --relins 4,8
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _make_clips_device
from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.utils.cache import enable_compile_cache


def fetch(x):
    return float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--block", type=int, default=4)
    ap.add_argument("--relins", default="4,8",
                    help="comma list of morph.relin_every values to probe")
    ap.add_argument("--no-propagate", action="store_true",
                    help="probe the vp.propagate=False branch (the failing "
                    "test's config) instead of the production default")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    assert args.frames % args.block == 0
    n_blocks = args.frames // args.block

    seed = time.time_ns() % (1 << 31)
    clip_a, clip_b = _make_clips_device(args.frames, args.h, args.w, seed)
    fetch(clip_a)

    from videomorphing_tpu.video.pipeline import solve_clip_fields

    report = {"h": args.h, "w": args.w, "frames": args.frames,
              "block": args.block, "propagate": not args.no_propagate,
              "cadence": {}}
    for relin in [int(r) for r in args.relins.split(",")]:
        mp = dataclasses.replace(MorphParams(), relin_every=relin)
        vp = VideoParams(propagate=not args.no_propagate)

        t0 = time.perf_counter()
        seq, _, _ = solve_clip_fields(clip_a, clip_b, None, mp, vp)
        fetch(seq)
        t_seq = time.perf_counter() - t0

        t0 = time.perf_counter()
        parts = []
        for k in range(n_blocks):
            s = slice(k * args.block, (k + 1) * args.block)
            blk_v, _, _ = solve_clip_fields(clip_a[s], clip_b[s], None, mp, vp)
            parts.append(blk_v)
        blk = jnp.concatenate(parts, axis=0)
        fetch(blk)
        t_blk = time.perf_counter() - t0

        d = np.abs(np.asarray(blk) - np.asarray(seq))  # (T, H, W, 2)
        per_frame = {
            k: {"mean": float(d[k].mean()),
                "p99": float(np.percentile(d[k], 99)),
                "max": float(d[k].max()),
                "head": bool(k % args.block == 0)}
            for k in range(args.frames)
        }
        heads = [m for k, m in per_frame.items() if m["head"] and k > 0]
        interior = [m for k, m in per_frame.items() if not m["head"]]

        # rendered-frame impact at the worst non-frame-0 seam frame: field
        # disagreement only matters through the morph it produces
        worst_k = max(range(1, args.frames), key=lambda k: per_frame[k]["mean"])
        from videomorphing_tpu.synth.render import render_frame

        sp = SynthParams()
        t_mid = jnp.float32(0.5)
        fs = render_frame(clip_a[worst_k], clip_b[worst_k], seq[worst_k], None, t_mid, sp)
        fb = render_frame(clip_a[worst_k], clip_b[worst_k], blk[worst_k], None, t_mid, sp)
        fd = np.abs(np.asarray(fs) - np.asarray(fb))

        entry = {
            "wall_seq_s": round(t_seq, 2), "wall_blocked_sim_s": round(t_blk, 2),
            "field_diff_px": {
                "head_frames_mean": float(np.mean([m["mean"] for m in heads])),
                "head_frames_p99": float(np.max([m["p99"] for m in heads])),
                "interior_mean": float(np.mean([m["mean"] for m in interior])),
                "interior_p99": float(np.max([m["p99"] for m in interior])),
                "overall_max": float(d.max()),
            },
            "worst_frame": {"k": worst_k,
                            "frame_diff_mean": float(fd.mean()),
                            "frame_diff_p99": float(np.percentile(fd, 99))},
            "per_frame": per_frame,
        }
        report["cadence"][str(relin)] = entry
        print(f"relin_every={relin}: heads mean "
              f"{entry['field_diff_px']['head_frames_mean']:.4f} px, interior "
              f"{entry['field_diff_px']['interior_mean']:.4f} px, worst-frame "
              f"render diff p99 {entry['worst_frame']['frame_diff_p99']:.2e}",
              flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
