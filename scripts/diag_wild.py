"""Localize the solver's wild vectors on the synthetic profiling workload.

profile_4k round 3 measured `v err vs truth: mean 0.50 / p99 4.76 /
max 47.9 px` on a true field whose own max is 4.8 px — and those wild
vectors are exactly what busts the fused-sampler residual budgets in
~28% of tiles and throws the 4K render to the all-gather path
(2.08 s/frame vs 0.19 on the true field). This script answers WHERE the
wildness lives so the fix targets the cause, not the symptom:

  python scripts/diag_wild.py [--h 1024 --w 1820] [--platform cpu]

Reports, for the converged field's error map e(p) = |v + d_true|:
  * percentiles + the busted-tile fraction (sampler geometry);
  * an ASCII block heatmap (is it borders? blobs? salt-and-pepper?);
  * err vs distance-to-border quartiles (boundary-condition suspect);
  * err vs local texture contrast quartiles (flat-region suspect);
  * err vs |v_true| magnitude (is it where motion is largest?).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.solver.ctf import optimize_pair
from videomorphing_tpu.utils.cache import enable_compile_cache
from scripts.synth_workload import make_pair


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--w", type=int, default=1820)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--lambda-tps", type=float, default=None)
    ap.add_argument("--iters-fine", type=int, default=None)
    ap.add_argument("--median", action="store_true",
                    help="relin_median: 3x3 field median at each relin")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compile_cache()
    h, w = args.h, args.w
    print("backend:", jax.default_backend(), "size:", (h, w))

    i0, i1, d = make_pair(h, w, args.seed)
    import dataclasses

    mp = MorphParams()
    if args.lambda_tps is not None:
        mp = dataclasses.replace(mp, lambda_tps=args.lambda_tps)
    if args.iters_fine is not None:
        mp = dataclasses.replace(mp, iters_fine=args.iters_fine)
    if args.median:
        mp = dataclasses.replace(mp, relin_median=True)
    res = optimize_pair(i0, i1, params=mp)
    v = res.v

    err = jnp.linalg.norm(v + d, axis=-1)
    qs = [50, 90, 99, 99.9, 100]
    pct = jax.device_get(jnp.percentile(err, jnp.array(qs, jnp.float32)))
    print("err px:", {f"p{q}": round(float(x), 3) for q, x in zip(qs, pct)})

    # ASCII heatmap: block max err, 48 cols
    bw = max(1, w // 48)
    bh = max(1, h * bw // w)
    gh, gw = h // bh, w // bw
    blk = jax.device_get(
        jnp.max(err[: gh * bh, : gw * bw].reshape(gh, bh, gw, bw), (1, 3))
    )
    ramp = " .:-=+*#%@"
    print(f"block max err heatmap ({bh}x{bw} px blocks; ' '<0.5px, '@'>16px):")
    import numpy as np

    lv = np.clip((np.log2(np.maximum(blk, 1e-3)) + 1) / 5 * 9, 0, 9).astype(int)
    lv = np.where(blk < 0.5, 0, np.maximum(lv, 1))
    for r in lv:
        print("  " + "".join(ramp[k] for k in r))

    # err vs distance to border
    yy, xx = jnp.mgrid[0:h, 0:w]
    dist = jnp.minimum(jnp.minimum(yy, h - 1 - yy), jnp.minimum(xx, w - 1 - xx))
    edges = jax.device_get(jnp.percentile(dist.astype(jnp.float32), jnp.array([25.0, 50, 75])))
    def band_stats(key, val, name):
        cuts = [float(val.min()) - 1] + list(map(float, key)) + [float(val.max()) + 1]
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            m = (val > lo) & (val <= hi)
            me = float(jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1))
            mx = float(jnp.max(jnp.where(m, err, 0.0)))
            print(f"  {name} ({lo:8.2f},{hi:8.2f}]: mean={me:.3f} max={mx:.2f}")
    print("err vs distance-to-border quartiles:")
    band_stats(edges, dist.astype(jnp.float32), "dist")

    # err vs local contrast (std of luminance in 9x9)
    lum = jnp.mean(i0, -1)
    k = jnp.ones((9, 9)) / 81.0
    conv = lambda a: jax.scipy.signal.convolve2d(a, k, mode="same")
    con = jnp.sqrt(jnp.maximum(conv(lum**2) - conv(lum) ** 2, 0))
    cq = jax.device_get(jnp.percentile(con, jnp.array([25.0, 50, 75])))
    print("err vs local 9x9 contrast quartiles (low=flat):")
    band_stats(cq, con, "con ")

    # err vs |d_true|
    mag = jnp.linalg.norm(d, axis=-1)
    mq = jax.device_get(jnp.percentile(mag, jnp.array([25.0, 50, 75])))
    print("err vs |d_true| quartiles:")
    band_stats(mq, mag, "|d| ")


if __name__ == "__main__":
    main()
