"""Profile the warm-solve inner loop at 1080p: iteration vs re-linearization.

Run from /root/repo on the TPU:  python scripts/profile_relin.py [--trace DIR]

The warm frame scan is the largest north-star phase (~0.5 s/frame, PERF.md);
its cost = warm_iters * iter_cost + n_relins * relin_cost. This script
separates the two so the "warp directly into the sweep-pack layout" and
"bf16 static pack" ideas (TODO.md perf ranks 1-2) can be judged on data:

 1. time N iterations at relin_every=BIG (pure iteration cost);
 2. time the same N at relin_every=1 (iteration + relin every step);
 3. difference / N = relin cost; also time make_state alone.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.solver.energy import make_level_data
from videomorphing_tpu.solver.descent import make_level_solver
from videomorphing_tpu.utils.cache import enable_compile_cache

from scripts.synth_workload import make_pair  # shared workload (0.012 below)


def fetch(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def time_solve(i0, i1, v0, p, n_iters, reps=3, label=""):
    data = make_level_data(i0, i1)
    solve = jax.jit(make_level_solver(p, n_iters))
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        v_f, stats = solve(v0, data)
        fetch(v_f)
        dt = time.perf_counter() - t0
        if rep:
            best = min(best, dt)  # rep 0 = compile
    iters = fetch(stats.iters)
    print(f"{label}: {best:.3f}s for {iters:.0f} iters -> {best/max(iters,1)*1e3:.2f} ms/iter")
    return best, iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices())
    h, w = args.h, args.w
    i0, i1, v_true = make_pair(h, w, int(time.time_ns()) % (1 << 31), ang_scale=0.012)
    fetch(i0)
    # warm-ish start: a smooth field near the truth (the warm-scan regime)
    v0 = (-v_true * 0.9).astype(jnp.float32)

    base = MorphParams()
    # disable convergence stalls so both runs do exactly args.iters iterations
    p_no = dataclasses.replace(base, relin_every=10_000, tol=0.0, min_step=0.0)
    p_r1 = dataclasses.replace(base, relin_every=1, tol=0.0, min_step=0.0)
    p_r4 = dataclasses.replace(base, relin_every=4, tol=0.0, min_step=0.0)

    t_no, it_no = time_solve(i0, i1, v0, p_no, args.iters, label="relin=never")
    t_r4, it_r4 = time_solve(i0, i1, v0, p_r4, args.iters, label="relin=4    ")
    t_r1, it_r1 = time_solve(i0, i1, v0, p_r1, args.iters, label="relin=1    ")

    if it_r1 == it_no and it_no > 0:
        per_relin = (t_r1 - t_no) / it_no
        print(f"\nrelin cost ~= {per_relin*1e3:.1f} ms each "
              f"(iter cost {t_no/it_no*1e3:.2f} ms)")

    # isolate make_state: fused warp planes + pack build
    from videomorphing_tpu.pallas.sweep import make_sweep_pack_planes
    from videomorphing_tpu.pallas.warp import fused_warp_planes, make_warp_source

    data = make_level_data(i0, i1)
    src0 = make_warp_source(data.i0)
    src1 = make_warp_source(data.i1)

    @jax.jit
    def warp_only(v_):
        return fused_warp_planes(src0, src1, v_)

    @jax.jit
    def state_full(v_):
        return make_sweep_pack_planes(fused_warp_planes(src0, src1, v_), v_, data, base)

    planes = warp_only(v0)

    @jax.jit
    def pack_only(planes_, v_):
        return make_sweep_pack_planes(planes_, v_, data, base)

    # split-pack path (warp_into_pack): the warp kernel emits the pack
    from videomorphing_tpu.pallas.warp import (
        fused_warp_planes_packed,
        packed_plane_geometry,
    )
    from videomorphing_tpu.pallas.sweep import pack_v

    timed = [
        ("fused_warp_planes   ", warp_only, lambda vv: (vv,)),
        ("pack_only           ", pack_only, lambda vv: (planes, vv)),
        ("make_state combined ", state_full, lambda vv: (vv,)),
    ]
    if packed_plane_geometry(base, h, w) is not None:

        @jax.jit
        def state_split(v_):
            return fused_warp_planes_packed(src0, src1, v_, base), pack_v(v_, base)

        timed.append(("make_state split    ", state_split, lambda vv: (vv,)))

    for name, fn, mk in timed:
        fetch(fn(*mk(v0)))
        best = float("inf")
        for rep in range(3):
            # nudge v per rep: the runtime result-caches identical inputs
            vv = v0 + 1e-4 * (rep + 1)
            t0 = time.perf_counter()
            fetch(fn(*mk(vv)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f} ms")

    # end-to-end: same fixed-iteration warm solve, combined vs split pack
    if packed_plane_geometry(base, h, w) is not None:
        p_sp = dataclasses.replace(p_r4, warp_into_pack=True)
        t_sp, it_sp = time_solve(i0, i1, v0, p_sp, args.iters, label="relin=4 split")
        if it_sp == it_r4 and it_r4 > 0:
            print(f"split-pack solve speedup vs combined: {t_r4 / t_sp:.3f}x")

    if args.trace:
        with jax.profiler.trace(args.trace):
            v_f, _ = jax.jit(make_level_solver(p_r4, args.iters))(
                v0, make_level_data(i0, i1))
            fetch(v_f)
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
