"""Measure XLA:TPU layout effects for small-trailing-channel arrays.

Run from /root/repo on the TPU:  python scripts/profile_layout.py

Several mid-tier phases (pull-push extension, Horn-Schunck/Brox flow,
advection) operate on (H, W, C) arrays with C in {1, 2, 3, 4}. If XLA
assigns the default minor-to-major layout, C lands in the 128-wide lane
dimension and every elementwise pass runs at C/128 VPU efficiency. This
script quantifies that (and the fix) with three shapes of the same
elementwise workload:

  1. (H, W, C) channels-last   — the repo's prevailing convention
  2. (C, H, W) channels-first  — planar
  3. (H, W) per-channel python loop (fully planar)

plus the real ops: downsample_2x (new polyphase), pull_push_extend, and
one Horn-Schunck level.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from videomorphing_tpu.utils.cache import enable_compile_cache


def fetch(x):
    if isinstance(x, (tuple, list)):
        return [float(jnp.sum(jnp.asarray(y, jnp.float32))) for y in x]
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def bench(name, fn, *a, reps=3):
    fetch(fn(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*a))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best


def elementwise_chain(x):
    # ~12 VPU passes, shape-preserving
    for _ in range(4):
        x = x * 1.0001 + 0.1
        x = jnp.tanh(x) * x
        x = x - 0.05 * x * x
    return x


def main():
    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    h, w = 2160, 3840
    key = jax.random.PRNGKey(int(time.time_ns()) % (1 << 31))

    for C in (1, 2, 3, 4):
        img = jax.random.uniform(key, (h, w, C))
        imgp = jnp.moveaxis(img, -1, 0)
        bench(f"elemwise (H,W,{C}) last ", jax.jit(elementwise_chain), img)
        bench(f"elemwise ({C},H,W) first", jax.jit(elementwise_chain), imgp)

    from videomorphing_tpu.ops.pyramid import downsample_2x, upsample_2x

    img = jax.random.uniform(key, (h, w, 4))
    bench("downsample_2x 4ch (poly)", jax.jit(downsample_2x), img)
    ds = downsample_2x(img)
    bench("upsample_2x 4ch (resize)", jax.jit(lambda x: upsample_2x(x, (h, w))), ds)

    from videomorphing_tpu.ops.poisson import pull_push_extend

    m = (jax.random.uniform(jax.random.fold_in(key, 1), (h, w)) > 0.1).astype(jnp.float32)
    bench("pull_push_extend 4ch    ", jax.jit(lambda i, mm: pull_push_extend(i, mm)), img, m)

    # one Horn-Schunck level at the flow working resolution (1080p half-res)
    from videomorphing_tpu.config import VideoParams
    from videomorphing_tpu.video.flow import _hs_level, _robust_level

    vp = VideoParams()
    hf, wf = 540, 960
    a = jax.random.uniform(jax.random.fold_in(key, 2), (hf, wf)) * 255.0
    b = jax.random.uniform(jax.random.fold_in(key, 3), (hf, wf)) * 255.0
    u0 = jnp.zeros((hf, wf, 2))
    bench("HS level 540x960        ", jax.jit(lambda a_, b_, u_: _hs_level(a_, b_, u_, vp)), a, b, u0)
    bench("robust level 540x960    ", jax.jit(lambda a_, b_, u_: _robust_level(a_, b_, u_, vp)), a, b, u0)


if __name__ == "__main__":
    main()
