"""Config-5 batch pipeline: streaming decode -> sharded optimize -> blend.

BASELINE.json config 5 ("Multi-pair 4K batch pipeline: streaming decode ->
pyramid optimize -> warp/blend sharded over a v5e-8") lands here. The
reference has no batch mode at all — it is a single-GPU desktop app
(SURVEY.md section 2) — so this module is a new first-class component of
the rebuild, per the parallelism inventory of SURVEY.md section 3.

Structure:

- :func:`make_batch_step` — ONE jitted, mesh-sharded function containing the
  whole per-pair pipeline (pyramid build, coarse-to-fine halfway solve,
  quadratic-path bulge, render at each pair's morph time). One dispatch per
  block matters here: the chip sits behind a high-latency link, and a
  single executable also lets XLA overlap the collective-free per-pair work
  perfectly across cores (pure DP: no cross-pair communication exists).
- :class:`StreamingBatchRunner` — the host pipeline: native ring-buffer
  decode (``native/vmio.cpp``) -> double-buffered ``jax.device_put`` ->
  compute dispatch -> previous block's D2H fetch + encode, all overlapped.
  The device never waits on the host as long as decode keeps ahead.
- :func:`run_manifest` — many independent image-pair jobs (each producing
  ``n_frames`` in-betweens), grouped into mesh-sized blocks.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videomorphing_tpu.config import MorphParams, SynthParams
from videomorphing_tpu.ops.pyramid import (
    auto_n_levels,
    gaussian_pyramid,
    pyramid_shapes,
    upsample_field_2x,
)
from videomorphing_tpu.solver.constraints import (
    rasterize_point_constraints,
    scale_points,
)
from videomorphing_tpu.solver.descent import make_level_solver
from videomorphing_tpu.solver.energy import make_level_data
from videomorphing_tpu.synth.paths import bulge_field
from videomorphing_tpu.synth.render import render_frame


def _hoisted_warp_sources(i0, i1, sp: SynthParams):
    """Build the fused sampler's 8-phase source copies ONCE per pair, not
    once per rendered frame (same hoist as synth.render.render_clip and
    parallel.frames — rebuilding them costs ~700 MB of pad-writes per
    1080p frame)."""
    if sp.fused_sampling and sp.sampling != "bicubic" and jax.default_backend() == "tpu":
        from videomorphing_tpu.pallas.warp import make_warp_source

        return make_warp_source(i0), make_warp_source(i1)
    return None, None


def _solve_one(i0, i1, points, mp: MorphParams, shapes) -> jnp.ndarray:
    """Traceable full coarse-to-fine solve for ONE pair (no inner jits).

    Mirrors solver.ctf.optimize_pair with the level loop unrolled at trace
    time so the whole pyramid lives in one executable; stats are dropped
    (batch jobs read the energy from logs, not per-level records).
    """
    h, w = i0.shape[0], i0.shape[1]
    dtype = i0.dtype
    n_levels = len(shapes)

    pyr0 = gaussian_pyramid(i0, n_levels)
    pyr1 = gaussian_pyramid(i1, n_levels)

    v = jnp.zeros(shapes[-1] + (2,), dtype)
    for level in range(n_levels - 1, -1, -1):
        lh, lw = shapes[level]
        lpts = scale_points(points, (h, w), (lh, lw))
        ui_w, ui_v = rasterize_point_constraints(lpts, (lh, lw), mp.ui_sigma, dtype)
        data = make_level_data(pyr0[level], pyr1[level], ui_w, ui_v)
        solve = make_level_solver(mp, mp.iters_for_level(level, n_levels))
        v, _ = solve(v, data)
        if level > 0:
            v = upsample_field_2x(v, shapes[level - 1])
    return v


# above this pixel count the fully-unrolled one-jit batch step emits a
# program too large for the compile service (a 4K step produced a 78 MB
# MLIR module and an HTTP 500 from the remote compiler) — stage through
# per-level jits instead
MONOLITHIC_MAX_PIXELS = 3_000_000


@functools.lru_cache(maxsize=None)
def make_batch_step(
    mp: MorphParams,
    sp: SynthParams,
    mesh: Mesh,
    hw: Tuple[int, int],
    n_out: int = 1,
    axis: str = "batch",
):
    """Sharded batch step: (B pairs) -> (B, n_out frames).

    Signature of the returned function::

        step(i0s, i1s, points, ts) -> frames
        i0s, i1s : (B, H, W, C)   sharded over ``axis``
        points   : (B, N, 2, 2)   per-pair correspondences (N may be 0)
        ts       : (B, n_out)     per-pair morph times
        frames   : (B, n_out, H, W, C) sharded over ``axis``

    ``n_out=1`` is the clip-batch mode (each pair contributes one output
    frame at its transition time); manifest jobs use ``n_out=n_frames``.
    Up to ~1080p everything traces into ONE jit (one dispatch per block);
    at 4K the program splits into per-level jits (see
    ``MONOLITHIC_MAX_PIXELS``) — a few extra dispatches, same math.
    """
    h, w = hw
    if h * w > MONOLITHIC_MAX_PIXELS:
        return _make_batch_step_staged(mp, sp, mesh, hw, n_out, axis)
    n_levels = mp.n_levels or auto_n_levels(h, w, mp.min_level_size)
    shapes = pyramid_shapes(h, w, n_levels)

    def one_pair(i0, i1, pts, ts):
        v = _solve_one(i0, i1, pts, mp, shapes)
        b = bulge_field(v, sp) if sp.quadratic_paths else jnp.zeros_like(v)
        s0, s1 = _hoisted_warp_sources(i0, i1, sp)
        # sequential over output times: keeps peak memory single-frame
        # (same reasoning as video.pipeline._jitted_video_render)
        return jax.lax.map(
            lambda t: render_frame(i0, i1, v, b, t, sp, srcs0=s0, srcs1=s1), ts
        )

    # shard_map + per-device lax.map, NOT vmap: vmapping turns every
    # lax.cond into a both-branches select, which runs the Pallas fast
    # paths AND their XLA fallbacks (measured ~10x at 4K)
    from jax import shard_map

    local = lambda *arrs: jax.lax.map(lambda a: one_pair(*a), arrs)
    step = jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis), check_vma=False,
        )
    )
    return step


def _make_batch_step_staged(
    mp: MorphParams,
    sp: SynthParams,
    mesh: Mesh,
    hw: Tuple[int, int],
    n_out: int,
    axis: str,
):
    from jax import shard_map

    from videomorphing_tpu.parallel.frames import optimize_pairs_batched

    def one(i0, i1, v, t_row):
        b = bulge_field(v, sp) if sp.quadratic_paths else jnp.zeros_like(v)
        s0, s1 = _hoisted_warp_sources(i0, i1, sp)
        return jax.lax.map(
            lambda t: render_frame(i0, i1, v, b, t, sp, srcs0=s0, srcs1=s1), t_row
        )

    local = lambda *arrs: jax.lax.map(lambda a: one(*a), arrs)
    synth_j = jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis), check_vma=False,
        )
    )

    def step(i0s, i1s, points, ts):
        vs = optimize_pairs_batched(i0s, i1s, mesh, mp, points, axis)
        return synth_j(i0s, i1s, vs, ts)

    return step


def _pad_block(arr: np.ndarray, bsz: int) -> np.ndarray:
    """Pad the leading axis up to ``bsz`` by repeating the last element."""
    n = arr.shape[0]
    if n > bsz:
        # callers chunk oversized blocks; without this the np.repeat below
        # raised an opaque 'negative dimensions' deep inside the runner
        raise ValueError(f"block of {n} items exceeds the mesh block size {bsz}")
    if n == bsz:
        return arr
    reps = np.repeat(arr[-1:], bsz - n, axis=0)
    return np.concatenate([arr, reps], axis=0)


class StreamingBatchRunner:
    """Host-side pipeline for config 5: decode / H2D / compute / D2H overlap.

    The per-block timeline (device perspective) is::

        put(block k+1)  ->  step(block k) dispatched  ->  host fetches
        block k-1 results and encodes while the device runs block k

    JAX dispatch is asynchronous, so the three stages overlap without
    explicit threads on the Python side; the decode side runs ahead inside
    the native ring buffer's producer threads (native/vmio.cpp).
    """

    def __init__(
        self,
        mesh: Mesh,
        mp: MorphParams = MorphParams(),
        sp: SynthParams = SynthParams(),
        axis: str = "batch",
    ):
        self.mesh = mesh
        self.mp = mp
        self.sp = sp
        self.axis = axis
        self.block = int(mesh.shape[axis])
        self._shard = NamedSharding(mesh, P(axis))

    def _put(self, *arrs: np.ndarray):
        return tuple(jax.device_put(a, self._shard) for a in arrs)

    def run_clip_pair(
        self,
        blocks_a: Iterator[Tuple[int, np.ndarray]],
        blocks_b: Iterator[Tuple[int, np.ndarray]],
        t_len: int,
        hw: Tuple[int, int],
        points: Optional[np.ndarray] = None,
        times: Optional[np.ndarray] = None,
        on_block=None,
        stats: Optional[list] = None,
    ) -> Iterator[Tuple[int, np.ndarray]]:
        """Morph two streamed clips pair-by-pair (no temporal carry).

        This is the DP alternative to the scan pipeline of
        ``video.pipeline``: every frame pair solves independently, so T
        pairs spread across all cores — the right trade when throughput
        (many frames) matters more than warm-start savings. Yields
        ``(start_index, frames (K, H, W, C))`` blocks in order.

        ``stats``: optional list; one dict is appended per dispatched mesh
        block with host-side phase attribution — ``decode_s`` (time blocked
        waiting on the clip iterators, i.e. whether decode keeps ahead),
        ``h2d_s`` (device_put calls; async on most backends, so this is
        issue cost, not transfer wall), ``dispatch_s`` (jitted step issue),
        ``fetch_s`` (blocking D2H of the PREVIOUS block while this one
        computes). Used by ``bench.py batch_4k_stream`` (VERDICT r4 #5).
        """
        h, w = hw
        bsz = self.block
        step = make_batch_step(self.mp, self.sp, self.mesh, (h, w), 1, self.axis)

        if times is None:
            times = np.linspace(0.0, 1.0, t_len, dtype=np.float32)
        times = np.asarray(times, np.float32)
        if points is None:
            pts_one = np.zeros((0, 2, 2), np.float32)
        else:
            pts_one = np.asarray(points, np.float32)

        pending: List[Tuple[int, int, jnp.ndarray]] = []  # (start, n, dev frames)
        paired = zip(blocks_a, blocks_b)
        while True:
            t_dec = time.perf_counter()
            try:
                (sa, blk_a), (sb, blk_b) = next(paired)
            except StopIteration:
                break
            decode_s = time.perf_counter() - t_dec
            assert sa == sb, f"clip streams out of sync: {sa} != {sb}"
            n_all = min(blk_a.shape[0], blk_b.shape[0])
            # the stream's block size need not match the mesh block size
            # (e.g. open_clip_reader's default 8 on a 4-device mesh):
            # re-chunk here instead of crashing in _pad_block
            for off in range(0, n_all, bsz):
                s = sa + off
                n = min(bsz, n_all - off)
                i0s = _pad_block(
                    np.ascontiguousarray(blk_a[off : off + n], np.float32), bsz
                )
                i1s = _pad_block(
                    np.ascontiguousarray(blk_b[off : off + n], np.float32), bsz
                )
                ts = _pad_block(times[s : s + n, None], bsz)
                pts = np.broadcast_to(pts_one, (bsz,) + pts_one.shape)

                t_put = time.perf_counter()
                dev = self._put(i0s, i1s, np.ascontiguousarray(pts), ts)
                t_disp = time.perf_counter()
                out = step(*dev)  # async dispatch; device starts immediately
                t_fetch = time.perf_counter()

                # drain the previous block while the device runs this one
                while pending:
                    s0, n0, dev_frames = pending.pop(0)
                    host = np.asarray(dev_frames)[:n0, 0]
                    if on_block is not None:
                        on_block(s0, host)
                    yield s0, host
                pending.append((s, n, out))
                if stats is not None:
                    stats.append({
                        "start": s, "n": n,
                        "decode_s": decode_s,
                        "h2d_s": t_disp - t_put,
                        "dispatch_s": t_fetch - t_disp,
                        "fetch_s": time.perf_counter() - t_fetch,
                    })
                decode_s = 0.0  # only the first chunk of a stream block waits

        while pending:
            s0, n0, dev_frames = pending.pop(0)
            t_fetch = time.perf_counter()
            host = np.asarray(dev_frames)[:n0, 0]
            if stats is not None and stats:
                stats[-1]["fetch_s"] += time.perf_counter() - t_fetch
            if on_block is not None:
                on_block(s0, host)
            yield s0, host


def run_manifest(
    jobs: Sequence[dict],
    mesh: Mesh,
    mp: MorphParams = MorphParams(),
    sp: SynthParams = SynthParams(),
    axis: str = "batch",
    verbose: bool = False,
) -> List[np.ndarray]:
    """Run many independent image-pair morph jobs, mesh-sized blocks at a time.

    Each job dict: ``{"i0": (H,W,C) array, "i1": array, "points": (N,2,2)
    array or None, "n_frames": int}``. All jobs in one call must share the
    image resolution (one executable); ``n_frames`` may vary — frames are
    rendered at the max count and trimmed per job.

    Returns one ``(n_frames, H, W, C)`` array per job, in order.
    """
    if not jobs:
        return []
    h, w = np.asarray(jobs[0]["i0"]).shape[:2]
    n_out = max(int(j.get("n_frames", 16)) for j in jobs)
    max_pts = max((np.asarray(j["points"]).shape[0] if j.get("points") is not None else 0) for j in jobs)
    bsz = int(mesh.shape[axis])
    step = make_batch_step(mp, sp, mesh, (h, w), n_out, axis)
    shard = NamedSharding(mesh, P(axis))

    results: List[np.ndarray] = []
    pending: List[Tuple[list, float, jnp.ndarray]] = []  # (jobs, t_dispatch, dev)

    def _drain():
        blk_, t0_, out_ = pending.pop(0)
        host = np.asarray(out_)  # waits for THIS block; the next is running
        if verbose:
            dt = time.perf_counter() - t0_
            print(
                json.dumps(
                    {
                        "event": "batch_block",
                        "jobs": len(blk_),
                        "frames": int(len(blk_) * n_out),
                        "wall_s": round(dt, 3),
                        "frames_per_sec": round(len(blk_) * n_out / dt, 3),
                    }
                )
            )
        for bi, j in enumerate(blk_):
            nf = int(j.get("n_frames", n_out))
            results.append(host[bi, :nf])

    for blk_start in range(0, len(jobs), bsz):
        blk = list(jobs[blk_start : blk_start + bsz])
        i0s = _pad_block(np.stack([np.asarray(j["i0"], np.float32) for j in blk]), bsz)
        i1s = _pad_block(np.stack([np.asarray(j["i1"], np.float32) for j in blk]), bsz)
        # pad each job's point list to max_pts with far-off-domain pairs:
        # their Gaussian falloff weight is exactly 0 everywhere on the grid,
        # so padded jobs solve identically to their unpadded form
        pts = np.full((bsz, max_pts, 2, 2), -1e6, np.float32)
        for bi, j in enumerate(blk):
            p = j.get("points")
            if p is not None and len(p):
                p = np.asarray(p, np.float32)
                pts[bi, : p.shape[0]] = p
        ts = np.zeros((bsz, n_out), np.float32)
        for bi, j in enumerate(blk):
            nf = int(j.get("n_frames", n_out))
            ts[bi, :nf] = np.linspace(0.0, 1.0, nf, dtype=np.float32)
            ts[bi, nf:] = 1.0

        t0 = time.perf_counter()
        out = step(*(jax.device_put(a, shard) for a in (i0s, i1s, pts, ts)))
        # drain the PREVIOUS block while the device runs this one (same
        # overlap as run_clip_pair; fetching synchronously here serialized
        # D2H against the next block's H2D + compute)
        while pending:
            _drain()
        pending.append((blk, t0, out))
    while pending:
        _drain()
    return results
