"""Frame / pair data parallelism over the mesh.

Synthesis is embarrassingly parallel across output times; optimization is
parallel across PAIRS (frames of one clip are sequential-with-carry, so DP
batches independent pairs or multiple clips — SURVEY.md section 3,
"Frame data-parallelism"). Both paths use jit + sharding annotations: XLA
partitions the vmapped computation, no manual collectives needed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videomorphing_tpu.config import MorphParams, SynthParams
from videomorphing_tpu.ops.pyramid import auto_n_levels, gaussian_pyramid, pyramid_shapes
from videomorphing_tpu.solver.constraints import rasterize_point_constraints, scale_points
from videomorphing_tpu.solver.ctf import resample_field
from videomorphing_tpu.solver.descent import make_level_solver
from videomorphing_tpu.solver.energy import make_level_data
from videomorphing_tpu.ops.pyramid import upsample_field_2x
from videomorphing_tpu.synth.render import render_frame


def _pad_to_multiple(x: jnp.ndarray, m: int, axis: int = 0):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, mode="edge"), n


def render_clip_sharded(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    v: jnp.ndarray,
    b: Optional[jnp.ndarray],
    ts: jnp.ndarray,
    mesh: Mesh,
    sp: SynthParams = SynthParams(),
    axis: str = "batch",
) -> jnp.ndarray:
    """Render frames at times ``ts`` sharded across mesh devices.

    ``ts`` is padded to a multiple of the axis size; sources/field are
    replicated (cheap: one pair per clip), frames land sharded and are
    gathered only by the caller's host transfer (BASELINE.json config 4).

    ``shard_map`` over devices + sequential ``lax.map`` over each device's
    local times, NOT ``vmap``: ``render_frame`` contains ``lax.cond``
    fast-path dispatch and vmap would run the Pallas kernels AND their XLA
    fallbacks on every frame (ARCHITECTURE.md platform landmine; same
    structure as ``parallel.batch.make_batch_step``).
    """
    from jax import shard_map

    n_dev = mesh.shape[axis]
    ts_p, n = _pad_to_multiple(ts.astype(v.dtype), n_dev)

    def local(i0_, i1_, v_, b_, ts_):
        # hoist the fused sampler's 8-phase source copies out of the frame
        # loop (same as render_clip — rebuilding them costs ~700 MB of
        # pad-writes per 1080p frame)
        if sp.fused_sampling and sp.sampling != "bicubic" and jax.default_backend() == "tpu":
            from videomorphing_tpu.pallas.warp import make_warp_source

            s0_, s1_ = make_warp_source(i0_), make_warp_source(i1_)
        else:
            s0_ = s1_ = None
        return jax.lax.map(
            lambda t: render_frame(i0_, i1_, v_, b_, t, sp, srcs0=s0_, srcs1=s1_),
            ts_,
        )

    run = jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    b_arg = b if b is not None else jnp.zeros_like(v)
    out = run(i0, i1, v, b_arg, ts_p)
    return out[:n]


@functools.lru_cache(maxsize=None)
def _jitted_video_render_sharded(
    mesh: Mesh, sp: SynthParams, vp, axis: str,
    with_bulges: bool, with_conf_flows: bool,
):
    from jax import shard_map

    from videomorphing_tpu.synth.paths import bulge_field
    from videomorphing_tpu.video.occlusion import occlusion_confidence

    def local(a, b, v, ts, bl_in, af, ab, bf, bb):
        def one(xs):
            a_, b_, v_, t_, bl_, af_, ab_, bf_, bb_ = xs
            if not with_bulges:
                bl_ = (
                    bulge_field(v_, sp) if sp.quadratic_paths else jnp.zeros_like(v_)
                )
            if with_conf_flows:
                ca_ = occlusion_confidence(af_, ab_, vp)
                cb_ = occlusion_confidence(bf_, bb_, vp)
            else:
                ca_ = cb_ = jnp.ones(a_.shape[:2], a_.dtype)
            return bl_, render_frame(a_, b_, v_, bl_, t_, sp, conf0=ca_, conf1=cb_)

        return jax.lax.map(one, (a, b, v, ts, bl_in, af, ab, bf, bb))

    return jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis), check_vma=False,
        )
    )


def render_video_frames_sharded(
    clip_a: jnp.ndarray,
    clip_b: jnp.ndarray,
    fields: jnp.ndarray,
    times: jnp.ndarray,
    mesh: Mesh,
    sp: SynthParams = SynthParams(),
    vp=None,
    axis: str = "batch",
    bulges: Optional[jnp.ndarray] = None,
    conf_flows: Optional[tuple] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Video synthesis sharded across the mesh: frame t of the morph needs
    only (A_t, B_t, v_t, t_t) and frame-local flow pairs, so the whole
    synthesis half of config 4 is embarrassingly parallel across frames
    (SURVEY.md section 3 "Frame data-parallelism") — unlike
    :func:`render_clip_sharded`, every frame here has its OWN sources, so
    all inputs shard on the T axis.

    ``bulges``: caller-supplied (T, H, W, 2) quadratic-path bulges (e.g. a
    checkpoint re-render) are honored exactly like the sequential path;
    when absent they are computed per frame INSIDE the program. Occlusion
    confidences likewise compute in-program from ``conf_flows`` — a tuple
    of four (T, H, W, 2) per-frame flow stacks ``(af, ab, bf, bb)``
    (see ``video.pipeline.render_video`` for their construction) — so the
    entire synthesis phase is ONE sharded dispatch with no serial
    full-clip pass between the sharded solve and the sharded render.
    T pads to a multiple of the axis size (repeat-last, trimmed after).
    Returns ``(bulges, frames)``.

    ``shard_map`` + per-device ``lax.map``, NOT vmap — ``render_frame``
    carries ``lax.cond`` fast-path dispatch (ARCHITECTURE.md landmine).
    """
    n_dev = mesh.shape[axis]
    t_len = clip_a.shape[0]
    zf = jnp.zeros(clip_a.shape[:3] + (2,), fields.dtype)
    bl_in = bulges if bulges is not None else jnp.zeros_like(fields)
    af, ab, bf, bb = conf_flows if conf_flows is not None else (zf, zf, zf, zf)
    args = (
        clip_a, clip_b, fields, times.astype(fields.dtype), bl_in, af, ab, bf, bb,
    )
    args = tuple(_pad_to_multiple(x, n_dev)[0] for x in args)

    run = _jitted_video_render_sharded(
        mesh, sp, vp, axis, bulges is not None, conf_flows is not None
    )
    out_bulges, frames = run(*args)
    return out_bulges[:t_len], frames[:t_len]


def optimize_pairs_batched(
    i0s: jnp.ndarray,
    i1s: jnp.ndarray,
    mesh: Mesh,
    params: MorphParams = MorphParams(),
    points: Optional[jnp.ndarray] = None,
    axis: str = "batch",
) -> jnp.ndarray:
    """Coarse-to-fine solve for a BATCH of pairs (B, H, W, C), B sharded.

    Batching is ``shard_map`` over the mesh with a sequential ``lax.map``
    over each device's local pairs — NOT ``vmap``: vmapping turns every
    internal ``lax.cond`` into a both-branches select, which on TPU runs
    the Pallas kernels AND their XLA fallbacks (a 4K pair took ~10x longer
    vmapped). Per-device sequential is the right shape anyway: pairs are
    the DP axis, devices the parallelism. The whole pyramid runs in ONE
    jitted shard_map (the levels unroll inside), so a block is one
    dispatch. This is the optimizer half of BASELINE.json config 5.
    """
    from jax import shard_map

    bsz, h, w = i0s.shape[0], i0s.shape[1], i0s.shape[2]
    dtype = i0s.dtype
    n_levels = params.n_levels or auto_n_levels(h, w, params.min_level_size)
    shapes = pyramid_shapes(h, w, n_levels)
    n_dev = mesh.shape[axis]
    assert bsz % n_dev == 0, f"batch {bsz} must divide over {n_dev} devices"

    if points is None:
        points = jnp.zeros((bsz, 0, 2, 2), dtype)

    shard = NamedSharding(mesh, P(axis))

    def _sharded_map(fn):
        """One jitted program: shard over ``axis``, lax.map local pairs."""
        local = lambda *arrs: jax.lax.map(lambda a: fn(*a), arrs)
        sm = shard_map(
            local, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis), check_vma=False,
        )
        return jax.jit(sm)

    # pyramids: no conds inside, but keep the same execution shape
    from videomorphing_tpu.ops.pyramid import downsample_2x

    down = _sharded_map(downsample_2x)
    pyr0, pyr1 = [i0s], [i1s]
    for _ in range(n_levels - 1):
        pyr0.append(down(pyr0[-1]))
        pyr1.append(down(pyr1[-1]))

    v = jnp.zeros((bsz,) + shapes[-1] + (2,), dtype)
    for level in range(n_levels - 1, -1, -1):
        lh, lw = shapes[level]
        solve = make_level_solver(params, params.iters_for_level(level, n_levels))

        def level_fn(v_, a_, b_, pts_):
            lpts = scale_points(pts_, (h, w), (lh, lw))
            ui_w, ui_v = rasterize_point_constraints(lpts, (lh, lw), params.ui_sigma, dtype)
            data = make_level_data(a_, b_, ui_w, ui_v)
            v_out, _ = solve(v_, data)
            return v_out

        v = _sharded_map(level_fn)(v, pyr0[level], pyr1[level], points)
        if level > 0:
            v = _sharded_map(lambda f: upsample_field_2x(f, shapes[level - 1]))(v)
    return v
