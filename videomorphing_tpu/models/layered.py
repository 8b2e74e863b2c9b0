"""Layered morphing: per-layer halfway solves + mask-aware compositing.

The reference's project format carries per-layer masks (SURVEY.md section 3
"Project/config": "XML project file: paths, parameter weights, UI points,
layer masks"): content that moves independently (foreground subject vs
background) gets its own correspondence field, because a single smooth
halfway field cannot represent motions that cross or shear past each other.

Rebuild semantics:

- Each layer is a pair of masks (region of the layer in image 0 / image 1)
  plus optional layer-local correspondence points.
- A layer's field solves on NEUTRALIZED images — content outside the mask is
  replaced by the mask-interior mean color, so the SSIM data term has
  nothing to lock onto there and the TPS term extrapolates the layer's
  motion smoothly past its silhouette (this is what makes the warped mask
  edges move WITH the layer).
- The background layer solves on the full images.
- Rendering warps every layer (image + mask ride one gather) along its own
  quadratic path and composites bottom-to-top with the morphed alpha
  alpha_t = (1-t) m0(phi0) + t m1(phi1).

All of it reuses the single-layer machinery (solver, paths, blending), so
layers vmap/shard exactly like independent pairs.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams, SynthParams
from videomorphing_tpu.ops.resample import bilinear_sample, inside_mask
from videomorphing_tpu.solver.ctf import optimize_pair
from videomorphing_tpu.synth.blend import blend_extended
from videomorphing_tpu.synth.paths import bulge_field
from videomorphing_tpu.synth.render import invert_path


class Layer(NamedTuple):
    """One morph layer: masks in both images + optional local points."""

    mask0: jnp.ndarray                 # (H, W) in [0, 1], image-0 region
    mask1: jnp.ndarray                 # (H, W) in [0, 1], image-1 region
    points: Optional[jnp.ndarray] = None  # (N, 2, 2) layer-local pairs


class LayeredArtifacts(NamedTuple):
    v_bg: jnp.ndarray                  # background halfway field (H, W, 2)
    b_bg: Optional[jnp.ndarray]
    v_layers: Tuple[jnp.ndarray, ...]  # per-layer fields
    b_layers: Tuple[Optional[jnp.ndarray], ...]


def neutralize(img: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace content outside ``mask`` with the mask-interior mean color."""
    m = mask[..., None]
    denom = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(img * m, axis=(0, 1), keepdims=True) / denom
    return img * m + mean * (1.0 - m)


def solve_layered(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    layers: Sequence[Layer],
    points: Optional[jnp.ndarray] = None,
    mp: MorphParams = MorphParams(),
    sp: SynthParams = SynthParams(),
) -> LayeredArtifacts:
    """Solve one field per layer plus the background field.

    ``points`` are the background/global correspondences; each layer uses
    its own ``Layer.points``.
    """
    res_bg = optimize_pair(i0, i1, points=points, params=mp)
    b_bg = bulge_field(res_bg.v, sp) if sp.quadratic_paths else None

    v_layers: List[jnp.ndarray] = []
    b_layers: List[Optional[jnp.ndarray]] = []
    for layer in layers:
        n0 = neutralize(i0, layer.mask0)
        n1 = neutralize(i1, layer.mask1)
        res = optimize_pair(n0, n1, points=layer.points, params=mp)
        v_layers.append(res.v)
        b_layers.append(bulge_field(res.v, sp) if sp.quadratic_paths else None)

    return LayeredArtifacts(
        v_bg=res_bg.v, b_bg=b_bg,
        v_layers=tuple(v_layers), b_layers=tuple(b_layers),
    )


def _warp_layer(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    m0: jnp.ndarray,
    m1: jnp.ndarray,
    v: jnp.ndarray,
    b: Optional[jnp.ndarray],
    t,
    sp: SynthParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Morph one layer at time ``t``: returns (frame (H,W,C), alpha (H,W)).

    The layer masks ride the image gathers as an extra channel (gathers are
    index-count bound), and the morphed alpha is the time blend of the two
    warped masks — exactly the reference's layer compositing model.
    """
    h, w = i0.shape[0], i0.shape[1]
    t = jnp.asarray(t, v.dtype)
    p = invert_path(
        v, b, t, sp.invert_iters, multiscale=sp.invert_multiscale,
        use_fused=sp.fused_sampling,  # honor the documented escape hatch
    )
    if sp.fused_sampling and jax.default_backend() == "tpu":
        from videomorphing_tpu.pallas.warp import fused_sample

        (v_at_p,) = fused_sample([v], [p])
    else:
        v_at_p = bilinear_sample(v, p)
    phi0 = p - v_at_p
    phi1 = p + v_at_p

    i0m = jnp.concatenate([i0, m0[..., None]], -1)
    i1m = jnp.concatenate([i1, m1[..., None]], -1)
    if sp.fused_sampling and jax.default_backend() == "tpu":
        from videomorphing_tpu.pallas.warp import fused_sample

        s0, s1 = fused_sample([i0m, i1m], [phi0, phi1])
    else:
        s0 = bilinear_sample(i0m, phi0)
        s1 = bilinear_sample(i1m, phi1)
    w0, a0 = s0[..., :-1], s0[..., -1]
    w1, a1 = s1[..., :-1], s1[..., -1]
    in0 = inside_mask(phi0, h, w)
    in1 = inside_mask(phi1, h, w)

    frame = blend_extended(w0, w1, in0 * (a0 > 0.01), in1 * (a1 > 0.01), t, sp)
    alpha = jnp.clip((1.0 - t) * a0 * in0 + t * a1 * in1, 0.0, 1.0)
    return frame, alpha


def render_layered(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    layers: Sequence[Layer],
    art: LayeredArtifacts,
    ts: jnp.ndarray,
    sp: SynthParams = SynthParams(),
) -> jnp.ndarray:
    """Render the layered morph at times ``ts`` (K,) -> (K, H, W, C).

    Background renders with the full blend pipeline; layers composite over
    it bottom-to-top (``layers`` order) with their morphed alphas.
    """
    from videomorphing_tpu.synth.render import render_frame

    def one(t):
        out = render_frame(i0, i1, art.v_bg, art.b_bg, t, sp)
        for layer, v, b in zip(layers, art.v_layers, art.b_layers):
            frame, alpha = _warp_layer(
                i0, i1, layer.mask0, layer.mask1, v, b, t, sp
            )
            out = out * (1.0 - alpha[..., None]) + frame * alpha[..., None]
        return out

    return jax.lax.map(one, jnp.asarray(ts, art.v_bg.dtype))


def morph_pair_layered(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    layers: Sequence[Layer],
    points: Optional[jnp.ndarray] = None,
    n_frames: int = 16,
    mp: MorphParams = MorphParams(),
    sp: SynthParams = SynthParams(),
) -> jnp.ndarray:
    """End-to-end layered image-pair morph -> (n_frames, H, W, C)."""
    art = solve_layered(i0, i1, layers, points, mp, sp)
    ts = jnp.linspace(0.0, 1.0, n_frames, dtype=i0.dtype)
    return render_layered(i0, i1, layers, art, ts, sp)
