"""Gaussian pyramids and field up/downsampling.

Rebuild of the reference's CUDA ``pyramid`` kernels (SURVEY.md section 3,
"GPU morph core"). Levels are a static Python list (one entry per level) so
each level's solver jits with static shapes — the XLA-friendly equivalent of
the reference's per-level device buffers.

Level indexing convention everywhere: ``pyr[0]`` is the FINEST (full-res)
level, ``pyr[-1]`` the coarsest.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

def auto_n_levels(h: int, w: int, min_size: int = 32, max_levels: int = 16) -> int:
    """Number of pyramid levels so the coarsest is ~min_size on its short side.

    ``>=`` (not ``>``): the coarsest level lands in [min_size, 2*min_size).
    With ``>`` a power-of-two image stopped at exactly 2*min_size — one
    level too shallow, which measurably hurts unaided large-displacement
    capture (the golden gate at 256^2 probed 0.79 vs 0.9999 SSIM).
    """
    n = 1
    while min(h, w) >= min_size * 2 and n < max_levels:
        h = -(-h // 2)
        w = -(-w // 2)
        n += 1
    return n


def pyramid_shapes(h: int, w: int, n_levels: int) -> List[Tuple[int, int]]:
    """Static per-level (H, W), finest first; next level is ceil(prev / 2)."""
    shapes = [(h, w)]
    for _ in range(n_levels - 1):
        h = -(-h // 2)
        w = -(-w // 2)
        shapes.append((h, w))
    return shapes


def downsample_2x(img: jnp.ndarray, sigma: float = 0.85) -> jnp.ndarray:
    """Gaussian anti-alias blur + 2x decimation of (H, W, C) or (H, W).

    Output shape is ceil(H/2) x ceil(W/2) (odd sizes round up so coarse grids
    always cover the domain).

    POLYPHASE implementation: the blurred value is computed at even
    positions only, as 5 strided slices x taps per axis — algebraically
    identical to blur-then-``[::2, ::2]`` but with half the filter work and,
    more importantly, no XLA depthwise conv and no strided-slice relayout:
    the NCHW ``conv_general_dilated`` + decimate lowering measured tens of
    ms per level at 4K (and a fresh standalone compile of it faulted the
    TPU runtime — the PERF.md "whole-program compile fault" class), while
    slices + adds fuse into one elementwise pass.
    """
    from videomorphing_tpu.ops.windows import _gaussian_np

    taps = [float(t) for t in _gaussian_np(5, float(sigma))]
    r = 2
    h, w = img.shape[0], img.shape[1]
    ho, wo = -(-h // 2), -(-w // 2)
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img

    xp = jnp.pad(x, ((r, r + (2 * ho - h)), (0, 0), (0, 0)), mode="edge")
    rows = None
    for t, kt in enumerate(taps):
        sl = kt * xp[t : t + 2 * ho : 2]
        rows = sl if rows is None else rows + sl
    xp2 = jnp.pad(rows, ((0, 0), (r, r + (2 * wo - w)), (0, 0)), mode="edge")
    out = None
    for t, kt in enumerate(taps):
        sl = kt * xp2[:, t : t + 2 * wo : 2]
        out = sl if out is None else out + sl
    return out[..., 0] if squeeze else out


def upsample_2x(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear upsample of (H, W, ...) to ``out_hw`` (roughly 2x)."""
    out_shape = (out_hw[0], out_hw[1]) + img.shape[2:]
    return jax.image.resize(img, out_shape, method="bilinear")


def upsample_field_2x(v: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Upsample a displacement field one level finer AND rescale its values.

    Displacements are in pixels of their own level, so going one level finer
    multiplies both the grid density and the vector magnitudes ([TOG14]
    section 4; SURVEY.md section 1.3 "bilinearly upsampled x2, values x2").
    The exact per-axis factor accounts for ceil-division level shapes.
    """
    h, w = v.shape[0], v.shape[1]
    oh, ow = out_hw
    up = upsample_2x(v, out_hw)
    scale = jnp.array([oh / h, ow / w], dtype=v.dtype)
    return up * scale


def gaussian_pyramid(img: jnp.ndarray, n_levels: int, sigma: float = 0.85) -> List[jnp.ndarray]:
    """Gaussian pyramid, finest first; ``n_levels`` total."""
    pyr = [img]
    for _ in range(n_levels - 1):
        pyr.append(downsample_2x(pyr[-1], sigma=sigma))
    return pyr


def downsample_to(img: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Anti-aliased resize to an arbitrary smaller (H, W) (for masks etc.)."""
    steps = 0
    h, w = img.shape[0], img.shape[1]
    while h > 2 * hw[0] and w > 2 * hw[1]:
        img = downsample_2x(img)
        h, w = img.shape[0], img.shape[1]
        steps += 1
        if steps > 16:
            break
    out_shape = (hw[0], hw[1]) + img.shape[2:]
    return jax.image.resize(img, out_shape, method="bilinear")
