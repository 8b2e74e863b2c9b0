"""Separable window filters (Gaussian / box) as depthwise convolutions.

The SSIM data term needs Gaussian-window means/variances/covariances
([TOG14] section 3.1); the reference computes these inside its CUDA sweep
kernels. Here the jnp oracle expresses them as two rank-1 depthwise convs —
the shape XLA:TPU fuses onto the VPU — and the Pallas sweep re-implements the
same math VMEM-resident (videomorphing_tpu/pallas/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _gaussian_np(size: int, sigma: float) -> np.ndarray:
    r = (size - 1) / 2.0
    x = np.arange(size, dtype=np.float64) - r
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_kernel_1d(size: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 1-D Gaussian kernel of odd ``size``."""
    return jnp.asarray(_gaussian_np(int(size), float(sigma)), dtype=dtype)


def _conv_1d(x: jnp.ndarray, k: jnp.ndarray, axis: int, mode: str) -> jnp.ndarray:
    """Depthwise 1-D convolution of (H, W, C) along ``axis`` (0 or 1).

    ``mode``: 'same_zero' (zero pad), 'same_edge' (edge-replicate pad).
    Implemented with lax.conv_general_dilated in NCHW so XLA:TPU picks its
    fused conv path.
    """
    assert axis in (0, 1)
    h, w, c = x.shape
    size = k.shape[0]
    pad = (size - 1) // 2

    if mode == "same_edge":
        pads = [(0, 0)] * 3
        pads[axis] = (pad, pad)
        x = jnp.pad(x, pads, mode="edge")
        conv_pad = [(0, 0), (0, 0)]
    elif mode == "same_zero":
        conv_pad = [(0, 0), (0, 0)]
        conv_pad[axis] = (pad, pad)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    # NCHW with feature_group_count=C (depthwise)
    xn = jnp.transpose(x, (2, 0, 1))[None]              # (1, C, H', W')
    if axis == 0:
        kern = k.reshape(size, 1)
    else:
        kern = k.reshape(1, size)
    kern = jnp.broadcast_to(kern[None, None], (c, 1) + kern.shape).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        xn,
        kern,
        window_strides=(1, 1),
        padding=conv_pad,
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # full fp32: the solver's descent directions are sensitive to window
        # sums, and these 5-tap convs are bandwidth- not FLOP-bound anyway
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.transpose(out[0], (1, 2, 0))


def separable_filter(
    x: jnp.ndarray,
    ky: jnp.ndarray,
    kx: jnp.ndarray | None = None,
    mode: str = "same_zero",
) -> jnp.ndarray:
    """Apply a separable filter ky (rows) then kx (cols) to (H, W, C) or (H, W).

    ``mode='same_zero'`` matches the windowed-sum semantics the SSIM term
    wants near borders when paired with a normalization map; ``'same_edge'``
    is used for pyramid smoothing.
    """
    if kx is None:
        kx = ky
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    out = _conv_1d(_conv_1d(x, ky, 0, mode), kx, 1, mode)
    if squeeze:
        out = out[..., 0]
    return out


def box_filter(x: jnp.ndarray, size: int, mode: str = "same_zero") -> jnp.ndarray:
    """Separable box filter (windowed mean)."""
    k = jnp.full((size,), 1.0 / size, dtype=x.dtype if x.dtype != jnp.uint8 else jnp.float32)
    return separable_filter(x, k, k, mode=mode)


def median3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel 3x3 median of (H, W, C), edge-replicated borders.

    Implemented as Paeth's 19-compare-exchange median-of-9 network — pure
    elementwise min/max, so XLA fuses the whole filter into one VPU pass
    (no (9, H, W, C) stack and no sort: at 4K that stack alone would be
    ~2.4 GB of HBM traffic). Used by the solver's ``relin_median`` outlier
    rejection (config.MorphParams), the Sun-Roth-Black "secrets" heuristic:
    median-filtering the field at each warp update implicitly optimizes a
    robustified energy and removes salt-and-pepper mislocks.
    """
    p = jnp.pad(x, ((1, 1), (1, 1)) + ((0, 0),) * (x.ndim - 2), mode="edge")
    h, w = x.shape[0], x.shape[1]
    n = [p[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]

    def ex(i, j):
        lo = jnp.minimum(n[i], n[j])
        n[j] = jnp.maximum(n[i], n[j])
        n[i] = lo

    for i, j in (
        (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
        (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
        (4, 2), (6, 4), (4, 2),
    ):
        ex(i, j)
    return n[4]
