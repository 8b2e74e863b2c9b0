"""Poisson / screened-Poisson solvers (matmul-DCT) and pull-push extension.

The reference extends warped images past their valid regions with a membrane
(Laplace) solve and can blend in the gradient domain ([TOG14] section 5.2);
its solver type is unknown (SURVEY.md section 1.4 item 3). The rebuild uses:

- an exact DCT-II spectral solver for rectangle-domain (screened) Poisson
  problems with Neumann boundaries. The DCT is computed as DENSE MATRIX
  MULTIPLICATION with the orthonormal cosine basis — the TPU-idiomatic
  choice: XLA:TPU has NO FFT implementation on this target (verified on
  hardware: ``jnp.fft.*`` -> UNIMPLEMENTED), while the MXU makes an
  O(N^3) transform of a 1080p frame cost well under a millisecond. Exactly
  the same transform, batched/vmappable over frames; and
- multiscale pull-push for irregular-hole membrane extension (holes from
  disocclusion masks are irregular, where a pure spectral solve does not
  apply), optionally polished with a few masked Jacobi sweeps.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.ops.pyramid import downsample_2x, upsample_2x


@functools.lru_cache(maxsize=64)
def _dct_mat_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: C[k, m] = s_k sqrt(2/n) cos(pi (m+.5) k / n).

    numpy/f64 reference (tests); the traced path uses :func:`_dct_mat`.
    """
    k = np.arange(n, dtype=np.float64)[:, None]
    m = np.arange(n, dtype=np.float64)[None, :]
    c = np.cos(np.pi * (m + 0.5) * k / n) * np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c.astype(np.float32)


def _dct_mat(n: int, dtype) -> jnp.ndarray:
    """The DCT-II basis computed ON DEVICE at trace time.

    Baking the basis as a numpy literal embeds n^2 floats into the
    program — at 4K that is ~78 MB of MLIR constants, which the remote
    compile service rejects. Instead the angle is built from the EXACT
    integer phase ``(2m+1) k mod 4n`` (int32, exact for any practical n),
    so the f32 cosine sees only arguments < 2*pi and matches the f64
    reference to ~1e-7 at any size.
    """
    k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    r = ((2 * m + 1) * k) % (4 * n)
    ang = (np.float32(np.pi) / np.float32(2 * n)) * r.astype(jnp.float32)
    c = jnp.cos(ang) * np.float32(np.sqrt(2.0 / n))
    c = jnp.where(k == 0, c * np.float32(np.sqrt(0.5)), c)
    return c.astype(dtype)


def _dct_apply(x: jnp.ndarray, axis: int, inverse: bool) -> jnp.ndarray:
    c = _dct_mat(x.shape[axis], x.dtype)
    mat = c.T if inverse else c
    y = jnp.tensordot(mat, x, axes=([1], [axis]), precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, 0, axis)


def dct2(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DCT-II over the first two axes of (H, W, ...) — two MXU
    matmuls against the cached cosine basis (see module docstring)."""
    return _dct_apply(_dct_apply(x, 0, False), 1, False)


def idct2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`dct2` (the basis is orthogonal: inverse = C^T)."""
    return _dct_apply(_dct_apply(x, 0, True), 1, True)


def _neg_laplace_eigs(h: int, w: int, dtype) -> jnp.ndarray:
    """Eigenvalues of -Laplacian (5-point, Neumann) under DCT-II, (H, W)."""
    ky = jnp.arange(h, dtype=dtype)
    kx = jnp.arange(w, dtype=dtype)
    ly = 2.0 - 2.0 * jnp.cos(jnp.pi * ky / h)
    lx = 2.0 - 2.0 * jnp.cos(jnp.pi * kx / w)
    return ly[:, None] + lx[None, :]


def screened_poisson_dct(target: jnp.ndarray, alpha: float, mu: float) -> jnp.ndarray:
    """Solve ``(alpha*I - mu*Laplacian) x = alpha * target`` on a rectangle.

    Neumann boundaries; exact in one DCT round trip. Used to smooth the
    quadratic-path bulge field ([TOG14] section 5.1, see
    ``videomorphing_tpu.synth.paths``).
    """
    h, w = target.shape[0], target.shape[1]
    lam = _neg_laplace_eigs(h, w, target.dtype)
    if target.ndim > 2:
        lam = lam.reshape(lam.shape + (1,) * (target.ndim - 2))
    t_hat = dct2(target)
    x_hat = (alpha * t_hat) / (alpha + mu * lam)
    return idct2(x_hat)


def poisson_solve_dct(rhs: jnp.ndarray, mean_value: float | jnp.ndarray = 0.0) -> jnp.ndarray:
    """Solve ``Laplacian x = rhs`` with Neumann BCs; the free mean is pinned.

    Gradient-domain blending solves this with ``rhs = div(blended gradients)``
    ([TOG14] section 5.2; ``videomorphing_tpu.synth.blend``).
    """
    h, w = rhs.shape[0], rhs.shape[1]
    lam = _neg_laplace_eigs(h, w, rhs.dtype)
    if rhs.ndim > 2:
        lam = lam.reshape(lam.shape + (1,) * (rhs.ndim - 2))
    r_hat = dct2(rhs)
    denom = -lam
    denom = jnp.where(lam == 0.0, 1.0, denom)
    x_hat = jnp.where(lam == 0.0, 0.0, r_hat / denom)
    x = idct2(x_hat)
    return x - jnp.mean(x, axis=(0, 1), keepdims=True) + mean_value


def divergence(gy: jnp.ndarray, gx: jnp.ndarray) -> jnp.ndarray:
    """Backward-difference divergence matching forward-difference gradients."""
    dy = gy - jnp.roll(gy, 1, axis=0)
    dy = dy.at[0].set(gy[0])
    dx = gx - jnp.roll(gx, 1, axis=1)
    dx = dx.at[:, 0].set(gx[:, 0])
    return dy + dx


def forward_gradients(x: jnp.ndarray):
    """Forward differences with zero at the far edge (adjoint of divergence)."""
    gy = jnp.roll(x, -1, axis=0) - x
    gy = gy.at[-1].set(0.0)
    gx = jnp.roll(x, -1, axis=1) - x
    gx = gx.at[:, -1].set(0.0)
    return gy, gx


def pull_push_extend(
    img: jnp.ndarray,
    weight: jnp.ndarray,
    n_levels: int = 0,
    jacobi_iters: int = 0,
) -> jnp.ndarray:
    """Membrane-like extension of ``img`` into regions where ``weight``~0.

    ``img``: (H, W, C); ``weight``: (H, W) in [0, 1] (1 = trusted pixel).
    Multiscale pull-push on premultiplied colors: pull weighted averages to
    coarse levels, push them back down to fill holes, keeping trusted pixels
    untouched. Optional masked Jacobi sweeps relax the filled region toward
    the exact membrane. Static recursion depth -> jit-safe.
    """
    h, w = img.shape[0], img.shape[1]
    if n_levels <= 0:
        n_levels = 1
        hh, ww = h, w
        while min(hh, ww) > 4 and n_levels < 12:
            hh = -(-hh // 2)
            ww = -(-ww // 2)
            n_levels += 1

    eps = jnp.asarray(1e-6, img.dtype)
    wgt = jnp.clip(weight, 0.0, 1.0)[..., None]

    def rec(cw, ww_, depth):
        if depth == n_levels - 1 or min(cw.shape[0], cw.shape[1]) <= 4:
            return cw / jnp.maximum(ww_, eps)
        cw2 = downsample_2x(cw)
        ww2 = downsample_2x(ww_)
        filled_coarse = rec(cw2, ww2, depth + 1)
        up = upsample_2x(filled_coarse, (cw.shape[0], cw.shape[1]))
        wc = jnp.clip(ww_, 0.0, 1.0)
        return wc * (cw / jnp.maximum(ww_, eps)) + (1.0 - wc) * up

    out = rec(img * wgt, wgt, 0)
    out = wgt * img + (1.0 - wgt) * out

    if jacobi_iters > 0:
        hole = (1.0 - wgt)

        def body(_, x):
            nb = (
                jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
                + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)
            ) * 0.25
            return jnp.where(hole > 0.5, nb, x)

        out = jax.lax.fori_loop(0, jacobi_iters, body, out)
    return out
