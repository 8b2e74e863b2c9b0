"""SSIM-style structural (dis)similarity with analytic gradients.

This is the data term E_SIM of [TOG14] section 3.1: Gaussian-window means,
variances and covariance of the two *warped* images, combined SSIM-style;
dissimilarity = 1 - SSIM. The reference fuses these statistics into its CUDA
sweep kernels; here the jnp form is the oracle and the analytic backward
below is the exact spec that ``videomorphing_tpu.pallas.sweep`` fuses into a
single VMEM-resident pass.

Border handling: windowed sums use zero padding plus a normalization map
``n = conv(g, 1)``, i.e. windows are renormalized where they overhang the
border, so border pixels get unbiased stats (the exact reference border rule
is unverifiable — SURVEY.md section 1.2).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp

from videomorphing_tpu.ops.windows import gaussian_kernel_1d, separable_filter


def _wsum(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    return separable_filter(x, k, k, mode="same_zero")


def ssim_parts(
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    window: int = 5,
    sigma: float = 1.0,
    valid: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """Windowed SSIM statistics of two (H, W, C) images.

    ``valid``: optional (H, W, 1) mask of in-domain pixels. Used by the
    spatially sharded solver: a halo-extended block with zero-filled
    out-of-domain rows plus this mask reproduces the global zero-pad window
    sums EXACTLY (videomorphing_tpu/parallel/spatial.py).
    Returns normalized means/variances/covariance plus the normalization map.
    """
    k = gaussian_kernel_1d(window, sigma, dtype=w0.dtype)
    if valid is None:
        valid = jnp.ones(w0.shape[:2] + (1,), dtype=w0.dtype)
    else:
        w0 = w0 * valid
        w1 = w1 * valid
    n = _wsum(valid, k)  # (H, W, 1), <=1 near borders of the kernel's support
    inv_n = jnp.where(n > 1e-8, 1.0 / jnp.maximum(n, 1e-8), 0.0)

    mu0 = _wsum(w0, k) * inv_n
    mu1 = _wsum(w1, k) * inv_n
    e00 = _wsum(w0 * w0, k) * inv_n
    e11 = _wsum(w1 * w1, k) * inv_n
    e01 = _wsum(w0 * w1, k) * inv_n
    var0 = jnp.maximum(e00 - mu0 * mu0, 0.0)
    var1 = jnp.maximum(e11 - mu1 * mu1, 0.0)
    cov = e01 - mu0 * mu1
    return dict(mu0=mu0, mu1=mu1, var0=var0, var1=var1, cov=cov, n=n)


def _ssim_from_parts(parts, c1: float, c2: float, use_luminance: bool):
    a2 = 2.0 * parts["cov"] + c2
    b2 = parts["var0"] + parts["var1"] + c2
    if use_luminance:
        a1 = 2.0 * parts["mu0"] * parts["mu1"] + c1
        b1 = parts["mu0"] ** 2 + parts["mu1"] ** 2 + c1
        return (a1 * a2) / (b1 * b2), (a1, a2, b1, b2)
    one = jnp.ones_like(a2)
    return a2 / b2, (one, a2, one, b2)


def dssim_map(
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    window: int = 5,
    sigma: float = 1.0,
    c1: float = 1e-4,
    c2: float = 9e-4,
    use_luminance: bool = True,
) -> jnp.ndarray:
    """Per-pixel structural dissimilarity in [0, 2], channel-averaged (H, W)."""
    parts = ssim_parts(w0, w1, window, sigma)
    s, _ = _ssim_from_parts(parts, c1, c2, use_luminance)
    return jnp.mean(1.0 - s, axis=-1)


class DssimGradBundle(NamedTuple):
    energy: jnp.ndarray     # scalar E = mean_{p,c}(1 - s)
    g0: jnp.ndarray         # (H, W, C) dE/dw0
    g1: jnp.ndarray         # (H, W, C) dE/dw1
    dmap: jnp.ndarray       # (H, W) channel-mean dissimilarity
    b2: jnp.ndarray         # (H, W, C) var0+var1+c2 (curvature scale for precond)


def dssim_grad_bundle(
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    window: int = 5,
    sigma: float = 1.0,
    c1: float = 1e-4,
    c2: float = 9e-4,
    use_luminance: bool = True,
) -> DssimGradBundle:
    """Value + analytic gradients + curvature scale in one fused pass.

    The b2 map feeds the solver's Gauss-Newton-style diagonal preconditioner
    (SURVEY.md section 1.3: the reference's per-pixel line search plays the
    same step-scaling role).
    """
    e, g0, g1, dmap, b2 = _dssim_grad_impl(
        w0, w1, window, sigma, c1, c2, use_luminance
    )
    return DssimGradBundle(e, g0, g1, dmap, b2)


def dssim_value_and_grad_wrt_images(
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    window: int = 5,
    sigma: float = 1.0,
    c1: float = 1e-4,
    c2: float = 9e-4,
    use_luminance: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """E_SIM = mean_{p,c}(1 - SSIM) and its ANALYTIC gradients d E/d w0, d E/d w1.

    Hand-derived backward (tested against ``jax.grad`` in
    ``tests/test_ssim.py``): with window weights g, normalization n,
    per-pixel coefficient maps

        c_mu  = dS/d mu0,  c_var = dS/d var0,  c_cov = dS/d cov,

    the transpose of the (self-adjoint) Gaussian window gives

        dE/dw0 = conv(g, (c_mu - 2 mu0 c_var - mu1 c_cov)/n)
                 + 2 w0 conv(g, c_var/n) + w1 conv(g, c_cov/n),

    and symmetrically for w1. This 3-conv form is what the fused Pallas
    sweep computes in one VMEM pass (SURVEY.md section 8 stage 4, hard
    part #1).

    Returns ``(E, dE/dw0, dE/dw1, dssim_map)``.
    """
    e, g0, g1, dmap, _ = _dssim_grad_impl(w0, w1, window, sigma, c1, c2, use_luminance)
    return e, g0, g1, dmap


def _dssim_grad_impl(w0, w1, window, sigma, c1, c2, use_luminance, valid=None):
    h, w, c = w0.shape
    k = gaussian_kernel_1d(window, sigma, dtype=w0.dtype)
    parts = ssim_parts(w0, w1, window, sigma, valid=valid)
    if valid is not None:
        w0 = w0 * valid
        w1 = w1 * valid
    mu0, mu1 = parts["mu0"], parts["mu1"]
    var0, var1, cov, n = parts["var0"], parts["var1"], parts["cov"], parts["n"]

    a2 = 2.0 * cov + c2
    b2 = var0 + var1 + c2
    if use_luminance:
        a1 = 2.0 * mu0 * mu1 + c1
        b1 = mu0 ** 2 + mu1 ** 2 + c1
    else:
        a1 = jnp.ones_like(a2)
        b1 = jnp.ones_like(a2)

    denom = b1 * b2
    s = (a1 * a2) / denom
    energy = jnp.mean(1.0 - s)

    ds_da2 = a1 / denom
    ds_db2 = -s / b2
    if use_luminance:
        ds_da1 = a2 / denom
        ds_db1 = -s / b1
        c_mu0 = ds_da1 * 2.0 * mu1 + ds_db1 * 2.0 * mu0
        c_mu1 = ds_da1 * 2.0 * mu0 + ds_db1 * 2.0 * mu1
    else:
        c_mu0 = jnp.zeros_like(s)
        c_mu1 = jnp.zeros_like(s)
    c_var0 = ds_db2
    c_var1 = ds_db2
    c_cov = ds_da2 * 2.0

    scale = -1.0 / (h * w * c)  # d(mean(1-s))/ds
    if valid is None:
        inv_n = 1.0 / n
        vmask = 1.0
    else:
        # out-of-domain window centers do not exist in the global problem:
        # zero their contribution to the transpose convs (and guard 1/n)
        inv_n = jnp.where(n > 1e-8, 1.0 / jnp.maximum(n, 1e-8), 0.0) * valid
        vmask = valid

    def grad_one(c_mu_a, c_var_a, mu_a, mu_b, w_a, w_b):
        t0 = _wsum(scale * (c_mu_a - 2.0 * mu_a * c_var_a - mu_b * c_cov) * inv_n, k)
        t1 = _wsum(scale * c_var_a * inv_n, k)
        t2 = _wsum(scale * c_cov * inv_n, k)
        return t0 + 2.0 * w_a * t1 + w_b * t2

    g0 = grad_one(c_mu0, c_var0, mu0, mu1, w0, w1)
    g1 = grad_one(c_mu1, c_var1, mu1, mu0, w1, w0)
    dmap = jnp.mean((1.0 - s) * vmask, axis=-1)
    if valid is not None:
        energy = jnp.mean((1.0 - s) * vmask)
    return energy, g0, g1, dmap, b2
