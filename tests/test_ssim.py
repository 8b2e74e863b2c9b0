"""SSIM data-term tests: closed-form cases + analytic-vs-autodiff gradient.

The analytic backward is the spec the Pallas sweep kernel implements
(SURVEY.md section 8 stage 4, hard part #1) — this test pins it to jax.grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomorphing_tpu.ops.ssim import (
    dssim_map,
    dssim_value_and_grad_wrt_images,
    ssim_parts,
)


def _rand_pair(rng, h=24, w=20, c=3):
    a = jnp.asarray(rng.random((h, w, c), dtype=np.float32))
    b = jnp.asarray(rng.random((h, w, c), dtype=np.float32))
    return a, b


class TestSSIMForward:
    def test_identical_images_zero_dissim(self, rng):
        a, _ = _rand_pair(rng)
        d = dssim_map(a, a)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)

    def test_constant_vs_constant(self):
        a = jnp.full((16, 16, 1), 0.3)
        b = jnp.full((16, 16, 1), 0.8)
        # zero variance both: structure/contrast term = c2/c2 = 1; luminance < 1
        d_full = dssim_map(a, b, use_luminance=True)
        d_cs = dssim_map(a, b, use_luminance=False)
        assert float(d_full.mean()) > 0.1
        # fp32 one-pass moments leave ~1e-8 cancellation noise, amplified by
        # 1/c2 — anything below 1e-3 dissimilarity is numerically zero here
        np.testing.assert_allclose(np.asarray(d_cs), 0.0, atol=1e-3)

    def test_bias_gain_insensitivity_vs_ssd(self, rng):
        # the reason [TOG14 s3.1] picks SSIM: a gain+bias change should cost
        # much less than structural change
        a, _ = _rand_pair(rng, 32, 32, 1)
        gain_bias = jnp.clip(a * 1.15 + 0.05, 0, 1)
        scrambled = jnp.asarray(
            np.random.default_rng(1).permutation(np.asarray(a).ravel()).reshape(a.shape)
        )
        d_gb = float(dssim_map(a, gain_bias).mean())
        d_sc = float(dssim_map(a, scrambled).mean())
        assert d_gb < 0.25 * d_sc

    def test_range(self, rng):
        a, b = _rand_pair(rng)
        d = dssim_map(a, b)
        assert float(d.min()) >= -1e-5 and float(d.max()) <= 2.0 + 1e-5

    def test_parts_shapes(self, rng):
        a, b = _rand_pair(rng, 10, 12, 2)
        p = ssim_parts(a, b)
        assert p["mu0"].shape == (10, 12, 2)
        assert p["n"].shape == (10, 12, 1)
        assert float(p["var0"].min()) >= 0.0


class TestSSIMGrad:
    @pytest.mark.parametrize("use_luminance", [True, False])
    def test_analytic_matches_autodiff(self, rng, use_luminance):
        a, b = _rand_pair(rng, 18, 22, 3)

        def loss(w0, w1):
            return jnp.mean(
                dssim_map(w0, w1, use_luminance=use_luminance)
            ) * 1.0  # mean over pixels of channel-mean == mean over (p, c)

        # note dssim_map already channel-means; E in the analytic fn is
        # mean over (H, W, C) of (1 - s): identical quantity.
        e, g0, g1, _ = dssim_value_and_grad_wrt_images(
            a, b, use_luminance=use_luminance
        )
        ref_e = loss(a, b)
        ref_g0, ref_g1 = jax.grad(loss, argnums=(0, 1))(a, b)
        np.testing.assert_allclose(float(e), float(ref_e), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(ref_g0), atol=2e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(ref_g1), atol=2e-6)

    def test_grad_zero_at_identical(self, rng):
        a, _ = _rand_pair(rng)
        e, g0, g1, _ = dssim_value_and_grad_wrt_images(a, a)
        np.testing.assert_allclose(float(e), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g0), -np.asarray(g1), atol=1e-6)
