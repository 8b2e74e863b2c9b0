"""Viewer instruments (the rebuild's stand-in for the reference's Qt
halfway-view widgets — SURVEY.md section 3 "Qt GUI")."""

import numpy as np

from videomorphing_tpu.viewer import field_color, field_magnitude, halfway_image


def test_field_color_properties():
    v = np.zeros((6, 8, 2), np.float32)
    c = field_color(v)
    assert c.shape == (6, 8, 3)
    np.testing.assert_allclose(c, 1.0)          # zero motion -> white

    v[..., 1] = 2.0                             # uniform +x motion
    c2 = field_color(v)
    assert np.allclose(c2, c2[0, 0])            # uniform field, uniform color
    assert not np.allclose(c2[0, 0], 1.0)       # saturated at max magnitude

    v3 = np.zeros_like(v)
    v3[..., 0] = 2.0                            # +y motion: different hue
    assert not np.allclose(field_color(v3)[0, 0], c2[0, 0])

    # magnitude scaling: half of max_mag is half-saturated
    v4 = np.zeros_like(v)
    v4[..., 1] = 1.0
    c4 = field_color(v4, max_mag=2.0)
    assert 0.2 < 1.0 - c4[..., 1].min() < 0.8   # partially saturated


def test_halfway_image_identity_field():
    rng = np.random.default_rng(0)
    i0 = rng.random((8, 10, 3)).astype(np.float32)
    i1 = rng.random((8, 10, 3)).astype(np.float32)
    v = np.zeros((8, 10, 2), np.float32)
    h = halfway_image(i0, i1, v)
    np.testing.assert_allclose(h, 0.5 * (i0 + i1), atol=1e-6)
    assert field_magnitude(v).max() == 0.0
