"""Notebook/script preview helpers — the rebuild's stand-in for the
reference's Qt viewer widgets (SURVEY.md section 3 "Qt GUI": the GUI itself
is not rebuilt; the CLI + library API are the surface, and this module gives
interactive sessions the same visual instruments: the halfway-domain view,
the correspondence overlay, and a morph strip).

matplotlib is optional — every function degrades to returning arrays.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _plt():
    try:
        import matplotlib.pyplot as plt  # type: ignore

        return plt
    except Exception:
        return None


def halfway_image(i0, i1, v) -> np.ndarray:
    """The reference's halfway-domain view: both sources warped to the
    halfway grid and averaged — correspondence errors show as ghosting."""
    import jax.numpy as jnp

    from videomorphing_tpu.ops.resample import bilinear_sample, grid_coords

    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)
    v = jnp.asarray(v)
    g = grid_coords(v.shape[0], v.shape[1], v.dtype)
    w0 = bilinear_sample(i0, g - v)
    w1 = bilinear_sample(i1, g + v)
    return np.asarray(0.5 * (w0 + w1))


def field_magnitude(v) -> np.ndarray:
    """|v| as a (H, W) array (for quick field inspection)."""
    v = np.asarray(v)
    return np.linalg.norm(v, axis=-1)


def field_color(v, max_mag: Optional[float] = None) -> np.ndarray:
    """Direction-coded field visualization (Middlebury-style color wheel).

    Hue = direction of ``v`` (or a flow), saturation/value = magnitude
    scaled to ``max_mag`` (default: the field's own max). The standard
    instrument for judging a correspondence field or optical flow at a
    glance — smooth hue ramps are coherent motion, speckle is noise,
    hue discontinuities are motion boundaries. Returns (H, W, 3) in [0,1].
    """
    v = np.asarray(v, np.float32)
    mag = np.linalg.norm(v, axis=-1)
    scale = float(max_mag) if max_mag else max(float(mag.max()), 1e-6)
    ang = np.arctan2(-v[..., 0], -v[..., 1])      # image convention: y down
    h = (ang / np.pi + 1.0) / 2.0                 # [0, 1)
    s = np.clip(mag / scale, 0.0, 1.0)
    # inline HSV->RGB (value=1) — avoids a colorsys per-pixel loop
    i = np.floor(h * 6.0).astype(int) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    p, q, t = 1.0 - s, 1.0 - f * s, 1.0 - (1.0 - f) * s
    one = np.ones_like(s)
    lut = np.stack([
        np.stack([one, t, p], -1), np.stack([q, one, p], -1),
        np.stack([p, one, t], -1), np.stack([p, q, one], -1),
        np.stack([t, p, one], -1), np.stack([one, p, q], -1),
    ], 0)
    return np.take_along_axis(lut, i[None, ..., None], axis=0)[0]


def show_halfway(i0, i1, v, points: Optional[np.ndarray] = None, ax=None):
    """Render the halfway view (+ correspondence anchors) via matplotlib.

    Returns the image array; displays it when matplotlib is available.
    """
    img = halfway_image(i0, i1, v)
    plt = _plt()
    if plt is not None:
        if ax is None:
            _, ax = plt.subplots(figsize=(7, 7 * img.shape[0] / img.shape[1]))
        ax.imshow(np.clip(img, 0, 1))
        if points is not None and len(points):
            pts = np.asarray(points)
            anchors = 0.5 * (pts[:, 0] + pts[:, 1])
            ax.scatter(anchors[:, 1], anchors[:, 0], c="lime", s=30, marker="+")
        ax.set_title("halfway domain (ghosting = correspondence error)")
        ax.axis("off")
    return img


def show_morph_strip(frames, n: int = 6, ax=None) -> np.ndarray:
    """Horizontally concatenate ``n`` evenly spaced frames into one strip."""
    frames = np.asarray(frames)
    idx = np.linspace(0, frames.shape[0] - 1, min(n, frames.shape[0])).round().astype(int)
    strip = np.concatenate([frames[i] for i in idx], axis=1)
    plt = _plt()
    if plt is not None:
        if ax is None:
            _, ax = plt.subplots(figsize=(2 * len(idx), 2))
        ax.imshow(np.clip(strip, 0, 1))
        ax.axis("off")
    return strip
