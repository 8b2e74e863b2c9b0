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
