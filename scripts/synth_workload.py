"""Shared ON-DEVICE synthetic workload for the profiling scripts.

One generator so profile_4k and profile_relin measure the SAME workload
(they previously carried drifting copies). Content is synthesized on the
device per PERF.md methodology: never ship pixels through the ~10 MB/s
tunnel, never reuse input content across timed reps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_pair(h, w, seed, ang_scale=0.015):
    """Band-limited texture pair with a smooth ~rotational warp between them.

    ``ang_scale`` sets the rotation magnitude (0.015 -> max ~30 px at 4K).
    Returns (i0, i1, d) with i0(p)=img(p-d), i1(p)=img(p+d); the halfway
    field solving the pair is v ~ -d.
    """
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def build(key):
        yy, xx = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
        ks = jax.random.split(key, 3)
        img = jnp.zeros((h, w))
        # multi-scale texture: log-uniform periods from ~12 px to ~h/3 so
        # EVERY pyramid level carries signal (a high-frequency-only or
        # few-grating texture leaves coarse levels unconstrained / is
        # self-similar enough for false SSIM locks — measured garbage
        # fields on the first version of this workload)
        n_waves = 24
        for i in range(n_waves):
            per = jnp.exp(jax.random.uniform(
                jax.random.fold_in(ks[0], i), (),
                minval=jnp.log(12.0), maxval=jnp.log(h / 3.0)))
            ang = jax.random.uniform(jax.random.fold_in(ks[1], i), (), minval=0.0, maxval=6.28)
            ph = jax.random.uniform(jax.random.fold_in(ks[2], i), (), minval=0.0, maxval=6.28)
            f = 2.0 * jnp.pi / per
            img = img + jnp.cos(f * (jnp.sin(ang) * yy + jnp.cos(ang) * xx) + ph)
        img = 0.5 + img / (2.0 * jnp.sqrt(n_waves))
        # smooth displacement: rotation-ish, decaying from the center
        cy, cx = h / 2, w / 2
        r = jnp.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        ang = ang_scale * jnp.exp(-r / (0.4 * h))
        dy = -(xx - cx) * ang
        dx = (yy - cy) * ang
        c0 = jnp.stack([yy - dy, xx - dx], -1)
        c1 = jnp.stack([yy + dy, xx + dx], -1)
        from videomorphing_tpu.ops.resample import bilinear_sample

        i0 = bilinear_sample(img[..., None], c0)
        i1 = bilinear_sample(img[..., None], c1)
        rgb = lambda g: jnp.clip(jnp.concatenate([g, g * 0.9 + 0.05, g * 0.8 + 0.1], -1), 0, 1)
        return rgb(i0), rgb(i1), jnp.stack([dy, dx], -1)

    return build(key)
