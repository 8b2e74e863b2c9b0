"""End-to-end VIDEO morphing demo — the [EGSR14] workflow in one file.

Synthesizes a clip pair (a textured disk crossing a drifting background,
with different paths and lighting in the two takes), authors a keyframe
correspondence, adds a LAYER for the disk, morphs the clips through the
temporal-coherence pipeline, and writes every artifact:

  - ``morph.y4m``        playable A->B transition (mpv/VLC)
  - ``layered.y4m``      the same transition with the disk as its own layer
  - ``frames/``          PNG frames
  - ``strip.png``        filmstrip of the transition
  - ``fields.png``       direction-coded halfway fields over time

Run from the repo root (no input data needed; ~a minute on CPU):

    python examples/demo_video.py [outdir]
    python examples/demo_video.py --platform cpu   # force CPU (TPU down)
"""

import os
import sys

import numpy as np

# runnable without installing: the repo root is the package root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    if "--platform" in args:
        import jax

        i = args.index("--platform")
        jax.config.update("jax_platforms", args[i + 1])
        del args[i : i + 2]
    outdir = args[0] if args else "/tmp/vmorph_video_demo"

    import jax.numpy as jnp

    from videomorphing_tpu.io.clips import save_clip
    from videomorphing_tpu.io.images import save_image
    from videomorphing_tpu.utils.stressor import make_stressor
    from videomorphing_tpu.video.layered import VideoLayer, morph_clips_layered
    from videomorphing_tpu.video.pipeline import morph_video
    from videomorphing_tpu.viewer import field_color

    os.makedirs(outdir, exist_ok=True)
    os.makedirs(f"{outdir}/frames", exist_ok=True)

    # --- two synthetic "takes": same scene, different disk path/lighting --
    # (the stressor scene generator doubles as demo content: textured
    # moving disk, panning background, lighting drift, analytic truth)
    t_len, h, w = (
        int(x) for x in os.environ.get("VMORPH_DEMO_SHAPE", "8x120x168").split("x")
    )
    case = make_stressor(t_len, h, w, seed=5, drift=0.08)
    clip_a, clip_b = case.clip_a, case.clip_b
    save_clip(f"{outdir}/take_a.y4m", np.asarray(clip_a), fps=8)
    save_clip(f"{outdir}/take_b.y4m", np.asarray(clip_b), fps=8)

    # --- keyframe correspondence: the disk center on frame 0 -------------
    # (tracked to every other frame by the per-clip optical flows —
    # [EGSR14 s3]'s semi-automation: author on keyframes, flow does the rest)
    keyframe_points = {0: case.points}

    # --- the full pipeline: flows -> cold solve -> warm temporal scan ->
    # quadratic paths -> occlusion-aware Poisson blend ---------------------
    print("morphing (first compile takes a moment) ...")
    res = morph_video(clip_a, clip_b, points=keyframe_points, render=True)
    frames = np.asarray(res.frames)

    save_clip(f"{outdir}/morph.y4m", frames, fps=8)
    for t in range(t_len):
        save_image(f"{outdir}/frames/frame_{t:04d}.png", frames[t])

    # filmstrip + field-color strip (hue = direction, saturation = |v|)
    strip = np.concatenate(list(frames), axis=1)
    save_image(f"{outdir}/strip.png", strip)
    fields = np.concatenate(
        [field_color(np.asarray(res.fields[t])) for t in range(t_len)], axis=1
    )
    save_image(f"{outdir}/fields.png", fields)

    # --- layered variant: the disk as its own morph layer -----------------
    # masks follow the disk's known path in each take (a user would paint
    # or track these; VideoLayer broadcasts a static mask, here per-frame)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 0.16 * min(h, w) + 4.0
    tracked = np.asarray(res.tracked_points)  # (T, N, 2, 2)
    m0 = np.stack(
        [
            ((yy - tracked[t, 0, 0, 0]) ** 2 + (xx - tracked[t, 0, 0, 1]) ** 2
             < r**2).astype(np.float32)
            for t in range(t_len)
        ]
    )
    m1 = np.stack(
        [
            ((yy - tracked[t, 0, 1, 0]) ** 2 + (xx - tracked[t, 0, 1, 1]) ** 2
             < r**2).astype(np.float32)
            for t in range(t_len)
        ]
    )
    layer = VideoLayer(mask0=jnp.asarray(m0), mask1=jnp.asarray(m1),
                       points=keyframe_points)
    print("layered morph ...")
    lres = morph_clips_layered(clip_a, clip_b, [layer], points=keyframe_points)
    save_clip(f"{outdir}/layered.y4m", np.asarray(lres.frames), fps=8)

    # --- report ------------------------------------------------------------
    # the demo doubles as a correctness check: the disk centroid in the
    # morph must sweep between its take-A and take-B trajectories
    def centroid_x(f):
        lum = f.mean(-1)
        m = np.maximum(lum - np.median(lum), 0)
        return float((xx * m).sum() / m.sum())

    ca0, cb0 = case.points[0, 0], case.points[0, 1]
    print(f"done: {t_len} frames -> {outdir}/")
    print("  morph.y4m, layered.y4m, frames/, strip.png, fields.png")
    mid_err = abs(
        centroid_x(frames[t_len // 2])
        - 0.5 * (centroid_x(np.asarray(clip_a[t_len // 2]))
                 + centroid_x(np.asarray(clip_b[t_len // 2])))
    )
    print(f"  mid-frame centroid vs takes' midpoint: {mid_err:.1f} px off")
    print(f"  keyframe pair authored at A({ca0[0]:.0f},{ca0[1]:.0f}) / "
          f"B({cb0[0]:.0f},{cb0[1]:.0f}), tracked to all frames by flow")
    return 0 if mid_err < 6.0 else 1


if __name__ == "__main__":
    sys.exit(main())
