"""GUI-free interactive correspondence editing: ``vmorph edit``.

The reference's primary UX is authoring a morph by editing point pairs in
its Qt editor and watching the halfway view update (SURVEY.md section 4
stack E). The rebuild keeps that loop without a GUI: a terminal command
loop over an ANSI halfway-domain preview. Each edit re-solves WARM from the
current field via :class:`videomorphing_tpu.api.Session` — the same jitted
code path, so an edit round trip is a fraction of a cold solve — and
re-renders the halfway view, where correspondence errors show as ghosting.

Scriptable by design: commands come from any iterable of lines (tests feed
a list; the CLI feeds stdin), so the edit -> warm re-solve -> preview round
trip is exercised headlessly in tests/test_edit.py.

Commands:
    add Y0 X0 Y1 X1      add a pair (point in A, point in B)
    move I Y0 X0 Y1 X1   replace pair I
    del I                remove pair I
    list                 print pairs
    solve                (re-)solve warm from the current field + preview
    preview [T]          render the morph frame at time T (default 0.5)
    save [PATH]          write the points JSON (default --out)
    render PATH [N]      write N in-between frames (default 16)
    help / quit
"""

from __future__ import annotations

import json
import shutil
import sys
from typing import Iterable, List, Optional

import numpy as np


def ansi_image(img: np.ndarray, max_cols: int = 0, stream=None) -> str:
    """Render an (H, W, C) [0,1] image as truecolor half-block ANSI text.

    Each character cell shows two vertical pixels (upper-half block with
    fg = top pixel, bg = bottom pixel). Returns the string; pure function
    so tests can assert on it without a terminal.
    """
    img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    h, w = img.shape[:2]
    if max_cols <= 0:
        max_cols = shutil.get_terminal_size((100, 40)).columns - 2
    scale = max(1, int(np.ceil(w / max_cols)))
    # box-average downsample by integer factor (crop to multiple)
    hh, ww = (h // (2 * scale)) * 2 * scale, (w // scale) * scale
    small = img[:hh, :ww].reshape(
        hh // scale, scale, ww // scale, scale, 3
    ).mean((1, 3))
    rgb = (small * 255).astype(np.uint8)
    lines = []
    for r in range(0, rgb.shape[0] - 1, 2):
        row = []
        for c in range(rgb.shape[1]):
            tr, tg, tb = rgb[r, c]
            br, bg_, bb = rgb[r + 1, c]
            row.append(f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg_};{bb}m▀")
        lines.append("".join(row) + "\x1b[0m")
    return "\n".join(lines)


def _overlay_points(img: np.ndarray, points, v=None) -> np.ndarray:
    """Mark each pair's halfway anchor with a green cross (3 px)."""
    img = np.array(img, np.float32, copy=True)
    if points is None or len(points) == 0:
        return img
    pts = np.asarray(points)
    anchors = 0.5 * (pts[:, 0] + pts[:, 1])
    h, w = img.shape[:2]
    for ay, ax in anchors:
        iy, ix = int(round(ay)), int(round(ax))
        for d in range(-3, 4):
            if 0 <= iy + d < h and 0 <= ix < w:
                img[iy + d, ix] = [0.1, 1.0, 0.2]
            if 0 <= iy < h and 0 <= ix + d < w:
                img[iy, ix + d] = [0.1, 1.0, 0.2]
    return img


class PointEditor:
    """The edit -> warm re-solve -> preview loop (reference stack E)."""

    def __init__(
        self,
        i0,
        i1,
        points: Optional[np.ndarray] = None,
        mp=None,
        sp=None,
        out_path: Optional[str] = None,
        stream=None,
        preview_cols: int = 0,
        show_images: bool = True,
    ):
        from videomorphing_tpu import api
        from videomorphing_tpu.config import MorphParams, SynthParams

        self.session = api.Session(
            i0, i1,
            mp if mp is not None else MorphParams(),
            sp if sp is not None else SynthParams(),
        )
        self.pairs: List[List[List[float]]] = (
            [list(map(list, p)) for p in np.asarray(points)] if points is not None and len(points) else []
        )
        self.out_path = out_path
        self.stream = stream if stream is not None else sys.stdout
        self.preview_cols = preview_cols
        self.show_images = show_images
        self.solves = 0

    # -- state ---------------------------------------------------------
    def _points_arr(self) -> Optional[np.ndarray]:
        return np.asarray(self.pairs, np.float32) if self.pairs else None

    def _say(self, msg: str) -> None:
        print(msg, file=self.stream)

    # -- commands ------------------------------------------------------
    def cmd_add(self, y0, x0, y1, x1):
        self.pairs.append([[float(y0), float(x0)], [float(y1), float(x1)]])
        self._say(f"pair {len(self.pairs) - 1}: A({y0},{x0}) <-> B({y1},{x1})")

    def cmd_move(self, i, y0, x0, y1, x1):
        self.pairs[int(i)] = [[float(y0), float(x0)], [float(y1), float(x1)]]
        self._say(f"pair {i} moved")

    def cmd_del(self, i):
        self.pairs.pop(int(i))
        self._say(f"pair {i} removed ({len(self.pairs)} left)")

    def cmd_list(self):
        if not self.pairs:
            self._say("(no pairs)")
        for k, (a, b) in enumerate(self.pairs):
            self._say(f"{k}: A({a[0]:.1f},{a[1]:.1f}) <-> B({b[0]:.1f},{b[1]:.1f})")

    def cmd_solve(self):
        """Warm re-solve with the current pairs, then show the halfway view."""
        import time

        from videomorphing_tpu.viewer import halfway_image

        t0 = time.perf_counter()
        art = self.session.update_points(self._points_arr())
        art.v.block_until_ready()
        dt = time.perf_counter() - t0
        hw = halfway_image(self.session.i0, self.session.i1, art.v)
        self._show(_overlay_points(hw, self._points_arr()))
        e = float(art.result.level_stats[-1].e_final) if art.result else float("nan")
        self.solves += 1
        self._say(f"solved in {dt:.2f}s (warm={self.solves > 1})  energy={e:.5f}")

    def cmd_preview(self, t: float = 0.5):
        frame = np.asarray(self.session.preview(float(t)))
        self._show(frame)
        self._say(f"morph frame at t={float(t):.2f}")

    def cmd_save(self, path: Optional[str] = None):
        path = path or self.out_path
        if not path:
            self._say("save: no path (pass one or use --out)")
            return
        with open(path, "w") as f:
            json.dump({"points": self.pairs}, f, indent=1)
        self._say(f"wrote {len(self.pairs)} pairs to {path}")

    def cmd_render(self, path: str, n: int = 16):
        from videomorphing_tpu.io.clips import save_clip

        frames = np.asarray(self.session.render(int(n)))
        save_clip(path, frames)
        self._say(f"wrote {frames.shape[0]} frames to {path}")

    def _show(self, img: np.ndarray) -> None:
        if self.show_images:
            self._say(ansi_image(img, self.preview_cols))

    # -- loop ----------------------------------------------------------
    def run(self, lines: Iterable[str]) -> int:
        """Drive the editor from an iterable of command lines."""
        self._say(
            "vmorph edit — commands: add/move/del/list/solve/preview/save/"
            "render/quit (help for details)"
        )
        for raw in lines:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            cmd, *args = line.split()
            try:
                if cmd in ("quit", "exit", "q"):
                    break
                elif cmd == "help":
                    self._say(__doc__.split("Commands:")[1])
                elif cmd == "add":
                    self.cmd_add(*args[:4])
                elif cmd == "move":
                    self.cmd_move(*args[:5])
                elif cmd in ("del", "rm"):
                    self.cmd_del(args[0])
                elif cmd == "list":
                    self.cmd_list()
                elif cmd == "solve":
                    self.cmd_solve()
                elif cmd == "preview":
                    self.cmd_preview(*args[:1])
                elif cmd == "save":
                    self.cmd_save(*args[:1])
                elif cmd == "render":
                    self.cmd_render(*args[:2])
                else:
                    self._say(f"unknown command: {cmd} (try help)")
            except (ValueError, IndexError, TypeError) as e:
                self._say(f"error: {e}")
        if self.out_path and self.pairs:
            self.cmd_save(self.out_path)
        return 0


def run_editor_cli(args) -> int:
    """Entry point for ``vmorph edit`` (wired in cli.py)."""
    from videomorphing_tpu.cli import _load_points, _params_from_args
    from videomorphing_tpu.io.images import load_image

    mp, sp, _ = _params_from_args(args)
    ed = PointEditor(
        load_image(args.image_a),
        load_image(args.image_b),
        points=_load_points(args.points),
        mp=mp,
        sp=sp,
        out_path=args.out,
        preview_cols=args.cols,
        show_images=not args.no_preview,
    )
    if args.script:
        with open(args.script) as f:
            return ed.run(f.readlines())
    return ed.run(sys.stdin)
