"""Terminal fly-camera loop — the TPU-native analog of the reference's
interactive OpenGL path tracer (impl/integrator/path_opengl.cpp:11-127,
camera controls :104-117).

There is no GL window on a headless TPU host, so the terminal takes the keys
and shows an inline ANSI half-block thumbnail of every frame
(io/term_preview.py; PINE_TERM_PREVIEW=0 disables), with full-resolution
frames in the browser.  Each keypress moves the
camera and re-dispatches the SAME compiled wavefront program at low spp —
camera position/rotation are jit arguments (integrators/path.py cam
rebinding), so a camera move costs one dispatch, not a recompile.  Frames
are written to <dir>/latest.png next to a self-refreshing index.html and
flush live on every backend: the CLI engages the tunneled TPU's
synchronous dispatch mode at startup (core/device.py), in which a frame
readback is an ordinary transfer, not the queue-mode poison earlier
rounds worked around.

Keys: WASD move, E/C up/down, IJKL look, [ ] halve/double spp,
p screenshot, q quit.  PINE_INTERACTIVE_KEYS scripts the session
(headless tests / demos); otherwise keys come from the raw tty.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

MOVE = 0.25  # world units per keypress
TURN = 0.08  # radians per keypress


def _keys():
    scripted = os.environ.get("PINE_INTERACTIVE_KEYS")
    if scripted is not None:
        yield from scripted
        return
    if not sys.stdin.isatty():
        return
    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setcbreak(fd)
        while True:
            yield sys.stdin.read(1)
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)


class FlyCam:
    """Yaw/pitch camera state; writes back into the scene's ThinLenCamera."""

    def __init__(self, cam):
        self.cam = cam
        self.pos = np.asarray(cam.position, np.float32).copy()
        fwd = np.asarray(cam.c2w[:3, 2], np.float32)
        self.yaw = float(np.arctan2(fwd[0], fwd[2]))
        self.pitch = float(np.arcsin(np.clip(fwd[1], -1.0, 1.0)))

    def forward(self):
        cp = np.cos(self.pitch)
        return np.array(
            [np.sin(self.yaw) * cp, np.sin(self.pitch), np.cos(self.yaw) * cp],
            np.float32,
        )

    def apply_key(self, ch):
        fwd = self.forward()
        right = np.cross([0.0, 1.0, 0.0], fwd)
        n = np.linalg.norm(right)
        right = right / n if n > 1e-6 else np.array([1.0, 0, 0], np.float32)
        moves = {
            "w": fwd, "s": -fwd, "a": -right, "d": right,
            "e": np.array([0, 1.0, 0], np.float32),
            "c": np.array([0, -1.0, 0], np.float32),
        }
        if ch in moves:
            self.pos = self.pos + MOVE * moves[ch]
            return True
        if ch == "j":
            self.yaw += TURN
            return True
        if ch == "l":
            self.yaw -= TURN
            return True
        if ch == "i":
            self.pitch = min(1.5, self.pitch + TURN)
            return True
        if ch == "k":
            self.pitch = max(-1.5, self.pitch - TURN)
            return True
        return False

    def write_back(self):
        from pine_tpu.core.vecmath import look_at

        cam = self.cam
        cam.position = self.pos.astype(np.float32)
        cam.c2w = look_at(self.pos, self.pos + self.forward())
        cam.w2c = np.linalg.inv(cam.c2w)


def run_loop(integrator, scene, cscene):
    """Entered from PathIntegrator.render when --interactive is set."""
    import jax

    from pine_tpu.core import options
    from pine_tpu.core.film import flush_deferred_saves
    from pine_tpu.integrators.path import _VIEWER_HTML, render_wavefront
    from pine_tpu.io.term_preview import preview_enabled, print_frame

    cam = scene.camera
    film = cam.film
    W, H = film.width, film.height
    spp = 1
    fly = FlyCam(cam)
    live = options.progressive_flush_live()
    out_dir = "interactive"
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "index.html"), "w") as f:
        f.write(_VIEWER_HTML)
    n_shot = 0

    def frame():
        sampler = type(integrator.sampler)(spp)
        t0 = time.perf_counter()
        img = render_wavefront(
            cscene, cam, W, H, sampler, spp, integrator.max_path_length
        )
        if live:
            jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        film.set_rgb(img)
        if live:
            film.save(os.path.join(out_dir, "latest.png"))
            flush_deferred_saves()
            if preview_enabled(live):
                print_frame(film.finalized())
        return dt

    dt = frame()
    _status(fly, spp, dt, live, out_dir)
    for ch in _keys():
        if ch == "q":
            break
        if ch == "p":
            n_shot += 1
            film.save(os.path.join(out_dir, f"shot_{n_shot:03d}.png"))
            if live:
                flush_deferred_saves()
            print(f"\n[screenshot] {out_dir}/shot_{n_shot:03d}.png"
                  + ("" if live else " (queued until exit: TPU readback)"))
            continue
        if ch == "[":
            spp = max(1, spp // 2)
        elif ch == "]":
            spp = min(256, spp * 2)
        elif not fly.apply_key(ch):
            continue
        fly.write_back()
        dt = frame()
        _status(fly, spp, dt, live, out_dir)
    print()


def _status(fly, spp, dt, live, out_dir):
    p = fly.pos
    view = f"view: {out_dir}/index.html" if live else "view: on-device (TPU)"
    sys.stdout.write(
        f"\r[interactive] pos=({p[0]:+.2f},{p[1]:+.2f},{p[2]:+.2f}) "
        f"yaw={fly.yaw:+.2f} pitch={fly.pitch:+.2f} spp={spp} "
        f"{dt * 1e3:7.1f} ms/frame  {view}   "
    )
    sys.stdout.flush()
