"""Interactive viewer — the ``rayinteractive`` equivalent
(rayinteractive.c:106-208).

The reference opens a minifb window and re-renders every frame, mutating
camera state from keyboard callbacks (WASD move along dir/right, arrows =
spherical rotation at 0.05 rad, Space/Shift = up/down at 0.1;
rayinteractive.c:32-104).  The capability that matters (SURVEY.md §3.2) is
**param-swap re-render without recompile**: the jitted renderer is compiled
once and re-invoked with new camera values each frame.

Two modes:
* ``--keys`` — feed a key script (e.g. "wwassdd<space>^") and write one PNG
  per frame; the exact key->state mapping of rayinteractive.c.
* interactive stdin — type keys + enter; 'q' quits.  (A terminal loop, not
  a window: GUI toolkits are out of scope, re-render latency is the point.)
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..camera import Camera, perspective_basis
from ..config import RenderConfig
from ..io import write_png
from ..kernels.trace import quantize_image
from ..render import render_from_basis
from ..sceneio import load_scene
from ..textures import load_default_assets

MOVE_SPEED = 0.1    # rayinteractive.c:29
ROT_SPEED = 0.05    # rayinteractive.c:30


class CameraController:
    """Spherical-angle + WASD camera state machine (rayinteractive.c:32-104).

    State: origin + (x_rot, y_rot) spherical angles, y-up
    (dir = (sin x cos y, cos x, sin x sin y), rayinteractive.c:85-92).
    """

    def __init__(self, origin=(0.8, 2.5, -8.0), x_rot=np.pi / 2.0,
                 y_rot=np.pi / 2.0):
        self.origin = np.asarray(origin, np.float64)
        self.x_rot = float(x_rot)   # polar, rayinteractive.c:16
        self.y_rot = float(y_rot)   # azimuth
    @property
    def lookdir(self):
        sx, cx = np.sin(self.x_rot), np.cos(self.x_rot)
        sy, cy = np.sin(self.y_rot), np.cos(self.y_rot)
        return np.array([sx * cy, cx, sx * sy])

    def key(self, k: str) -> None:
        d = self.lookdir
        forward = -d
        right = np.cross([0.0, 1.0, 0.0], forward)  # cpu_ray.c:82-87
        up = np.cross(forward, right)               # cpu_ray.c:88-91
        if k == "w":
            self.origin += d * MOVE_SPEED
        elif k == "s":
            self.origin -= d * MOVE_SPEED
        elif k == "a":                            # rayinteractive.c:60-63
            self.origin -= right * MOVE_SPEED
        elif k == "d":                            # rayinteractive.c:65-68
            self.origin += right * MOVE_SPEED
        elif k == " ":                            # along the perspective up
            self.origin += up * MOVE_SPEED        # vector, rayinteractive.c:70-73
        elif k == "_":                            # shift = down, :75-78
            self.origin -= up * MOVE_SPEED
        elif k == "8":                            # up arrow
            self.x_rot -= ROT_SPEED
        elif k == "2":                            # down arrow
            self.x_rot += ROT_SPEED
        elif k == "4":                            # left arrow
            self.y_rot -= ROT_SPEED
        elif k == "6":                            # right arrow
            self.y_rot += ROT_SPEED

    def camera(self) -> Camera:
        return Camera(tuple(self.origin), tuple(self.lookdir), 90.0, 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="/root/reference/scenes/render.map")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--keys", default=None,
                    help="scripted keypresses, one frame per key "
                         "(wasd, space, _=down, 8/2/4/6=arrows)")
    ap.add_argument("--frames-dir", default="out/frames")
    args = ap.parse_args(argv)

    scene = load_scene(args.scene).to_scene()
    assets = load_default_assets()
    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.depth, chunk_size=0)
    ctl = CameraController()

    def frame():
        basis = perspective_basis(ctl.camera(), cfg.width, cfg.height)
        t0 = time.perf_counter()
        rgb = render_from_basis(scene, assets, basis, cfg)
        img = np.asarray(quantize_image(rgb.reshape(-1, 3), cfg.width,
                                        cfg.height))
        return img, time.perf_counter() - t0

    img, dt = frame()   # compile pass
    print(f"compiled; first frame {dt:.1f}s")

    if args.keys is not None:
        os.makedirs(args.frames_dir, exist_ok=True)
        times = []
        for i, k in enumerate(args.keys):
            ctl.key(k)
            img, dt = frame()
            times.append(dt)
            write_png(os.path.join(args.frames_dir, f"frame_{i:04d}.png"),
                      img)
        avg = sum(times) / max(len(times), 1)
        print(f"{len(times)} frames, avg {avg * 1e3:.1f} ms/frame "
              f"({1.0 / avg:.1f} fps), wrote {args.frames_dir}/")
        return

    print("keys: wasd move, space/_ up/down, 8/2/4/6 rotate, q quit")
    while True:
        try:
            line = input("> ")
        except EOFError:
            break
        if line.strip() == "q":
            break
        for k in line:
            ctl.key(k)
        img, dt = frame()
        write_png("out/view.png", img)
        print(f"{dt * 1e3:.1f} ms -> out/view.png  origin={ctl.origin}")


if __name__ == "__main__":
    main()
